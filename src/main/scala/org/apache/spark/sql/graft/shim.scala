package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions —
  * Spark 4 routes Columns through ColumnNode, and the classic converters
  * live behind package-private access. This is the single sanctioned
  * crossing point for graft's native expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to `CatalystTypeConverters` — Catalyst literal internals
  * (UTF8String, internal Decimal) must convert to Scala space before
  * they can feed `lit()` or a [[graft.operators.ZoneMap.Pred]].
  */
object CatalystBridge {
  def toScala(v: Any, dt: org.apache.spark.sql.types.DataType): Any =
    org.apache.spark.sql.catalyst.CatalystTypeConverters
      .convertToScala(v, dt)
}

/** Bridge into `private[sql]` Dataset.ofRows — the one way an injected
  * analyzer rule's command can turn an already-RESOLVED logical sub-plan
  * (e.g. a MERGE statement's source) back into a DataFrame to hand the
  * engine's API. Re-parsing the source's SQL text would double-resolve
  * against a possibly-moved catalog state; planning the resolved tree is
  * exact.
  */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Bridge to the session's `private[sql]` CacheManager state — lets specs
  * assert "no cached queries remain" directly instead of inferring it from
  * `getPersistentRDDs`, whose count also moves when the ContextCleaner
  * collects unrelated localCheckpoint RDDs mid-test.
  */
object CacheBridge {
  def noCachedQueries(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}

/** Bridge to the session's `private[sql]` internalCreateDataFrame — the
  * one way a DSv1 streaming Source's `getBatch` can hand the engine a
  * DataFrame stamped `isStreaming = true` (MicroBatchExecution asserts
  * it; a plain batch frame is rejected). The physical rows come from the
  * batch plan's own `queryExecution.toRdd`, so the frame stays lazy —
  * nothing executes until the micro-batch runs. `schema` is passed
  * explicitly (the SOURCE's declared schema, not the plan's) so
  * nullability drift between a parquet scan and the declared stream
  * schema cannot fail the engine's output-resolution step.
  */
object StreamBridge {
  def asStreamingFrame(df: org.apache.spark.sql.DataFrame,
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame = {
    val cd = df.asInstanceOf[
      org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    cd.sparkSession.internalCreateDataFrame(
      cd.queryExecution.toRdd, schema, isStreaming = true)
  }

  /** The inverse crossing: re-plant a DSv1 streaming Sink's `addBatch`
    * frame (an IncrementalExecution plan stamped streaming) as a PLAIN
    * batch frame over the same physical rows — what foreachBatch's
    * internals do before handing the user their batch. A sink body that
    * runs several actions (the graft-table publish protocol: write data,
    * derive zones, stage, rename) must not re-execute the incremental
    * plan per action.
    */
  def asBatchFrame(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cd = df.asInstanceOf[
      org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    cd.sparkSession.internalCreateDataFrame(
      cd.queryExecution.toRdd, cd.schema, isStreaming = false)
  }
}

