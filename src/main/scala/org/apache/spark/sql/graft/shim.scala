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
