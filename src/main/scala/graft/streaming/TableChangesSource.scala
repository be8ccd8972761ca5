package graft.streaming

import graft.operators.GraftTable
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{
  Offset => OffsetV2, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.StreamBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** [[graft.operators.GraftTable]]'s change feed as a first-class
  * Structured Streaming SOURCE — `spark.readStream
  * .format("graft-table-changes").option("path", tableRoot).load()`
  * yields the row-level CDF stream (`schema + _change_type +
  * _commit_version`, [[GraftTable.readChanges]] semantics verbatim:
  * persisted O(k) slices for merges, file-diff inserts for appends,
  * NOTHING for pure relayouts), with versions as the offset axis.
  *
  * This replaces the manual [[GraftTable.drainChanges]] loop with the
  * engine's own lifecycle: offsets checkpoint through the query's WAL
  * (exactly-once batch REPLANNING across restarts — the foreachBatch
  * body still owns sink idempotence, as everywhere else in Structured
  * Streaming), `maxVersionsPerTrigger` bounds one micro-batch's span,
  * and `Trigger.AvailableNow` drains what exists then stops.
  *
  * Architecture is the `FileStreamSource` shape — a DSv1
  * [[org.apache.spark.sql.execution.streaming.Source]] (its `getBatch`
  * returns a DataFrame, so the existing batch reader serves the stream
  * wholesale; the Delta connector's own streaming source makes the same
  * choice) implementing [[SupportsTriggerAvailableNow]] /
  * admission control so the per-trigger rate limit and the
  * available-now cap live in `latestOffset` where the engine applies
  * them across MULTIPLE bounded batches, not one capped batch.
  *
  * Options:
  *  - `path` (required): the GraftTable root.
  *  - `startingVersion`: consume commits AFTER this version — a retained
  *    version number, `0` (everything retained; requires v1 still
  *    retained), or `latest` (only commits after stream creation).
  *    Default `0`.
  *  - `maxVersionsPerTrigger`: positive int; one micro-batch spans at
  *    most this many commits. Default unbounded.
  *
  * Scale note: offset resolution is metadata-only (a head-pointer read
  * per trigger); batch planning reads per-version manifests and change
  * slices, never the table's data files, so a 100 TB table streams its
  * feed at the cost of the changes themselves. Retention is the only
  * coupling: a consumer lagging past `keepVersions` fails LOUDLY with
  * the feed-gap message ([[GraftTable.readChanges]]'s rule) instead of
  * silently skipping commits.
  */
final class TableChangesSource(
    spark: SparkSession,
    tbl: GraftTable,
    override val schema: StructType,
    startingVersion: Long,
    maxVersions: Int)
  extends Source with SupportsTriggerAvailableNow with Logging {

  /** Highest version offered to the engine so far. Re-initialized on
    * restart by the engine's recovery `getBatch` replay and by the
    * `startOffset` it passes to [[latestOffset]] — both monotonic-max'd
    * in, so whichever path a given Spark version takes, a restarted
    * stream resumes AFTER its checkpoint, never behind it.
    */
  private var offered: Long = startingVersion

  /** Head captured at [[prepareForTriggerAvailableNow]]: an
    * available-now run drains commits that existed at query start and
    * terminates — concurrent commits wait for the next run.
    */
  private var availableNowCap: Option[Long] = None

  private def ver(json: String): Long = json.trim.toLong

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    availableNowCap = Some(tbl.version)
    logInfo(s"available-now cap for ${tbl.path}: v${availableNowCap.get}")
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit)
      : OffsetV2 = synchronized {
    Option(startOffset).foreach(o => offered = math.max(offered, ver(o.json)))
    val head = availableNowCap.fold(tbl.version)(math.min(tbl.version, _))
    offered = math.max(offered, math.min(head, offered + maxVersions))
    if (offered <= startingVersion) null else LongOffset(offered)
  }

  /** Admission-control sources get offsets via [[latestOffset]];
    * the engine never calls this (the `FileStreamSource` discipline).
    */
  override def getOffset: Option[OffsetV1] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) serves this source")

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame =
    synchronized {
      val from = start.map(o => ver(o.json)).getOrElse(startingVersion)
      val to = ver(end.json)
      offered = math.max(offered, to)
      val slice =
        if (to > from) tbl.readChanges(from, to)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      // project to the stream-start schema in declared order (additive
      // evolution keeps every historical column; columns added to the
      // table mid-stream become visible on the NEXT stream start)
      val aligned =
        slice.select(schema.fieldNames.toIndexedSeq.map(n =>
          col(s"`$n`")): _*)
      StreamBridge.asStreamingFrame(aligned, schema)
    }

  override def commit(end: OffsetV1): Unit = synchronized {
    offered = math.max(offered, ver(end.json))
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"TableChangesSource[${tbl.path}, after v$startingVersion]"
}

/** `DataSourceRegister` provider for [[TableChangesSource]] — registered
  * under the short name `graft-table-changes` via
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`.
  */
final class TableChangesProvider
  extends StreamSourceProvider with DataSourceRegister with Logging {
  import TableChangesProvider._

  override def shortName(): String = "graft-table-changes"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) = {
    require(schema.isEmpty,
      "graft-table-changes derives its schema from the table meta — " +
        "do not supply one")
    (shortName(), feedSchema(open(ctx, parameters)))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val tbl = open(ctx, parameters)
    val start = startingVersion(tbl, parameters)
    val vs = tbl.versions()
    require(start == 0L && vs.head == 1L || vs.contains(start),
      s"startingVersion $start is outside ${tbl.path}'s retention window " +
        s"(retained: ${vs.mkString(", ")}) — a stream cannot begin across " +
        "a feed gap; increase keepVersions or start at a retained version")
    new TableChangesSource(ctx.sparkSession, tbl, feedSchema(tbl), start,
      maxVersionsPerTrigger(parameters))
  }
}

object TableChangesProvider {
  /** Option keys, matched case-insensitively (`DataStreamReader` hands
    * v1 providers a case-insensitive map in some call paths and the raw
    * one in others — normalize instead of guessing).
    */
  private def opt(parameters: Map[String, String], key: String)
      : Option[String] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(key) => v
    }

  private def open(ctx: SQLContext, parameters: Map[String, String])
      : GraftTable = {
    val path = opt(parameters, "path").getOrElse(sys.error(
      "graft-table-changes requires option 'path' — the GraftTable root"))
    GraftTable.open(ctx.sparkSession, path)
  }

  /** The feed's shape: the table's CURRENT schema plus the CDF columns —
    * [[GraftTable.readChanges]]'s contract.
    */
  private def feedSchema(tbl: GraftTable): StructType =
    StructType(tbl.read().schema.fields :+
      StructField("_change_type", StringType) :+
      StructField("_commit_version", LongType))

  private def startingVersion(tbl: GraftTable,
      parameters: Map[String, String]): Long =
    opt(parameters, "startingVersion") match {
      case None => 0L
      case Some(s) if s.trim.equalsIgnoreCase("latest") => tbl.version
      case Some(s) =>
        val v =
          try s.trim.toLong
          catch {
            case _: NumberFormatException => sys.error(
              s"startingVersion must be a version number or 'latest': $s")
          }
        require(v >= 0, s"startingVersion must be >= 0: $v")
        v
    }

  private def maxVersionsPerTrigger(parameters: Map[String, String]): Int =
    opt(parameters, "maxVersionsPerTrigger") match {
      case None => Int.MaxValue
      case Some(s) =>
        val n =
          try s.trim.toInt
          catch {
            case _: NumberFormatException =>
              sys.error(s"maxVersionsPerTrigger must be a positive int: $s")
          }
        require(n > 0, s"maxVersionsPerTrigger must be positive: $n")
        n
    }
}
