package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.json4s.JValue
import org.json4s.jackson.JsonMethods

/** Driver-written JSON metadata for the persistent-index family — the
  * [[GraftTable]] meta discipline generalized: every index persisted a
  * ONE-ROW parquet "meta" (geometry, drift baselines, model weights'
  * shape), which cost a full Spark job to write at every build/save and
  * another (schema inference + head) at every open — pure per-query
  * fixed cost, since the payload is a handful of driver-sized scalars.
  * Writing the record as `meta.json` through the FileSystem (plus the
  * `_SUCCESS` marker the family's committed-iff-marker checks gate on)
  * costs zero Spark jobs on both sides.
  *
  * Layout compatibility: the JSON lands INSIDE the same directory the
  * parquet row used (`<dir>/meta.json` + `<dir>/_SUCCESS`), so every
  * existing "meta exists ⇒ committed" directory check keeps working;
  * readers fall back to the parquet form when `meta.json` is absent
  * (indexes written before the switch).
  */
private[operators] object MetaIo {

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeFile(f: FileSystem, p: Path, s: String): Unit = {
    val out = f.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def readFile(f: FileSystem, p: Path): Option[String] =
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, "UTF-8"))
      } finally in.close()
    }

  /** Replace `dir` with a committed JSON record (meta.json + _SUCCESS) —
    * the same overwrite semantics the parquet writer had.
    */
  def write(spark: SparkSession, dir: String, j: JValue): Unit = {
    val f = fs(spark, dir)
    val d = new Path(dir)
    if (f.exists(d)) f.delete(d, true)
    writeFile(f, new Path(d, "meta.json"), JsonMethods.compact(JsonMethods.render(j)))
    writeFile(f, new Path(d, "_SUCCESS"), "")
  }

  /** The committed JSON record under `dir`, or None when absent (caller
    * falls back to the legacy parquet read, or to its pre-meta default).
    */
  def read(spark: SparkSession, dir: String): Option[JValue] =
    readFile(fs(spark, dir), new Path(dir, "meta.json"))
      .map(s => JsonMethods.parse(s))

  /** Does the meta directory exist at all (either format)? The family's
    * existence checks predate the JSON form and keep their semantics.
    */
  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(dir))

  /** JSON-safe double: NaN has no JSON literal (a codebook's drift
    * baseline can legitimately be NaN before it is measured) — encode it
    * as null and decode null back to NaN.
    */
  def jsonDouble(v: Double): JValue =
    if (v.isNaN) org.json4s.JNull else org.json4s.JDouble(v)

  def doubleOf(j: JValue): Double = j match {
    case org.json4s.JNull | org.json4s.JNothing => Double.NaN
    case org.json4s.JDouble(d) => d
    case org.json4s.JInt(i) => i.toDouble
    case org.json4s.JDecimal(d) => d.toDouble
    case org.json4s.JLong(l) => l.toDouble
    case other => sys.error(s"not a double: $other")
  }
}
