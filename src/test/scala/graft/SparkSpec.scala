package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites: one JVM-wide SparkSession (getOrCreate
  * reuses it across suites), local[4], AQE on — matching Session.local.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.local(4, "graft-test")

  val sfDir = "/root/testdata/sf0.001"
}
