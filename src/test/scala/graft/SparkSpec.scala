package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM per `sbt test`). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // defensive: a TIMESTAMP(NANOS) fixture reads as epoch-nano LONG
      // (Tables.eventMicros normalizes); no effect on MICROS files
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE coalescing targets shuffle BYTES and is blind to
      // downstream CPU: per-row kernel projections above a small
      // range shuffle would serialize onto 1-6 post-shuffle
      // partitions (q81: 1.53 -> 0.67 s at sf0.1 with the floor
      // lowered). 64k is the measured sweet spot: 16k also kept
      // CEL kernels parallel but cost q19_pivot +0.6 s in sheer
      // task overhead on its many sub-64k partitions. Large
      // shuffles are unaffected either way.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.sf
}
