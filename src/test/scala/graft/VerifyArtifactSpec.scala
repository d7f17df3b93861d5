package graft

import org.apache.spark.sql.functions._

/** Guards the round-8 failure mode: a query that throws used to be
  * silently ABSENT from the driver's correctness report (101 green rows
  * looked like 101/101 when the inventory held 105). Verify.dump must
  * leave an explicit artifact — parquet output or a `<name>.err` file —
  * for EVERY key it was given. */
class VerifyArtifactSpec extends SparkSpec {

  test("every query yields parquet output or an explicit .err artifact") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify-art").toString
    val qs: Map[String, (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame] = Map(
      "ok_query" -> ((s, dir) => Tables(s, dir).region.select(col("r_name"))),
      "broken_analysis" -> ((s, dir) =>
        Tables(s, dir).region.select(expr("no_such_col DIV 1000"))),
      "broken_runtime" -> ((s, dir) =>
        Tables(s, dir).region
          .select(raise_error(lit("boom")).cast("string").as("x"))))
    val failed = Verify.dump(spark, sf, out, qs)
    assert(failed.toSet == Set("broken_analysis", "broken_runtime"))
    qs.keys.foreach { name =>
      val hasOut = new java.io.File(s"$out/$name").exists()
      val hasErr = new java.io.File(s"$out/$name.err").exists()
      assert(hasOut || hasErr, s"$name left no artifact")
    }
    val msg = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/broken_analysis.err"))
    assert(msg.nonEmpty)
  }

  test("a stale .err clears when the query recovers") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify-stale").toString
    type Q = Map[String, (org.apache.spark.sql.SparkSession, String)
      => org.apache.spark.sql.DataFrame]
    val broken: Q = Map("flip" -> ((s, dir) =>
      Tables(s, dir).region.select(expr("no_such_col"))))
    Verify.dump(spark, sf, out, broken)
    assert(new java.io.File(s"$out/flip.err").exists())
    val fixed: Q = Map("flip" -> ((s, dir) =>
      Tables(s, dir).region.select(col("r_name"))))
    assert(Verify.dump(spark, sf, out, fixed).isEmpty)
    assert(!new java.io.File(s"$out/flip.err").exists(),
      "stale error marker must clear on recovery")
    assert(new java.io.File(s"$out/flip").exists())
  }

  test("every query has an oracle: no silent downgrade to rows-only checks") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"missing oracle: ${q -- o}; orphan oracle: ${o -- q}")
  }

  test("the full inventory plans: every SparkEntry query resolves at sf") {
    // cheap end-to-end guard that no fixture-schema drift reintroduces
    // silent analysis failures: force full analysis (not execution) of
    // all queries against the live fixture schema
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sf).queryExecution.analyzed
      catch { case e: Throwable =>
        fail(s"$name fails analysis: ${e.getMessage}")
      }
    }
  }
}
