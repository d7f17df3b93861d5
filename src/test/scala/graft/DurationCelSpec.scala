package graft

import graft.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, array, element_at}

class DurationCelSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def evalStr(input: String, f: Column => Column): Any =
    Seq(input).toDF("v").select(f(col("v")).as("r")).head().get(0)

  test("duration_go parses Go duration strings to micros") {
    assert(evalStr("1h2m3s", duration_go) == 3723000000L)
    assert(evalStr("300ms", duration_go) == 300000L)
    assert(evalStr("-1.5h", duration_go) == -5400000000L)
    assert(evalStr("0", duration_go) == 0L)
    intercept[Exception] { evalStr("5 parsecs", duration_go) }
  }

  test("format_duration_go renders Go duration strings") {
    val df = Seq(3723000000L, 300000L, 0L, 90000000L).toDF("us")
    val out = df.select(format_duration_go(col("us"))).collect().map(_.getString(0)).toSeq
    assert(out == Seq("1h2m3s", "300ms", "0s", "1m30s"))
  }

  test("cel comprehension aliases") {
    val df = Seq(Tuple1(Seq(1, 2, 3, 4))).toDF("xs")
    assert(df.select(cel_map(col("xs"), x => x * 2)).head.getSeq[Int](0) == Seq(2, 4, 6, 8))
    assert(df.select(cel_map(col("xs"), _ % 2 === 0, x => x * 10)).head.getSeq[Int](0) == Seq(20, 40))
    assert(df.select(cel_filter(col("xs"), _ > 2)).head.getSeq[Int](0) == Seq(3, 4))
    assert(df.select(cel_all(col("xs"), _ > 0)).head.getBoolean(0))
    assert(df.select(cel_exists(col("xs"), _ === 3)).head.getBoolean(0))
    assert(df.select(cel_exists_one(col("xs"), _ === 3)).head.getBoolean(0))
    assert(!df.select(cel_exists_one(col("xs"), _ > 2)).head.getBoolean(0))
  }

  test("request builders produce request-as-data structs") {
    val r = spark.range(1).select(
      basic_authentication(
        post_request(lit("http://h/p"), lit("application/json"), lit("{}")),
        lit("user"), lit("pass")).as("req"))
      .select(col("req.Method"), col("req.URL"),
        element_at(col("req.Header"), "Authorization").getItem(0).as("auth"),
        col("req.Body").cast("string"))
      .head()
    assert(r.getString(0) == "POST")
    assert(r.getString(1) == "http://h/p")
    assert(r.getString(2) == "Basic dXNlcjpwYXNz")
    assert(r.getString(3) == "{}")
  }

  test("debug_ passes value through") {
    assert(evalStr("hello", c => debug_("tag", c)) == "hello")
  }

  test("ann lsh candidates are a subset of brute-force pairs at the threshold") {
    val lsh = graft.queries.Pipeline.queries("q41_ann_lsh")(spark, sf)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = graft.queries.Pipeline.queries("q37_embedding_neardup")(spark, sf)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // q37 threshold (0.45) is above q41's (0.4): every brute pair the LSH
    // finds must also be exact-verified; subset in the 0.4+ direction
    val bruteAll = lsh.forall { case (a, b) => a < b }
    assert(bruteAll)
    // LSH output is exact-verified, so any pair >= 0.45 found by LSH is in brute
    assert(lsh.filter(p => brute.contains(p)).subsetOf(brute))
  }
}
