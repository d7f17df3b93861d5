package graft

import graft.operators.{Skyline, TopK}
import org.apache.spark.sql.functions._

/** Randomized-agreement laws for the reusable operators: each result
  * must equal a brute-force reference on generated inputs, including
  * the tie/duplicate/negative edge cases the fixtures may not hit. */
class OperatorLawSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("skyline operator equals the quadratic dominance definition on random sets") {
    for (trial <- 0 until 5) {
      // small value ranges force heavy tie/duplicate collisions
      val pts = (0 until 300).map(i =>
        (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      val df = pts.toDF("k", "x", "y")
      val got = Skyline.skyline(df, "x", "y", col("k"))
        .collect().map(_.getLong(0)).toSet
      val brute = pts.filter { case (_, x, y) =>
        !pts.exists { case (_, x2, y2) =>
          (x2 > x && y2 >= y) || (x2 == x && y2 > y) }
      }.map(_._1).toSet
      assert(got == brute, s"trial $trial: ${got.diff(brute)} / ${brute.diff(got)}")
    }
  }

  test("skyline salt-bucket count cannot change the answer") {
    val pts = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val df = pts.toDF("k", "x", "y")
    val r1 = Skyline.skyline(df, "x", "y", col("k"), buckets = 1)
      .collect().map(_.getLong(0)).toSet
    val r7 = Skyline.skyline(df, "x", "y", col("k"), buckets = 7)
      .collect().map(_.getLong(0)).toSet
    val r64 = Skyline.skyline(df, "x", "y", col("k"), buckets = 64)
      .collect().map(_.getLong(0)).toSet
    assert(r1 == r7 && r7 == r64, "partitioning leaked into the result")
  }

  test("topK operator equals sort-take per group, ties by key, negatives included") {
    for (trial <- 0 until 5) {
      val rows = (0 until 400).map(i =>
        (rnd.nextInt(6).toLong, i.toLong, (rnd.nextInt(200) - 100).toLong))
      val df = rows.toDF("g", "k", "v")
      val got = TopK.topK(df, "g", "k", "v", 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      val brute = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(4).zipWithIndex
          .map { case ((_, k, v), i) => (g, i + 1L, k, v) }
      }.sortBy(t => (t._1, t._2))
      assert(got == brute, s"trial $trial diverges")
    }
  }

  test("topK packing bounds violations fail loudly, not silently") {
    val bad = Seq((1L, 1L, (1L << 22) + 1L)).toDF("g", "k", "v")
    val e = intercept[Exception] {
      TopK.topK(bad, "g", "k", "v", 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("TopK packing bounds violated")),
      s"unexpected error: $e")
  }
}
