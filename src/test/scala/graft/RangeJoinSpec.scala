package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** operators.RangeJoin: planted boundary/bucket cases the sf oracle
  * row (q113) can't guarantee to exercise, plus the no-nested-loop
  * plan claim.
  */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val intervals = Seq(
    // [100, 200): inside one bucket (width 1000)
    (1L, 100L, 200L),
    // [950, 1050): crosses the 1000 bucket boundary
    (2L, 950L, 1050L),
    // [3000, 4000): span == bucket width, exactly two buckets
    (3L, 3000L, 4000L))
    .toDF("iv_id", "lo", "hi")

  private def join(points: Seq[Long]) =
    graft.operators.RangeJoin.pointInInterval(
        points.toDF("p"), intervals, "p", "lo", "hi", 1000L)
      .select($"iv_id", $"p").as[(Long, Long)].collect().toSet

  test("half-open boundaries: lo inclusive, hi exclusive") {
    assert(join(Seq(99L, 100L, 199L, 200L)) ==
      Set((1L, 100L), (1L, 199L)))
  }

  test("intervals crossing a bucket boundary match on both sides, once") {
    // 999 and 1000 fall in different buckets but the same interval;
    // each (point, interval) pair appears exactly once (no dedup pass)
    assert(join(Seq(999L, 1000L, 1049L, 1050L)) ==
      Set((2L, 999L), (2L, 1000L), (2L, 1049L)))
  }

  test("span == bucket width covers both buckets; exhaustive vs brute force") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(500)(rnd.nextLong() % 5000L).map(math.abs)
    val got = join(pts)
    val want = (for {
      p <- pts.distinct
      (iv, lo, hi) <- Seq((1L, 100L, 200L), (2L, 950L, 1050L), (3L, 3000L, 4000L))
      if p >= lo && p < hi
    } yield (iv, p)).toSet
    assert(got == want)
  }

  test("plans an equi-join, never nested-loop") {
    val plan = graft.operators.RangeJoin.pointInInterval(
        Seq(1L).toDF("p"), intervals, "p", "lo", "hi", 1000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
