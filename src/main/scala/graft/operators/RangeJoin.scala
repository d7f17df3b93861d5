package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join, Spark-first: each point row matched
  * to every interval row whose half-open span [lo, hi) contains it.
  *
  * Open-source Spark has no range-join optimization: a plain join on
  * `p >= lo AND p < hi` has no equi-key, so Catalyst plans
  * BroadcastNestedLoopJoin — O(|points| * |intervals|) compares and a
  * broadcast requirement on one whole side, both disqualifying at
  * fact-scale. The scalable composition is BUCKETIZATION: intervals
  * explode to the fixed-width time buckets they overlap, points map to
  * the single bucket containing them, the join runs as an ordinary
  * shuffled EQUI-join on bucket id, and the exact range predicate
  * filters the bucket-collision candidates. Each (point, interval) pair
  * meets in exactly one bucket (the point's), so no dedup pass is
  * needed. Shuffle volume: points once, intervals once per overlapped
  * bucket — ceil(span/bucket)+1 ≤ 2 rows per interval when bucketUs is
  * chosen >= the max span, which is the intended calibration. Skew
  * (a bucket holding a hot spot) is ordinary equi-join skew and AQE's
  * skew-join split applies; a nested-loop plan has no such escape.
  */
object RangeJoin {

  /** @param points    frame with a LONG microsecond column `pointUs`
    * @param intervals frame with LONG microsecond columns `loUs`/`hiUs`
    *                  (half-open: lo inclusive, hi exclusive)
    * @param bucketUs  bucket width; pick >= max(hi-lo) so each interval
    *                  lands in at most 2 buckets */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointUs: String, loUs: String, hiUs: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucket width must be positive: $bucketUs")
    require(!points.columns.contains("__bkt") && !intervals.columns.contains("__bkt"),
      "input columns may not use the reserved name __bkt")
    // floor-division via double floor keeps negative epochs correct;
    // |us| < 2^53 so the division is exact for any realistic timestamp
    val iv = intervals.withColumn("__bkt",
      explode(sequence(floor(col(loUs) / bucketUs).cast("long"),
        floor((col(hiUs) - 1) / bucketUs).cast("long"))))
    val pt = points.withColumn("__bkt",
      floor(col(pointUs) / bucketUs).cast("long"))
    pt.join(iv, Seq("__bkt"))
      .filter(col(pointUs) >= col(loUs) && col(pointUs) < col(hiUs))
      .drop("__bkt")
  }
}
