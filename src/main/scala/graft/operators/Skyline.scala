package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) operator, Spark-first: the rows not
  * dominated in two jointly-maximized integer dimensions. Row q
  * dominates p iff q.x >= p.x and q.y >= p.y with at least one strict;
  * duplicate (x, y) points co-survive (neither dominates).
  *
  * Spark has no skyline operator and the naive forms don't scale: the
  * dominance anti-join is a quadratic inequality self-join, and the
  * direct window form is ONE GLOBAL SORT of the corpus. This is the
  * distributive two-stage shape instead: a LOCAL skyline per salt
  * partition first (a row dominated within any partition is dominated
  * globally, so local survivors are a superset of the answer), then
  * the identical logic over the survivor set — the global stage only
  * ever sees frontier-sized data. The data pays one hash shuffle.
  *
  * Both stages are the same two windows: a RANGE frame under x DESC
  * whose integer "1 PRECEDING" bound is exactly strictness (max y over
  * strictly-greater x), plus the equal-x group max (equal-x ties lose
  * to a strictly larger y). Dimensions must be integral for the RANGE
  * strictness to hold — scale doubles to integer units first (cents,
  * micros), which is also what makes dominance engine-exact.
  *
  * The streaming twin ([[graft.streaming.SkylineStreams]]) maintains
  * the same frontier incrementally: dominated points can never
  * re-enter, so the state IS the (output-bounded) answer.
  */
object Skyline {

  private def stage(df: DataFrame, x: String, y: String,
      parts: Seq[Column]): DataFrame = {
    val w1 = Window.partitionBy(parts: _*).orderBy(col(x).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val w2 = Window.partitionBy(parts :+ col(x): _*)
    df.withColumn("__hi", max(col(y)).over(w1))
      .withColumn("__eqm", max(col(y)).over(w2))
      .filter((col("__hi").isNull || col("__hi") < col(y)) &&
        col(y) === col("__eqm"))
      .drop("__hi", "__eqm")
  }

  /** @param x,y integral columns, both maximized
    * @param saltOn a stable row identity the local-stage salt hashes
    *               (retries must salt identically — never rand()) */
  def skyline(df: DataFrame, x: String, y: String, saltOn: Column,
      buckets: Int = 32): DataFrame = {
    require(!df.columns.exists(Seq("__hi", "__eqm", "__salt").contains),
      "input columns may not use the reserved __hi/__eqm/__salt names")
    val local = stage(df.withColumn("__salt", pmod(hash(saltOn), lit(buckets))),
      x, y, Seq(col("__salt"))).drop("__salt")
    stage(local, x, y, Nil)
  }
}
