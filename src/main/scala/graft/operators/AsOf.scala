package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join, Spark-first: for each left row, attach value columns
  * from the LATEST right row whose time is <= the left row's time
  * (inclusive) within the same key group — DuckDB `ASOF LEFT JOIN` /
  * pandas `merge_asof(direction="backward")` semantics.
  *
  * Spark has no native as-of operator; the scalable composition is a
  * tagged union + one window pass, NOT a range join: a range-condition
  * join either falls to broadcast-nested-loop or explodes each left row
  * against every earlier right row before picking the max. Here both
  * sides shuffle ONCE on the keys, the window's last(ignoreNulls)
  * carries the most recent right payload forward through event order,
  * and the left rows filter back out — O(n log n) per key group for the
  * sort, no pair fan-out, no broadcast requirement on either side, so
  * the shape survives both sides being 100 TB fact tables.
  *
  * Ordering at equal times: right rows sort BEFORE left rows (that is
  * what makes the match inclusive), and equal-time right rows order by
  * their payload struct, so the joined payload is the column-wise max —
  * deterministic for orderable value columns.
  */
object AsOf {

  /** @param valueCols right-side columns to attach, as (rightCol ->
    *                  outputName); must be orderable types. Left rows
    *                  with no matching right row get nulls. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[(String, String)]): DataFrame = {
    val reserved = Seq("__t", "__side", "__payload")
    require(left.columns.intersect(reserved).isEmpty
      && right.columns.intersect(reserved).isEmpty,
      s"input columns may not use the reserved names ${reserved.mkString(", ")}")
    require(valueCols.map(_._2).intersect(left.columns.toSeq).isEmpty,
      "as-of output names must not collide with left columns")
    val payload = struct(valueCols.map { case (c, out) => col(c).as(out) }: _*)
    val rightTagged = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        payload.as("__payload")): _*)
    val leftTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(rightTagged.schema("__payload").dataType))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    joined.select(
      left.columns.toIndexedSeq.map(col) ++
        valueCols.map { case (_, out) => col(s"__asof.$out").as(out) }: _*)
  }
}
