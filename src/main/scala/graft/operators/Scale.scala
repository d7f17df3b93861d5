package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out helpers for the 100 TB deployment shape: bucketed
  * co-located joins (no shuffle at read time) and salted two-phase
  * aggregation for skewed keys. These are the techniques the rest of
  * the engine assumes at cluster scale; tests assert the resulting
  * PLANS (no Exchange on bucketed joins), not just results.
  */
object Scale {

  /** Write a DataFrame as a bucketed table. Joins/aggregations on the
    * bucket key then read co-located data: no shuffle Exchange in the
    * join plan, which at 100 TB removes the dominant cost of repeated
    * fact-fact joins on a stable key. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Shuffle-free equi-join of two tables bucketed on the same key. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Two-phase salted aggregation: groupBy(key) where a handful of hot
    * keys would overload single reducers. Phase 1 aggregates on
    * (key, salt) — hot keys fan out over `saltFactor` reducers — phase 2
    * combines the partials per key. `partialAggs` must be decomposable
    * (sum/count/min/max: combine = same op; avg = sum+count then divide
    * at the end).
    */
  def saltedAgg(df: DataFrame, key: String, saltFactor: Int,
      partialAggs: Seq[(String, String)]): DataFrame = {
    // partialAggs: (column, op) with op in {sum, count, min, max}
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
      lit(saltFactor)))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(partialAggs.head match { case (c, op) => callOp(op, c).as(s"${op}_$c") },
        partialAggs.tail.map { case (c, op) => callOp(op, c).as(s"${op}_$c") }: _*)
    val phase2Aggs = partialAggs.map { case (c, op) =>
      val combOp = if (op == "count") "sum" else op // counts combine by summing
      callOp(combOp, s"${op}_$c").as(s"${op}_$c")
    }
    phase1.groupBy(col(key)).agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  private def callOp(op: String, c: String): Column = op match {
    case "sum"   => sum(col(c))
    case "count" => count(col(c))
    case "min"   => min(col(c))
    case "max"   => max(col(c))
    case other   => throw new IllegalArgumentException(s"non-decomposable agg: $other")
  }

  /** Explicit skew hint for joins where AQE's runtime detection isn't
    * available (e.g. a forced broadcast is too large): salt the skewed
    * side, explode the compact side over all salt values. */
  def saltedJoin(skewed: DataFrame, compact: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val s = skewed.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltFactor)))
    val c = compact.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    s.join(c, Seq(key, "__salt")).drop("__salt")
  }
}
