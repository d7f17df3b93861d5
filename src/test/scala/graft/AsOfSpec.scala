package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("as-of join: latest at-or-before match, inclusive ties, null for none") {
    val left = Seq((1L, 10L, 5L), (1L, 11L, 10L), (1L, 12L, 50L),
      (1L, 13L, 70L), (2L, 20L, 100L))
      .toDF("uid", "id", "t")
    val right = Seq((1L, 10L, 1L), (1L, 10L, 2L), (1L, 60L, 3L))
      .toDF("uid", "t", "price")
    val got = AsOf.asofJoin(left, right, Seq("uid"), "t", "t",
        Seq("t" -> "asof_t", "price" -> "asof_price"))
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.toSeq == Seq(
      (10L, None, None),           // before any purchase
      (11L, Some(10L), Some(2L)),  // inclusive at equal t; max payload on tie
      (12L, Some(10L), Some(2L)),  // carried forward
      (13L, Some(60L), Some(3L)),  // newer match supersedes
      (20L, None, None)))          // key with no right rows
  }

  test("as-of join shuffles once on the key and never plans a range join") {
    val left = Seq((1L, 1L, 1L)).toDF("uid", "id", "t")
    val right = Seq((1L, 1L, 1L)).toDF("uid", "t", "price")
    val plan = AsOf.asofJoin(left, right, Seq("uid"), "t", "t",
      Seq("price" -> "p")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the union + window shape: no join operator at all
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"), plan)
  }
}
