package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("AQE splits skewed join partitions at runtime (skew=true in final plan)") {
    // 90% of the big side lands on one key; with the skew thresholds
    // scaled to test-data size, AQE must re-plan the sort-merge join
    // with skew-split partitions — the same mechanism that handles hot
    // keys at 100 TB (salting stays for aggregations, Scale.saltedAgg)
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = spark.range(500000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val j = big.join(right, "k")
      // collect() executes THIS dataset's query execution (count()/
      // foreach plan separate executions, leaving j's adaptive plan
      // unrun and its toString at the pre-execution initial plan)
      val n = j.collect().length
      assert(n == 450000 + 100) // 450k on the hot key + the 100 tail keys < 1000
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE skew-join did not engage:\n${plan.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed join plans without a shuffle Exchange") {
    val t = Tables(spark, sf)
    Scale.writeBucketed(t.orders, "orders_b", "o_custkey", 8)
    Scale.writeBucketed(
      t.customer.withColumnRenamed("c_custkey", "o_custkey"), "cust_b", "o_custkey", 8)
    // forbid broadcast so the join strategy must rely on distribution
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "orders_b", "cust_b", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      val expected = t.orders.join(
        t.customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey").count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("salted aggregation matches plain aggregation") {
    val t = Tables(spark, sf)
    val plain = t.lineitem.groupBy(col("l_returnflag"))
      .agg(sum("l_quantity").as("sum_l_quantity"), count("l_orderkey").as("count_l_orderkey"),
        max("l_extendedprice").as("max_l_extendedprice"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    val salted = Scale.saltedAgg(t.lineitem, "l_returnflag", 8,
      Seq("l_quantity" -> "sum", "l_orderkey" -> "count", "l_extendedprice" -> "max"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    assert(salted == plain)
  }

  test("salted join matches plain join") {
    val t = Tables(spark, sf)
    val plain = t.orders.join(broadcast(t.customer.withColumnRenamed("c_custkey", "o_custkey")),
      "o_custkey").count()
    val salted = Scale.saltedJoin(t.orders,
      t.customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", 4).count()
    assert(salted == plain)
  }

  test("q31-style bucket cap bounds band self-join fan-out on hot buckets") {
    import SparkSpec.spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 200 ids in one degenerate bucket ("hot"), 3 in a healthy one: the
    // uncapped self-join would produce 19900 pairs from the hot bucket.
    val bands = ((1L to 200L).map(_ -> "hot") ++ Seq(201L, 202L, 203L).map(_ -> "ok"))
      .toDF("doc_id", "bd")
    val capped = bands
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy(col("bd"))))
      .filter(col("bucket_n") <= 64)
      .drop("bucket_n")
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.bd") === col("b.bd") && col("a.doc_id") < col("b.doc_id"))
      .count()
    // only the healthy bucket pairs survive: C(3,2) = 3, not 19903
    assert(pairs == 3)
  }
}
