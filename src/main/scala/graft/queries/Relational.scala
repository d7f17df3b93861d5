package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational core: aggregation, joins, windows, set ops — the operators
  * the reference lacks entirely (SURVEY.md §2.13) and that Spark provides
  * natively. Declarative DataFrame plans only: Catalyst handles pushdown,
  * partial aggregation and join selection.
  *
  * Oracle-determinism rules used throughout this file:
  *   - money sums go through DECIMAL(18,2) (exact, order-independent)
  *     then cast back to double — identical in Spark and DuckDB;
  *   - doubles emitted raw only when copied or summed from integral
  *     values (order-independent);
  *   - every result has a total ORDER BY with a unique tiebreak column
  *     so row order matches the oracle byte-for-byte.
  *
  * Scale notes (100 TB): group-bys here shuffle once on their grouping
  * keys with map-side partial aggregation; dimension joins
  * (nation/region/customer) are explicitly broadcast; fact-fact joins
  * (lineitem x orders) shuffle on the join key, which AQE re-plans for
  * skew. Nothing collects to the driver except the final small result.
  */
object Relational {

  /** Exact money arithmetic: 2-dp doubles -> DECIMAL(18,2). */
  private def money(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column  = sum(money(c)).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_groupby_agg" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    "q02_join_topk" -> { (s, dir) =>
      val t = Tables(s, dir)
      // Aggregate below the join: grouping is on the join key and
      // o_orderkey is unique in orders, so join-then-group and
      // group-then-join are equivalent — but the join input shrinks
      // from one row per lineitem to one row per order, and at real
      // scale (orders too big to broadcast) both sides arrive
      // hash-partitioned on the same key.
      t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(
          sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .join(t.orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("revenue"), col("n_items"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(20)
    },

    "q03_broadcast_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          dsum(col("c_acctbal")).as("total_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    },

    "q04_window_rank" -> { (s, dir) =>
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t.orders
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    "q05_anti_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    "q06_semi_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },

    "q07_distinct_agg" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.events
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    },

    "q08_sort_limit" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
    },

    "q09_intersect" -> { (s, dir) =>
      val t = Tables(s, dir)
      val p = t.events.filter(col("event_type") === "purchase").select(col("user_id"))
      val e = t.events.filter(col("event_type") === "error").select(col("user_id"))
      p.intersect(e).orderBy(col("user_id"))
    },

    "q10_except" -> { (s, dir) =>
      val t = Tables(s, dir)
      // users who purchase, but never above 150
      val p = t.events.filter(col("event_type") === "purchase").select(col("user_id"))
      val g = t.events.filter(col("event_type") === "purchase" && col("value") > 150)
        .select(col("user_id"))
      p.except(g).orderBy(col("user_id"))
    },

    "q11_scalar_subquery" -> { (s, dir) =>
      val t = Tables(s, dir)
      val sup = t.supplier
      // exact decimal avg, evaluated once and broadcast as a literal plan
      val avgBal = sup.agg((dsum(col("s_acctbal")) / count(lit(1))).as("a"))
      sup.join(broadcast(avgBal))
        .filter(col("s_acctbal") > col("a"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy(col("s_suppkey"))
    },

    "q12_rollup" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },

    "q17_cube" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("revenue"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    "q18_percentiles" -> { (s, dir) =>
      val t = Tables(s, dir)
      // exact interpolated percentiles (both engines define quantile as
      // linear interpolation at p*(n-1)); rounded to kill last-ulp noise.
      // Scale note: exact percentile sorts each group — correct here and
      // oracle-comparable; at 100 TB use approx_percentile (t-digest,
      // single pass, mergeable) and accept the documented error bound.
      t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
          round(expr("percentile(l_extendedprice, 0.25)"), 6).as("price_p25"))
        .orderBy(col("l_returnflag"))
    },

    "q19_pivot" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.orders
        .groupBy(col("o_custkey"))
        .pivot(col("o_orderstatus"), Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice")))
        .withColumnsRenamed(Map("F" -> "total_f", "O" -> "total_o", "P" -> "total_p"))
        .orderBy(col("o_custkey"))
    },

    "q14_window_lag" -> { (s, dir) =>
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t.events
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("value"), col("prev_value"), col("next_type"))
        .orderBy(col("event_id"))
    },

    "q15_hourly_agg" -> { (s, dir) =>
      val e = Tables(s, dir).events
      e
        .withColumn("hour", unix_timestamp(
          date_trunc("hour", timestamp_micros(Tables.eventMicros(e)))))
        .groupBy(col("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    },

    "q16_running_sum" -> { (s, dir) =>
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.orders
        .withColumn("running_total",
          sum(money(col("o_totalprice"))).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    "q13_conditional_agg" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("n_bulk"),
          sum(when(col("l_discount") >= 0.05, 1L).otherwise(0L)).as("n_discounted"),
          sum(when(col("l_tax") === 0.0, 1L).otherwise(0L)).as("n_taxfree"))
        .orderBy(col("l_returnflag"))
    },

    "q107_asof_join" -> { (s, dir) =>
      // As-of join: each event matched to the latest purchase of the
      // same user at-or-before its timestamp ("state as of this
      // moment" — the lookup feature stores, trade/quote alignment,
      // and attribution pipelines all need). Implemented with
      // operators.AsOf: a tagged union + ONE user_id shuffle + one
      // window pass, never a range join — see AsOf.scala for why that
      // shape survives both sides being fact-scale. Oracle is DuckDB's
      // native ASOF LEFT JOIN (an independent implementation of the
      // same semantics, inclusive at equal timestamps).
      val e = Tables(s, dir).events
      val base = e.select(col("event_id"), col("user_id"), col("event_type"),
        Tables.eventMicros(e).as("tus"))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"))
      graft.operators.AsOf.asofJoin(base, purchases, Seq("user_id"),
          "tus", "tus", Seq("tus" -> "asof_purchase_us"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("tus"),
          col("asof_purchase_us"),
          (col("tus") - col("asof_purchase_us")).as("us_since_purchase"))
        .orderBy(col("event_id"))
    },

    "q113_range_join" -> { (s, dir) =>
      // Interval containment at fact-scale: every event falling in the
      // 10 minutes after a significant error ("post-incident activity"
      // — ad attribution, outage blast-radius, and sensor-window
      // queries all share the shape). Both sides come from the events
      // fact table, so the naive range join is quadratic and
      // unbroadcastable; operators.RangeJoin bucketizes to a shuffled
      // EQUI-join on 10-min bucket ids (each anchor interval spans <= 2
      // buckets, each event exactly 1) and PlanAuditSpec proves no
      // nested-loop survives. The rollup then groups on the anchor —
      // value sums in decimal for cross-engine exactness (q85's
      // choice).
      val e = Tables(s, dir).events
      val ev = e.select(col("event_id"), Tables.eventMicros(e).as("tus"),
        col("event_type"), col("value"))
      val anchors = ev
        .filter(col("event_type") === "error" && col("value") > 40)
        .select(col("event_id").as("anchor_id"), col("tus").as("lo"),
          (col("tus") + 600000000L).as("hi"))
      graft.operators.RangeJoin.pointInInterval(
          ev.select(col("tus"), col("value")), anchors,
          "tus", "lo", "hi", 600000000L)
        .groupBy(col("anchor_id"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy(col("anchor_id"))
    })

  def oracle: Map[String, String] = Map(
    "q01_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         sum(l_quantity) / count(*) AS avg_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_join_topk" ->
      """SELECT o_orderkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderkey
         ORDER BY revenue DESC, o_orderkey LIMIT 20""",
    "q03_broadcast_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q04_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_custkey, rn""",
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         ORDER BY c_custkey""",
    "q06_semi_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",
    "q07_distinct_agg" ->
      """SELECT event_type, count(*) AS n_events,
         count(DISTINCT user_id) AS n_users,
         min(value) AS min_value, max(value) AS max_value,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q08_sort_limit" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""",
    "q09_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
         INTERSECT
         SELECT user_id FROM events WHERE event_type = 'error'
         ORDER BY user_id""",
    "q10_except" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
         EXCEPT
         SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
         ORDER BY user_id""",
    "q11_scalar_subquery" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
         WHERE s_acctbal > (SELECT CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM supplier)
         ORDER BY s_suppkey""",
    "q12_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",
    "q17_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q18_percentiles" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 6) AS p50,
         round(quantile_cont(l_quantity, 0.9), 6) AS p90,
         round(quantile_cont(l_extendedprice, 0.25), 6) AS price_p25
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q19_pivot" ->
      """SELECT o_custkey,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_f,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_o,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_p
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "q14_window_lag" ->
      """SELECT event_id, user_id, value,
         lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
         FROM events ORDER BY event_id""",
    "q15_hourly_agg" ->
      """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS hour,
         event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q16_running_sum" ->
      """SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q13_conditional_agg" ->
      """SELECT l_returnflag,
         CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
         CAST(sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
         CAST(sum(CASE WHEN l_tax = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxfree
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q107_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
         p AS (SELECT user_id, tus FROM e WHERE event_type = 'purchase')
         SELECT e.event_id, e.user_id, e.event_type, e.tus,
           p.tus AS asof_purchase_us, e.tus - p.tus AS us_since_purchase
         FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.tus >= p.tus
         ORDER BY e.event_id""",

    "q113_range_join" ->
      """WITH ev AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                       event_type, value FROM events),
         a AS (SELECT event_id AS anchor_id, tus AS lo, tus + 600000000 AS hi
               FROM ev WHERE event_type = 'error' AND value > 40)
         SELECT a.anchor_id, a.lo, a.hi, count(*) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM a JOIN ev e ON e.tus >= a.lo AND e.tus < a.hi
         GROUP BY 1, 2, 3 ORDER BY anchor_id""")
}
