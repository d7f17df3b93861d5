package graft.queries

import graft.Tables
import graft.Checkpoints
import graft.Checkpoints.Ops
import graft.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational/BI family over the events/orders tables: funnels,
  * retention, attribution, anomaly (CUSUM/MAD/EWMA/seasonal), SCD2,
  * sessionization, as-of/range joins, pivots, experiment readouts.
  *
  * Split from Pipeline.scala (round 12 housekeeping): query/oracle
  * entries only — every shared helper, memo cache and SQL CTE stays in
  * [[Pipeline]] (widened to private[queries]) so behavior and plan
  * shapes are byte-identical. */
private[graft] object BiQueries {
  import Pipeline._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q206_kaplan_meier" -> { (s, dir) =>
      // Kaplan-Meier survival of customer "lifetime" — the standard
      // censoring-aware churn readout a naive avg-lifetime report gets
      // wrong: per customer, lifetime = last_order_day - first_order_day
      // + 1; a customer whose last order sits more than 90 days before
      // the corpus end CHURNED at that lifetime, anyone still ordering
      // near the end is CENSORED (their lifetime is a lower bound, so
      // they leave the risk set without counting as an event). At each
      // event lifetime t: n_risk = customers with lifetime >= t,
      // S(t) = prod_{t_i<=t} (1 - d_i/n_i), computed as
      // exp(sum(ln(term))) with an explicit any-zero-term guard (ln(0)
      // is null/error — both engines spell the identical CASE).
      // Scale shape: orders collapse to per-customer (first, last) in
      // ONE custkey shuffle, then to the per-lifetime table — bounded
      // by the observed calendar span (~2.4k days), like a date
      // dimension — where the running windows live; the driver moves
      // only the 1-row max day.
      val maxDay = Tables(s, dir).orders
        .select(unix_micros(col("o_orderdate").cast("timestamp")).as("dus"))
        .select(expr("dus DIV 86400000000").as("day"))
        .agg(max(col("day"))).head.getLong(0)
      val perUser = Tables(s, dir).orders
        .select(col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("dus"))
        .select(col("o_custkey"), expr("dus DIV 86400000000").as("day"))
        .groupBy(col("o_custkey"))
        .agg(min(col("day")).as("fd"), max(col("day")).as("ld"))
        .select((col("ld") - col("fd") + 1).as("duration"),
          (col("ld") < maxDay - 90).as("churn"))
      val byT = perUser.groupBy(col("duration"))
        .agg(sum(when(col("churn"), 1L).otherwise(0L)).as("d_events"),
          count(lit(1)).as("leaving"))
      val wPrev = Window.orderBy(col("duration"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy(col("duration"))
        .rowsBetween(Window.unboundedPreceding, 0)
      byT
        .withColumn("n_risk",
          sum(col("leaving")).over(Window.orderBy(col("duration"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .filter(col("d_events") > 0)
        .withColumn("term",
          (col("n_risk") - col("d_events")).cast("double") / col("n_risk"))
        .withColumn("lnterm", when(col("term") > 0, log(col("term")))
          .otherwise(lit(0.0)))
        .withColumn("anyzero", max(when(col("term") <= 0, 1L).otherwise(0L))
          .over(wCum))
        .select(col("duration"), col("n_risk"), col("d_events"),
          when(col("anyzero") === 1, lit(0.0))
            .otherwise(round(exp(sum(col("lnterm")).over(wCum)), 6))
            .as("survival"))
        .orderBy(col("duration"))
    },

    "q209_lorenz_curve" -> { (s, dir) =>
      // Lorenz curve of revenue concentration — the full-curve
      // companion to q188's Gini scalar: users ranked by purchase
      // cents ascending (user_id tie-break), cut into exact ANSI
      // deciles, and per decile the cumulative share of total revenue
      // held by the bottom d/10 of users. Integer cents throughout;
      // the only doubles are the final share divisions. Scale shape:
      // ONE user shuffle to the per-user rollup; ranks and deciles
      // from operators/Quantile (range-bucketed exact ranking, no
      // global sort); the cumulative window runs on the 10-row decile
      // table.
      val per = Tables(s, dir).events
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), floor(col("value") * 100).cast("long").as("c"))
        .groupBy(col("user_id")).agg(sum(col("c")).as("cents"))
      val wCum = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      // r16: Quantile.ntiled — deciles via broadcast boundary compare
      // instead of ranking every user row (user_id unique after the
      // rollup); same ANSI decile assignment (oracle-verified)
      graft.operators.Quantile.ntiled(per, Seq.empty, "cents", "user_id",
          10, "decile")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("decile_cents"))
        .select(col("decile"), col("n_users"), col("decile_cents"),
          round(sum(col("decile_cents")).over(wCum).cast("double") /
            sum(col("decile_cents")).over(wAll).cast("double"), 6)
            .as("cum_share"))
        .orderBy(col("decile"))
    },

    "q215_cohort_ltv" -> { (s, dir) =>
      // Cohort lifetime-value curves — the panel behind "do newer
      // cohorts monetize faster": customers cohorted by FIRST-order
      // year, revenue cents folded per (cohort, age-in-years), the
      // running cumulative divided by the cohort's FULL size (a
      // cohort-level constant, so late-age rows still average over
      // everyone, the standard LTV convention). Integer cents
      // throughout; the only doubles are the final per-customer
      // divisions. Scale shape: ONE custkey shuffle (first order +
      // cohort size), the order join reuses that partitioning, the
      // (cohort x age) fold is a few-dozen-cell agg and every window
      // runs on it.
      val ords = Tables(s, dir).orders
        .select(col("o_custkey"),
          year(col("o_orderdate").cast("date")).cast("long").as("yr"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val firstYr = ords.groupBy(col("o_custkey"))
        .agg(min(col("yr")).as("cohort_year"))
      val cohortSize = firstYr.groupBy(col("cohort_year"))
        .agg(count(lit(1)).as("n_customers"))
      val wCum = Window.partitionBy(col("cohort_year")).orderBy(col("age"))
        .rowsBetween(Window.unboundedPreceding, 0)
      ords.join(firstYr, Seq("o_custkey"))
        .select(col("cohort_year"), (col("yr") - col("cohort_year")).as("age"),
          col("cents"))
        .groupBy(col("cohort_year"), col("age"))
        .agg(sum(col("cents")).as("rev_cents"))
        .join(broadcast(cohortSize), Seq("cohort_year"))
        .withColumn("cum_rev_cents", sum(col("rev_cents")).over(wCum))
        .select(col("cohort_year"), col("age"), col("n_customers"),
          col("rev_cents"), col("cum_rev_cents"),
          round(col("cum_rev_cents").cast("double") / col("n_customers"), 6)
            .as("avg_cum_ltv_cents"))
        .orderBy(col("cohort_year"), col("age"))
    },

    "q217_revenue_autocorr" -> { (s, dir) =>
      // Lag-1 and lag-7 autocorrelation of daily revenue — the
      // seasonality screen run before trusting q168's decomposition or
      // q184's EWMA baseline: high lag-7 r says "weekly cycle, use a
      // seasonal model". Revenue per day is an exact integer cents
      // sum; each lag's Pearson r is computed from per-pair moments
      // with products taken as DOUBLES (day revenue at the sf10 ladder
      // is ~5e9 cents, so an integer x*y would overflow a long at
      // 100x; the r is scale-free, so the ~1e-15 relative FP noise is
      // absorbed by the 6dp round). Pairs align a day with day-k via
      // a lag window in day order. Scale shape: ONE map-side-combined
      // agg to the |days| table; everything after runs on that bounded
      // calendar spine.
      val e = Tables(s, dir).events
      val daily = e.filter(col("event_type") === "purchase")
        .select(Tables.eventMicros(e).as("tus"),
          floor(col("value") * 100).cast("long").as("c"))
        .select(expr("tus DIV 86400000000").as("day"), col("c"))
        .groupBy(col("day")).agg(sum(col("c")).as("rev"))
      val lags = s.range(0, 2)
        .select(when(col("id") === 0, 1L).otherwise(7L).as("lag"))
      // pairs align by calendar DAY (day - k present in the spine),
      // not by row offset, so a missing day breaks the pair instead of
      // silently pairing across the gap
      daily.crossJoin(broadcast(lags))
        .withColumn("day_lag", col("day") - col("lag"))
        .join(daily.select(col("day").as("day_lag"),
          col("rev").as("rev_lag")), Seq("day_lag"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("rev").cast("double")).as("sx"),
          sum(col("rev_lag").cast("double")).as("sy"),
          sum(col("rev").cast("double") * col("rev_lag")).as("sxy"),
          sum(col("rev").cast("double") * col("rev")).as("sxx"),
          sum(col("rev_lag").cast("double") * col("rev_lag")).as("syy"))
        .select(col("lag"), col("n_pairs"),
          round((col("n_pairs") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n_pairs") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n_pairs") * col("syy") - col("sy") * col("sy"))), 6)
            .as("r"))
        .orderBy(col("lag"))
    },

    "q85_sessionize" -> { (s, dir) =>
      // Gap-based sessionization (30-min idle timeout) on the event
      // timeline at microsecond precision (Tables.eventMicros normalizes
      // whichever ts dtype the fixture carries to epoch-us, the same
      // unit the DuckDB oracle reads — q15 makes the same choice):
      // new_sess flags a gap > 30 min
      // from the previous event of the same user, a running sum numbers
      // the sessions, and a rollup emits per-session bounds/counts/
      // value. ONE shuffle on user_id — the lag window, the running
      // counter, and the groupBy(user_id, session_seq) all reuse the
      // same hash partitioning (a subset of the group keys satisfies
      // the distribution), so the plan has a single exchange plus the
      // presentation sort. The same logic runs incrementally at stream
      // time as transformWithState with a 30-min event-time timer
      // (streaming/DedupStreams.scala pattern).
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = lag(col("tus"), 1).over(w)
      val e = Tables(s, dir).events
      e.select(col("user_id"), col("event_id"),
          Tables.eventMicros(e).as("tus"), col("value"))
        .withColumn("new_sess",
          when(prev.isNull || col("tus") - prev > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("tus")).as("session_start_us"),
          max(col("tus")).as("session_end_us"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy(col("user_id"), col("session_seq"))
    },


    "q145_salted_join" -> { (s, dir) =>
      // Fact-to-dimension enrichment under a SALTED shuffle join
      // (operators/Salted): events x customer on user_id with an 8-way
      // deterministic salt — the hot-key remedy when the dim is too
      // big to broadcast. The fixture isn't skewed; what the oracle
      // pins is that salting is RESULT-INVISIBLE (plain SQL join), and
      // the spec pins the plan shape (shuffle hash join on (key,salt),
      // no broadcast of either side). Money stays integer cents via
      // floor(value*100) on both engines (double sums are
      // order-sensitive; DuckDB CAST rounds where Spark truncates, so
      // the floor is explicit). One fact shuffle + one 8x dim shuffle
      // + one bounded groupBy.
      val ev = Tables(s, dir).events
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val cust = Tables(s, dir).customer
        .select(col("c_custkey"), col("c_mktsegment"))
      graft.operators.Salted
        .saltedJoin(ev, cust, "user_id", "c_custkey", col("event_id"), 8)
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * 100).cast("long")).as("value_cents"))
        .orderBy(col("c_mktsegment"), col("event_type"))
    },


    "q162_skyline" -> { (s, dir) =>
      // Pareto frontier (skyline) of orders maximizing (totalprice,
      // orderdate) — "most expensive AND most recent" non-dominated
      // set, the multi-objective top-k every curation dashboard wants.
      // The naive form is a quadratic dominance self-join; the window
      // form needs ONE global sort. This is the distributed textbook
      // shape instead: a LOCAL skyline per salt partition first (the
      // skyline operator is distributive — any point dominated within
      // a partition is dominated globally, so local survivors are a
      // superset of the answer), then the identical two-window logic
      // over the tiny survivor set. At 100 TB the data pays one hash
      // shuffle on salt; the global sort only ever sees survivors
      // (output-bounded — frontier size, not corpus size). Dominance
      // is exact-integer: price in cents, date in epoch-micros; the
      // strictly-higher-price frame is a RANGE window (cents are
      // integers, so "1 PRECEDING" under DESC order IS strictness),
      // equal-price ties resolve by the price-group max date, and
      // duplicate (price, date) points all survive (none dominates).
      val o = Tables(s, dir).orders.select(
        col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"),
        // parquet ships NTZ; session TZ is pinned UTC, so the cast is
        // the identity epoch mapping DuckDB's epoch_us applies
        unix_micros(col("o_orderdate").cast("timestamp")).as("date_us"))
      graft.operators.Skyline.skyline(o, "price_c", "date_us",
          col("o_orderkey"))
        .select(col("o_orderkey"), col("price_c"), col("date_us"))
        .orderBy(col("price_c").desc, col("o_orderkey"))
    },


    "q165_pivot_matrix" -> { (s, dir) =>
      // PIVOT — long-to-wide reshaping (the report/export shape every
      // BI layer asks for), via Spark's native pivot with an EXPLICIT
      // value list: day-of-week x event_type counts. The explicit list
      // matters at scale — pivot without one runs a whole extra
      // distinct-discovery job over the corpus before it can even plan
      // the agg; with it, the pivot is ONE ordinary partial-agg shuffle
      // to |dow| rows with 5 count columns (map-side combined like any
      // groupBy). Day-of-week is pure integer epoch arithmetic
      // (epoch day 0 = Thursday; +4 makes Sunday 0), no timezone
      // functions — identical on both engines.
      val ev = Tables(s, dir).events
      ev.select(Tables.eventMicros(ev).as("tus"), col("event_type"))
        .select(pmod(expr("tus DIV 86400000000") + 4, lit(7)).as("dow"),
          col("event_type"))
        .groupBy(col("dow"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("dow"))
    },


    "q166_corr_matrix" -> { (s, dir) =>
      // Pearson correlation matrix over lineitem's four measures from
      // ONE partial-agg pass — the screening statistic before any
      // feature-selection / PCA step. All 15 moments (count, 4 sums,
      // 4 sums of squares, 6 cross products) ride a single scan to a
      // 1-row aggregate as EXACT integer sums (dollar units keep
      // sum(p^2) inside a long out past 100x scale; the sums have no FP
      // accumulation-order sensitivity, so any partitioning yields the
      // same row), and every pairwise correlation is closed-form
      // arithmetic on that row — the final n*Sab - Sa*Sb products run
      // in double space (they overflow a long) over bit-identical
      // integer inputs, so both engines agree to the last ulp. The
      // matrix unpivots through one explode, NOT six re-aggregations:
      // contrast with calling corr() six times = six corpus scans.
      // Scale: the only data movement is the map-side-combined
      // 15-long partial state per task.
      val li = Tables(s, dir).lineitem.select(
        floor(col("l_quantity")).cast("long").as("q"),
        floor(col("l_extendedprice")).cast("long").as("p"),
        floor(col("l_discount") * 100).cast("long").as("d"),
        floor(col("l_tax") * 100).cast("long").as("t"))
      val vars = Seq("q", "p", "d", "t")
      val moments = li.agg(
        count(lit(1)).as("n"),
        vars.map(v => sum(col(v)).as(s"s_$v")) ++
          vars.map(v => sum(col(v) * col(v)).as(s"ss_$v")) ++
          vars.combinations(2).map { case Seq(a, b) =>
            sum(col(a) * col(b)).as(s"sp_${a}_$b") }.toSeq: _*)
      def corrCol(a: String, b: String): Column = {
        val n = col("n").cast("double")
        def d(c: String) = col(c).cast("double")
        val num = n * d(s"sp_${a}_$b") - d(s"s_$a") * d(s"s_$b")
        val den = sqrt(n * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")) *
          sqrt(n * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b"))
        round(num / den, 6)
      }
      moments.select(explode(array(vars.combinations(2).toSeq.map {
        case Seq(a, b) => struct(lit(a).as("var_a"), lit(b).as("var_b"),
          corrCol(a, b).as("corr"))
      }: _*)).as("r"))
        .select(col("r.var_a").as("var_a"), col("r.var_b").as("var_b"),
          col("r.corr").as("corr"))
        .orderBy(col("var_a"), col("var_b"))
    },


    "q168_seasonal_decompose" -> { (s, dir) =>
      // Weekly seasonal index per event type via moving-average
      // detrending — the classical-decomposition front half (trend =
      // centered 7-day MA, seasonal = mean deviation by day-of-week),
      // feeding anomaly detection that must not fire on weekends
      // (complements q148's CUSUM and q159's MAD, which are season-
      // blind). Exact integer end-to-end: the trend stays as its x7
      // sum (never divided), deviations dev7 = 7*cnt - trend7 are
      // integers, and the single division happens once at the output
      // under a 4dp round on bit-identical integer sums. Scale shape:
      // the event stream collapses ONCE to (type, day) cells; the MA
      // window and dow rollup run on the calendar-bounded cell table
      // (q148's posture). Edge days without a full 7-day window are
      // excluded from the index (count-gated), not zero-filled.
      val ev = Tables(s, dir).events
      val cells = ev.select(col("event_type"), Tables.eventMicros(ev).as("tus"))
        .select(col("event_type"), expr("tus DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
      val wma = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rangeBetween(-3, 3)
      cells
        .withColumn("trend7", when(count(lit(1)).over(wma) === 7,
          sum(col("cnt")).over(wma)))
        .filter(col("trend7").isNotNull)
        .withColumn("dev7", lit(7) * col("cnt") - col("trend7"))
        .groupBy(col("event_type"), pmod(col("day") + 4, lit(7)).as("dow"))
        .agg(count(lit(1)).as("n_days"),
          round(sum(col("dev7")).cast("double") / (lit(7.0) * count(lit(1))), 4)
            .as("seasonal"))
        .orderBy(col("event_type"), col("dow"))
    },


    "q172_basket_rules" -> { (s, dir) =>
      // Association rules over daily user baskets (support /
      // confidence / lift — the market-basket classic): basket =
      // distinct event types a user fires in a day, pairs counted
      // within basket. Shape: ONE (user, day, type) dedup shuffle,
      // then the pair self-join runs INSIDE each basket, bounded by
      // |types|^2 = 25 here — and in the general big-catalog case by
      // a-priori pruning (only types above min-support join, the same
      // frequent-first discipline; the pair table is (frequent items)^2
      // whatever the event volume). Marginals broadcast back from a
      // |types|-row agg; support/confidence/lift are single double
      // divisions over exact integer counts, 6dp-rounded. Ordered
      // pairs (a != b): confidence is directional, and the symmetric
      // lift gets spec-checked for equality across the two directions.
      val ev = Tables(s, dir).events
      val baskets = ev.select(col("user_id"),
        Tables.eventMicros(ev).as("tus"), col("event_type"))
        .select(col("user_id"), expr("tus DIV 86400000000").as("day"),
          col("event_type")).distinct()
      // basket total rides a broadcast 1-row agg (q124's bounds
      // pattern), never a driver-side action
      val nB = baskets.select(col("user_id"), col("day")).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val item = baskets.groupBy(col("event_type").as("a"))
        .agg(count(lit(1)).as("n_a"))
      val pair = baskets.as("x").join(baskets.as("y"),
          col("x.user_id") === col("y.user_id") && col("x.day") === col("y.day")
            && col("x.event_type") =!= col("y.event_type"))
        .groupBy(col("x.event_type").as("a"), col("y.event_type").as("b"))
        .agg(count(lit(1)).as("n_ab"))
      def d(c: Column) = c.cast("double")
      pair
        .join(broadcast(item), Seq("a"))
        .join(broadcast(item.select(col("a").as("b"), col("n_a").as("n_b"))),
          Seq("b"))
        .crossJoin(broadcast(nB))
        .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
          round(d(col("n_ab")) / d(col("n_baskets")), 6).as("support"),
          round(d(col("n_ab")) / d(col("n_a")), 6).as("confidence"),
          round(d(col("n_baskets")) * d(col("n_ab")) /
            (d(col("n_a")) * d(col("n_b"))), 6).as("lift"))
        .orderBy(col("a"), col("b"))
    },


    "q176_benford_audit" -> { (s, dir) =>
      // Benford first-digit audit — the fraud / synthetic-data /
      // unit-mixing screen: observed leading-digit distribution of
      // order amounts vs log10(1 + 1/d), with per-digit chi-square
      // contributions. ONE partial-agg shuffle to 9 cells; expected
      // counts and contributions are closed-form doubles over the
      // exact integer counts (ln/ln10 spelled out so both engines run
      // the identical expression). The verdict column is a REPORT, not
      // an assertion — TPC-H-style uniform amounts genuinely fail
      // Benford, and that failure is exactly what the audit is for.
      val dig = substring(floor(col("o_totalprice")).cast("long")
        .cast("string"), 1, 1).cast("long")
      val cells = Tables(s, dir).orders.select(dig.as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = cells.agg(sum(col("n")).as("nt"))
      def d(c: Column) = c.cast("double")
      val expN = d(col("nt")) * (log(lit(1.0) + lit(1.0) / d(col("digit"))) / log(lit(10.0)))
      cells.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          round(expN, 3).as("expected_n"),
          round(pow(d(col("n")) - expN, 2) / expN, 4).as("chi2_contrib"))
        .orderBy(col("digit"))
    },


    "q179_props_variant" -> { (s, dir) =>
      // Semi-structured column analytics over Spark 4 VariantType —
      // the production answer to "aggregate a JSON sidecar at 100 TB":
      // props parses ONCE into the binary variant encoding (vectorized
      // parse_json; a shredded parquet variant column pushes the path
      // access into the scan), variant_get extracts the typed field
      // with no per-operator Jackson re-parse, and the result is an
      // ordinary integer aggregation — (type, k-decade) histogram
      // cells. Contrast with get_json_object chains, which re-parse
      // the string per extraction. One partial-agg shuffle to
      // |types| x 10 cells.
      Tables(s, dir).events
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .filter(col("k").isNotNull)
        .groupBy(col("event_type"), expr("k div 10").as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"), col("bucket"))
    },


    "q180_share_of_total" -> { (s, dir) =>
      // Ratio-to-report window family (share-of-parent / share-of-
      // total): revenue per (returnflag, linestatus) with its share
      // inside the flag and of the grand total. The corpus pays ONE
      // partial-agg shuffle to the tiny group table; both share
      // windows run over those few rows (the parent totals are window
      // sums, not re-aggregations of the data). Money stays integer
      // cents; shares are single double divisions 6dp-rounded.
      val g = Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long"))
          .as("revenue_cents"))
      val wf = Window.partitionBy(col("l_returnflag"))
      val wt = Window.partitionBy()
      def d(c: Column) = c.cast("double")
      g.select(col("l_returnflag"), col("l_linestatus"), col("revenue_cents"),
          round(d(col("revenue_cents")) / d(sum(col("revenue_cents")).over(wf)), 6)
            .as("share_of_flag"),
          round(d(col("revenue_cents")) / d(sum(col("revenue_cents")).over(wt)), 6)
            .as("share_of_total"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },


    "q181_session_paths" -> { (s, dir) =>
      // Top session paths — the journey-analytics counterpart to
      // q141's first-order transitions: the full ordered event-type
      // sequence per session (q85's 30-min gap sessions), truncated to
      // the first 8 events (the cap that keeps path cardinality and
      // row width bounded at any session length), counted and ranked.
      // The event stream shuffles ONCE on user_id (lag window, session
      // counter, rank window and the session rollup all reuse that
      // hash); path strings only exist on the |sessions|-bounded
      // table, and the final count + top-10 is TakeOrdered.
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = lag(col("tus"), 1).over(w)
      val e = Tables(s, dir).events
      val sess = e.select(col("user_id"), col("event_id"),
          Tables.eventMicros(e).as("tus"), col("event_type"))
        .withColumn("new_sess",
          when(prev.isNull || col("tus") - prev > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("new_sess")).over(run))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("session_seq"))
            .orderBy(col("tus"), col("event_id"))))
        .filter(col("rn") <= 8)
      val paths = sess
        .groupBy(col("user_id"), col("session_seq"))
        .agg(array_join(transform(array_sort(collect_list(
          struct(col("rn"), col("event_type")))), _.getField("event_type")),
          "->").as("path"))
      paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(10)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("n_sessions").desc, col("path"))).cast("long"))
        .select(col("rk"), col("path"), col("n_sessions"))
        .orderBy(col("rk"))
    },


    "q184_ewma_anomaly" -> { (s, dir) =>
      // EWMA traffic monitor (Roberts 1959): per-type daily volumes
      // scored against an exponentially-weighted moving average of the
      // STRICTLY EARLIER days — the decay form of q148's CUSUM, and the
      // one whose streaming twin carries a single number of state per
      // type (EventStreams). ewma_prev(d) = 0.25 * sum_{b<d} cnt_b *
      // 0.75^(d-1-b) (decay by calendar distance, so day gaps weigh
      // correctly); days with < 5 priors have no stable baseline and
      // are skipped. 0.75^k is exactly representable for k <= 33 (3^k
      // fits the mantissa), so the only FP noise is summation order,
      // absorbed by round 6. Scale shape: the raw stream collapses to
      // (type, day) cells in ONE count agg; the quadratic pair join
      // runs on the bounded daily table (days^2 rows per type, never
      // event rows). The flag compares against the ROUNDED ewma so both
      // engines decide identically at the boundary.
      val e = Tables(s, dir).events
      val daily = e.select(col("event_type"), Tables.eventMicros(e).as("tus"))
        .select(col("event_type"), expr("tus DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
      val a = daily.as("a")
      val b = daily.select(col("event_type").as("b_type"),
        col("day").as("b_day"), col("cnt").as("b_cnt"))
      a.join(b, col("a.event_type") === col("b_type") &&
          col("b_day") < col("a.day"))
        .groupBy(col("a.event_type").as("event_type"), col("a.day").as("day"),
          col("a.cnt").as("cnt"))
        .agg(count(lit(1)).as("n_prior"),
          round(lit(0.25) * sum(col("b_cnt") *
            pow(lit(0.75), col("a.day") - col("b_day") - 1)), 6).as("ewma_prev"))
        .filter(col("n_prior") >= 5)
        .select(col("event_type"), col("day"), col("cnt"), col("ewma_prev"),
          round(col("cnt") / col("ewma_prev"), 6).as("ratio"),
          (col("cnt") > lit(2.0) * col("ewma_prev")).as("flagged"))
        .orderBy(col("event_type"), col("day"))
    },


    "q185_decile_lift" -> { (s, dir) =>
      // Decile lift / gains table — the model-eval readout for the
      // q132 DSIR relevance score as a target-source classifier: rank
      // all docs by score, cut into ntile(10) deciles, and report each
      // decile's positive rate, lift over the base rate, and cumulative
      // capture (the gains curve). Every reported number is a single
      // division of EXACT integer products (n_pos*tot, n*tot_pos), so
      // engine and oracle are bit-equal. Scale shape: scoring is the
      // q132 map-only plan-literal lookup; the decile cut is the
      // EXACT distributed rank (operators/Quantile: range-bucket +
      // per-bucket local sort + broadcast prefix offsets) — no
      // single-partition ntile window anywhere, yet the same
      // equal-count, doc_id-tie-broken decile CONTRACT a global
      // ntile(10) pins. The 6dp score maps losslessly to integer
      // micro-units (two distinct 6dp doubles stay >= 1 apart after
      // *1e6, FP error ~1e-10), negated so ascending rank = score
      // descending; the windows after the cut run on 10 decile rows.
      val docs = Tables(s, dir).documents
      val tgt = docs.agg(min(col("source"))).head.getString(0)
      val t = toks(col("text"))
      val llr = dsirLlrCached(s, dir)
      val scored = docs.filter(hasTokens).select(col("doc_id"),
        (col("source") === tgt).as("y"),
        round(dsir_sum(t, typedlit(llr.toSeq)) / size(t), 6).as("score"))
        .withColumn("sneg", -round(col("score") * 1e6).cast("long"))
      val wAll = Window.partitionBy()
      val wCum = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // r16: Quantile.ntiled — deciles via broadcast boundary compare
      // instead of ranking every scored doc (doc_id unique); same ANSI
      // decile assignment (oracle-verified)
      graft.operators.Quantile.ntiled(scored, Seq.empty, "sneg", "doc_id",
          10, "decile")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"))
        .withColumn("tot", sum(col("n")).over(wAll))
        .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
        .select(col("decile"), col("n"), col("n_pos"),
          round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"),
          round((col("n_pos") * col("tot")).cast("double") /
            (col("n") * col("tot_pos")), 6).as("lift"),
          round(sum(col("n_pos")).over(wCum).cast("double") / col("tot_pos"), 6)
            .as("cum_capture"))
        .orderBy(col("decile"))
    },


    "q186_calibration_bins" -> { (s, dir) =>
      // Calibration-curve bins + per-bin Brier score for the logistic
      // transform of the DSIR score (p = 1/(1+exp(-8*score))) — the
      // reliability diagram behind "is the classifier's confidence
      // honest". Bin = floor(p*10) clamped to 9; per bin: mean
      // predicted p, empirical positive rate, mean squared error.
      // exp() runs on the ROUNDED score (identical input both engines);
      // the only cross-engine FP risk is summation order inside
      // avg(), absorbed by round 6. Scale shape: scoring and binning
      // are map-only per-row; the only shuffle is the 10-cell bin agg
      // with map-side partials.
      val docs = Tables(s, dir).documents
      val tgt = docs.agg(min(col("source"))).head.getString(0)
      val t = toks(col("text"))
      val llr = dsirLlrCached(s, dir)
      val p = lit(1.0) / (lit(1.0) + exp(lit(-8.0) *
        round(dsir_sum(t, typedlit(llr.toSeq)) / size(t), 6)))
      docs.filter(hasTokens)
        .select((col("source") === tgt).as("y"), p.as("p"))
        .withColumn("bin", least(floor(col("p") * 10).cast("long"), lit(9L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
          round(avg(col("p")), 6).as("avg_p"),
          round(avg(pow(col("p") - when(col("y"), 1.0).otherwise(0.0), 2)), 6)
            .as("brier"))
        .withColumn("emp_rate", round(col("n_pos").cast("double") / col("n"), 6))
        .select(col("bin"), col("n"), col("n_pos"), col("avg_p"),
          col("emp_rate"), col("brier"))
        .orderBy(col("bin"))
    },


    "q188_gini_concentration" -> { (s, dir) =>
      // Revenue-concentration report: Gini coefficient + top-1%/10%
      // revenue shares of per-user purchase value — the inequality
      // readout behind "do whales dominate the corpus/revenue".
      // Money stays floor(value*100) integer cents; the Gini uses the
      // rank form G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over
      // the (cents, user_id)-sorted sequence, so every term is an
      // exact integer product (fits a long through the sf10 ladder)
      // and the only FP op is the final division, bit-equal on both
      // engines. Top-k cutoffs are nearest-rank (ceil(n/100),
      // ceil(n/10)) on the descending order. Scale shape: events
      // collapse to the per-user rollup in ONE hash shuffle; ranks
      // come from the EXACT distributed ranking (operators/Quantile —
      // range-bucket + local sort + prefix offsets), so no partition
      // ever holds more than ~|users|/cells rows. The descending rank
      // is taken as j = n - i + 1 (user_id-reversed within a cents
      // tie, but every aggregate here is tie-blind: sum(i*x) over a
      // tie group and the top-k cents sums are invariant under
      // permuting equal values, so this matches the oracle's
      // user-ascending row_number bit for bit).
      val per = Tables(s, dir).events
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), floor(col("value") * 100).cast("long").as("c"))
        .groupBy(col("user_id")).agg(sum(col("c")).as("cents"))
      graft.operators.Quantile.ranked(per, Seq.empty, "cents", "user_id",
          rankCol = "i")
        .withColumn("j", col("n") - col("i") + 1)
        .agg(max(col("n")).as("n_users"),
          sum(col("cents")).as("total_cents"),
          sum(col("i") * col("cents")).as("iw"),
          sum(when(col("j") * 100 <= col("n") + 99, col("cents"))
            .otherwise(0L)).as("top1"),
          sum(when(col("j") * 10 <= col("n") + 9, col("cents"))
            .otherwise(0L)).as("top10"))
        .select(col("n_users"), col("total_cents"),
          round((lit(2L) * col("iw") - (col("n_users") + 1) * col("total_cents"))
            .cast("double") / (col("n_users") * col("total_cents")).cast("double"), 6)
            .as("gini"),
          round(col("top1").cast("double") / col("total_cents"), 6).as("top1_share"),
          round(col("top10").cast("double") / col("total_cents"), 6).as("top10_share"))
    },


    "q192_winsorized_stats" -> { (s, dir) =>
      // Winsorized robust statistics per event type: nearest-rank
      // p05/p95 cutoffs on integer cents, the clamped (winsorized)
      // mean beside the raw mean, and how many observations the clamp
      // touched — the outlier-robust preprocessing step before any
      // value model. All-integer until the two final divisions (same
      // contract as q142's order statistics). Scale shape: ranks come
      // from the EXACT distributed ranking (operators/Quantile), so
      // the raw events NEVER funnel into |event_type| ~ 5 partitions —
      // every sort partition is a bounded (type, cell) bucket; the
      // rank rows at the two nearest-rank targets collapse to a
      // 2-values-per-type cutoff table that broadcasts back onto the
      // same ranked scan for the clamp rollup.
      // the slim projection is materialized ONCE and consumed by BOTH
      // the cutoff computation and the clamp rollup (r16: see below)
      val base = Checkpoints.cp(Tables(s, dir).events
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 100).cast("long").as("c")))
      // r16 (VERDICT r15 #5): Quantile.cutoffs emits ONLY the values
      // at the two nearest-rank targets — the r15 form ranked every
      // row (full-input window sort), checkpointed the full ranked
      // table, and read it twice just to find 2 rows per type and
      // clamp against them. cutoffs keeps the same bounded passes 0-3
      // and sorts only the <= 2 buckets per type that contain a
      // target; the clamp rollup reads the materialized slim input
      // directly. Same nearest-rank definition, same integer values
      // (oracle-verified).
      val cuts = graft.operators.Quantile.cutoffs(
        base, Seq("event_type"), "c", "event_id",
        Seq("lo" -> "(n + 19) DIV 20", "hi" -> "(19 * n + 19) DIV 20"))
        .select(col("event_type"), col("lo"), col("hi"))
      base.join(broadcast(cuts), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          max(col("lo")).as("p05_cents"), max(col("hi")).as("p95_cents"),
          round(sum(col("c")).cast("double") / count(lit(1)), 6).as("raw_mean"),
          round(sum(greatest(least(col("c"), col("hi")), col("lo"))).cast("double")
            / count(lit(1)), 6).as("win_mean"),
          sum(when(col("c") < col("lo") || col("c") > col("hi"), 1L)
            .otherwise(0L)).as("n_clamped"))
        .orderBy(col("event_type"))
    },


    "q193_rfm_segments" -> { (s, dir) =>
      // RFM segmentation — the classic customer-value grid: per
      // purchasing user, Recency (last purchase day), Frequency
      // (purchase count) and Monetary (total integer cents), each cut
      // into exact quartile scores (user_id tie-break makes every
      // order total), then the population rolled up per (r, f, m)
      // cell — at most 64 segments whatever the user count. Scale
      // shape: events collapse to the per-user rollup in ONE hash
      // shuffle; the three quartile cuts ride ONE unpivoted
      // (dimension, value, user) pass through the EXACT distributed
      // ranking (operators/Quantile, grouped by dimension — its
      // id-split level matters here: freq's handful of distinct
      // values would put 40% of users in one sort partition under a
      // value-only bucketing), the closed-form ntile maps rank to
      // quartile, and one user_id pivot-back reassembles the (r,f,m)
      // triple. The final agg touches 64 cells. avg_cents is one
      // exact integer division.
      val e = Tables(s, dir).events
      val per = e
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), Tables.eventMicros(e).as("tus"),
          floor(col("value") * 100).cast("long").as("c"))
        .select(col("user_id"), expr("tus DIV 86400000000").as("day"), col("c"))
        .groupBy(col("user_id"))
        .agg(max(col("day")).as("last_day"), count(lit(1)).as("freq"),
          sum(col("c")).as("cents"))
      val dims = per.select(col("user_id"), col("cents"), explode(array(
          struct(lit("r").as("dim"), col("last_day").as("v")),
          struct(lit("f").as("dim"), col("freq").as("v")),
          struct(lit("m").as("dim"), col("cents").as("v")))).as("x"))
        .select(col("user_id"), col("cents"), col("x.dim").as("dim"),
          col("x.v").as("v"))
      // r16: Quantile.ntiled — quartiles via broadcast boundary
      // compare instead of ranking every (dim, user) row (user_id is
      // unique per dim, ntiled's precondition); the full-input window
      // sort is gone, same ANSI quartile assignment (oracle-verified)
      val scored = graft.operators.Quantile.ntiled(
        dims, Seq("dim"), "v", "user_id", 4, "score")
      scored
        .groupBy(col("user_id"))
        .agg(max(when(col("dim") === "r", col("score"))).as("r_score"),
          max(when(col("dim") === "f", col("score"))).as("f_score"),
          max(when(col("dim") === "m", col("score"))).as("m_score"),
          first(col("cents")).as("cents"))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("total_cents"))
        .withColumn("avg_cents",
          round(col("total_cents").cast("double") / col("n_users"), 6))
        .orderBy(col("r_score"), col("f_score"), col("m_score"))
    },


    "q199_scd2_intervals" -> { (s, dir) =>
      // SCD2 dimension-history build — the ETL op that turns a change
      // log into validity intervals (Kimball type-2): per customer,
      // consecutive runs of the same order priority collapse into
      // [valid_from, valid_to) rows, valid_to = the next run's start
      // (null while current). Change detection is a lag, run
      // numbering a conditional cumsum, interval bounds a group-min,
      // and valid_to a lead — ALL on the same hash(custkey) exchange
      // (every window/group key starts with o_custkey, the q85 subset
      // rule), so the order log shuffles ONCE however large it is.
      // The q156 CDC merge consumes what this op produces.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("od"), col("o_orderkey"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wIv = Window.partitionBy(col("o_custkey")).orderBy(col("run_id"))
      Tables(s, dir).orders
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("od"), col("o_orderpriority"))
        .withColumn("chg",
          when(lag(col("o_orderpriority"), 1).over(w).isNull ||
            lag(col("o_orderpriority"), 1).over(w) =!= col("o_orderpriority"), 1L)
            .otherwise(0L))
        .withColumn("run_id", sum(col("chg")).over(run))
        .groupBy(col("o_custkey"), col("run_id"))
        .agg(min(col("o_orderpriority")).as("priority"),
          min(col("od")).as("valid_from"),
          count(lit(1)).as("n_orders"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(wIv))
        .select(col("o_custkey").as("custkey"), col("run_id"), col("priority"),
          col("valid_from"), col("valid_to"), col("n_orders"))
        .orderBy(col("custkey"), col("run_id"))
    },


    "q200_wow_revenue" -> { (s, dir) =>
      // Week-over-week revenue by region — the canonical BI
      // period-over-period report, and the broadcast-dim-chain
      // showcase: orders join customer -> nation -> region as THREE
      // broadcast hash joins (dims are tiny at any fact scale — the
      // 100 TB star-schema posture), facts collapse to (region, week)
      // cells in ONE agg, and the lag/delta windows run on that
      // calendar-bounded table. Money stays integer cents; the delta
      // is one double division on exact integers, null on the first
      // week of each region (both engines).
      val t = Tables(s, dir)
      val wk = Window.partitionBy(col("region")).orderBy(col("week"))
      t.orders
        .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation.select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region.select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("region"),
          expr("datediff(od, DATE'1970-01-01') div 7").as("week"), col("cents"))
        .groupBy(col("region"), col("week"))
        .agg(sum(col("cents")).as("cents"))
        .withColumn("prev_cents", lag(col("cents"), 1).over(wk))
        .withColumn("wow_pct",
          when(col("prev_cents").isNotNull && col("prev_cents") =!= 0,
            round((col("cents") - col("prev_cents")).cast("double") /
              col("prev_cents"), 6)))
        .orderBy(col("region"), col("week"))
    },


    "q142_funnel_latency" -> { (s, dir) =>
      // Time-to-convert distribution for the q139 funnel: NEAREST-RANK
      // percentiles (k = ceil(p*n), exact order statistic) of
      // view->click and view->purchase latency over CONVERTED users —
      // all-integer, so the value is bit-identical on both engines
      // (interpolated percentiles of ~5e11-microsecond latencies
      // diverge at the double's ulp, which at that magnitude is larger
      // than any decimal rounding grid — measured before this form).
      // Scale shape: the two latency measures unpivot into ONE
      // (measure, latency, user) stream through the EXACT distributed
      // ranking (operators/Quantile, grouped by measure) — no
      // collect_list-into-one-row, no measure-partition window; the
      // value at each nearest-rank target folds to the single report
      // row by conditional aggregation. Same one-shuffle funnel chain
      // as q139 (shared funnelTimes). Zero converted users => the
      // rank targets match nothing and the conditional max is NULL,
      // the oracle's quantile-of-empty — matched instead of thrown.
      val seven = 7L * 86400000000L
      val cl = when(col("t2").isNotNull && col("t2") - col("t1") <= seven,
        col("t2") - col("t1"))
      val pl = when(col("t3").isNotNull && col("t3") - col("t1") <= seven,
        col("t3") - col("t1"))
      val lat = funnelTimes(Tables(s, dir).events)
        .select(col("user_id"), explode(array(
          struct(lit("c").as("m"), cl.as("v")),
          struct(lit("p").as("m"), pl.as("v")))).as("x"))
        .select(col("user_id"), col("x.m").as("m"), col("x.v").as("v"))
        .filter(col("v").isNotNull)
      // r16 (VERDICT r15 #5): Quantile.cutoffs — the r15 form ranked
      // every converted user (full window sort over the latency
      // stream) to read off 2 rows per measure; cutoffs keeps passes
      // 0-3 and sorts only the <= 2 target buckets per measure. A
      // measure with zero converted users emits no cutoff row, so the
      // conditional max stays NULL and coalesce keeps the 0 — the same
      // quantile-of-empty contract as before (oracle-verified).
      graft.operators.Quantile.cutoffs(lat, Seq("m"), "v", "user_id",
          Seq("p50" -> "(n + 1) DIV 2", "p90" -> "(9 * n + 9) DIV 10"))
        .agg(
          coalesce(max(when(col("m") === "c", col("n"))), lit(0L))
            .as("n_click_conv"),
          max(when(col("m") === "c", col("p50"))).as("click_p50_us"),
          max(when(col("m") === "c", col("p90"))).as("click_p90_us"),
          coalesce(max(when(col("m") === "p", col("n"))), lit(0L))
            .as("n_purchase_conv"),
          max(when(col("m") === "p", col("p50"))).as("purchase_p50_us"),
          max(when(col("m") === "p", col("p90"))).as("purchase_p90_us"))
    },


    "q141_event_transitions" -> { (s, dir) =>
      // First-order Markov transition matrix over the event stream:
      // P(next event type | current type) per user timeline — the
      // journey-analysis rollup behind "what do users do after X".
      // ONE user shuffle: the lag window orders each user's timeline
      // (ties broken by event_id, so the matrix is layout-free), then
      // the (from, to) pair counts and row-marginal window run over
      // the |types|^2-bounded transition table. Probabilities are
      // exact integer ratios rounded once.
      val e = Tables(s, dir).events
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val pairs = e
        .select(col("user_id"), col("event_id"), col("event_type"),
          Tables.eventMicros(e).as("tus"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      pairs
        .withColumn("row_total",
          sum(col("n")).over(Window.partitionBy(col("from_type"))))
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast("double") / col("row_total"), 6).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    },


    "q241_page_hinkley" -> { (s, dir) =>
      // Page-Hinkley drift detection over per-type daily revenue —
      // the sequential mean-shift monitor for the case q148's CUSUM
      // doesn't cover: no trained baseline, the reference level is the
      // RUNNING mean itself. Per (type, day): mean_t = exact prefix
      // integer sum / count (one double division per row), dev_t =
      // x_t - mean_t, U_t = cumsum(dev), PH_t = U_t - min_{i<=t} U_i,
      // alarm when the unrounded PH exceeds the pre-registered
      // lambda = 100000 cents. Devs fold in day order on both engines
      // (the q211 cumsum contract), so the double sequence is
      // bit-identical. Scale shape: the event stream collapses to
      // (type, day) cells in ONE map-side-combined agg; the three
      // stacked windows share the hash(event_type) exchange on the
      // calendar-bounded table. The streaming twin
      // (EventStreams.pageHinkley) carries (n, sum, U, Umin) per type
      // — four scalars — and is parity-specced bit-for-bit.
      val e = Tables(s, dir).events
      val wo = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val daily = e.select(col("event_type"), Tables.eventMicros(e).as("tus"),
          floor(col("value") * 100).cast("long").as("c"))
        .select(col("event_type"), expr("tus DIV 86400000000").as("day"),
          col("c"))
        .groupBy(col("event_type"), col("day")).agg(sum(col("c")).as("x"))
      daily
        .withColumn("mean_t", sum(col("x")).over(wo).cast("double") /
          count(lit(1)).over(wo))
        .withColumn("u", sum(col("x").cast("double") - col("mean_t")).over(wo))
        .withColumn("ph", col("u") - min(col("u")).over(wo))
        .select(col("event_type"), col("day"), col("x"),
          round(col("mean_t"), 6).as("running_mean"),
          round(col("ph"), 6).as("ph_stat"),
          (col("ph") > lit(100000.0)).as("alarm"))
        .orderBy(col("event_type"), col("day"))
    },


    "q148_cusum_anomaly" -> { (s, dir) =>
      // CUSUM changepoint detection (Page 1954) over per-type daily
      // event volumes — "which day did traffic for X structurally
      // jump". The textbook recursion S_t = max(0, S_{t-1} + dev_t) is
      // sequential, but it has the closed window form
      // S_t = cum_t - min(0, min_{i<=t} cum_i) (running sum minus
      // clamped running min), so the whole statistic is two prefix
      // windows — no recursion, no driver loop. All-integer: the
      // per-type mean is floor(total/days), so deviations, cums and
      // peaks are exact on both engines. Scale shape: the raw stream
      // collapses to (type, day) cells in ONE count agg; every window
      // after that runs on the bounded daily table sharing the
      // hash(event_type) exchange; peak-day pick is deterministic
      // (earliest day at the max).
      val e = Tables(s, dir).events
      val wt = Window.partitionBy(col("event_type"))
      val wo = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val daily = e.select(col("event_type"), Tables.eventMicros(e).as("tus"))
        .select(col("event_type"), expr("tus DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
      val scored = daily
        .withColumn("mu",
          floor(sum(col("cnt")).over(wt) / count(lit(1)).over(wt)).cast("long"))
        .withColumn("cum", sum(col("cnt") - col("mu")).over(wo))
        .withColumn("s", col("cum") - least(min(col("cum")).over(wo), lit(0L)))
      scored.withColumn("peak", max(col("s")).over(wt))
        .filter(col("s") === col("peak"))
        .groupBy(col("event_type"))
        .agg(max(col("s")).as("peak_cusum"), min(col("day")).as("peak_day"),
          max(col("mu")).as("mean_daily"))
        .orderBy(col("event_type"))
    },


    "q149_attribution" -> { (s, dir) =>
      // LAST-TOUCH conversion attribution: each purchase credits the
      // most recent preceding view by the same user (7-day window) —
      // the marketing-analytics join that naive implementations write
      // as a self-join (every purchase x every earlier view, quadratic
      // per user). Here it's ONE conditional running-max window over
      // the user timeline (ordered by (tus, event_id) so ties are
      // layout-free), then a bounded per-day rollup: a single
      // hash(user_id) exchange carries the whole computation at any
      // event volume. Money stays floor(value*100) integer cents
      // (q145's cross-engine rule).
      val e = Tables(s, dir).events
      val wz = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val seven = 7L * 86400000000L
      e.select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), Tables.eventMicros(e).as("tus"))
        .withColumn("last_view",
          max(when(col("event_type") === "view", col("tus"))).over(wz))
        .filter(col("event_type") === "purchase")
        .select(expr("tus DIV 86400000000").as("day"),
          (col("last_view").isNotNull &&
            col("tus") - col("last_view") <= seven).as("attr"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(col("attr"), 1L).otherwise(0L)).as("n_attributed"),
          sum(when(col("attr"), col("cents")).otherwise(0L)).as("attributed_cents"))
        .orderBy(col("day"))
    },


    "q225_shapley_attribution" -> { (s, dir) =>
      // EXACT Shapley-value conversion attribution (the game-theoretic
      // successor to q149's last-touch rule — GA4-style "data-driven
      // attribution", Shapley 1953): channels are the non-purchase
      // event types; a user's coalition is the SET of channels they
      // touched; the game's worth v(S) = converting users whose
      // touched set is inside S (cumulative-reach game). Shapley value
      // of channel i = sum over coalitions S not containing i of
      // |S|!(n-|S|-1)!/n! * (v(S+i) - v(S)) — each channel's average
      // marginal conversions over all orderings, the unique efficient/
      // symmetric split (sum of values = v(all) - v({})).
      // Only touches STRICTLY BEFORE the user's first purchase count
      // (pre-conversion attribution — post-purchase activity is not a
      // cause; non-converters count all touches), which also keeps
      // coalitions sparse instead of everyone-touched-everything.
      // Scale shape: ONE user_id shuffle carries both the first-
      // purchase window and the per-user (channel bitmask, converted)
      // rollup, then the <= 2^n exact-set table; every coalition table
      // after that is literal-sized (n <= 12 channels by the factorial
      // table => <= 4096 rows), all crosses broadcast-of-tiny. Math is
      // exact integers end to end — weights as factorial products,
      // marginals as bigint counts (|num| <= n! * n_users < 2^63 for
      // any real corpus) — with ONE double division at the end (6dp).
      val fct = (e: String) => s"""(CASE $e WHEN 0 THEN 1 WHEN 1 THEN 1
        WHEN 2 THEN 2 WHEN 3 THEN 6 WHEN 4 THEN 24 WHEN 5 THEN 120
        WHEN 6 THEN 720 WHEN 7 THEN 5040 WHEN 8 THEN 40320
        WHEN 9 THEN 362880 WHEN 10 THEN 3628800 WHEN 11 THEN 39916800
        WHEN 12 THEN 479001600 ELSE CAST(NULL AS BIGINT) END)"""
      val ev = Tables(s, dir).events
      val chans = ev.filter(col("event_type") =!= "purchase")
        .select(col("event_type")).distinct()
        .withColumn("bit",
          (row_number().over(Window.orderBy(col("event_type"))) - 1)
            .cast("long"))
      val wu = Window.partitionBy(col("user_id"))
      val per = ev.select(col("user_id"), col("event_type"),
          Tables.eventMicros(ev).as("tus"))
        .withColumn("fp",
          min(when(col("event_type") === "purchase", col("tus"))).over(wu))
        .join(broadcast(chans), Seq("event_type"), "left")
        .groupBy(col("user_id"))
        .agg(coalesce(bit_or(when(col("fp").isNull || col("tus") < col("fp"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))), lit(0L))
          .as("mask"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
      val em = per.groupBy(col("mask")).agg(sum(col("conv")).as("c"))
      val coal = chans.agg(count(lit(1)).as("nch"))
        .select(col("nch"), explode(sequence(lit(0L),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(nch AS INT)) - 1"))).as("S"))
      // v(S) = sum of exact-set conversions over subsets of S; the
      // left join keeps v(S) = 0 for coalitions no user's set matches
      val vAgg = coal.select(col("S"))
        .crossJoin(broadcast(em)).filter(expr("(mask & ~S) = 0"))
        .groupBy(col("S")).agg(sum(col("c")).as("vv"))
      val v = coal.join(broadcast(vAgg), Seq("S"), "left")
        .select(col("S"), col("nch"), coalesce(col("vv"), lit(0L)).as("v"))
      chans.crossJoin(broadcast(v))
        .filter(expr(
          "(S & shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))) = 0"))
        .withColumn("S2",
          expr("S | shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
        .join(broadcast(v.select(col("S").as("S2"), col("v").as("v2"))), "S2")
        .withColumn("s_size", expr("CAST(bit_count(S) AS BIGINT)"))
        .withColumn("w",
          expr(s"${fct("s_size")} * ${fct("(nch - s_size - 1)")}"))
        .groupBy(col("event_type"))
        .agg(sum(col("w") * (col("v2") - col("v"))).as("num"),
          max(col("nch")).as("nch"))
        .select(col("event_type").as("channel"),
          round(col("num").cast("double") / expr(fct("nch")), 6)
            .as("shapley_conversions"))
        .orderBy(col("channel"))
    },


    "q150_daily_trend" -> { (s, dir) =>
      // Per-type traffic TREND: ordinary-least-squares slope of daily
      // event counts over the day index, from the closed-form sums —
      // slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2). Every sum is an
      // exact integer (days and counts are longs), so the engine and
      // the oracle build IDENTICAL numerators/denominators and the
      // only float op is one final division + round, bit-equal on both
      // sides. Scale shape: the stream collapses to (type, day) cells
      // in one count agg, then ONE per-type rollup of five integer
      // sums — two shuffles total, no window, no driver math. The
      // exact integer num/den ride along in the output so a consumer
      // can re-derive the slope at any precision.
      val e = Tables(s, dir).events
      val daily = e.select(col("event_type"), Tables.eventMicros(e).as("tus"))
        .select(col("event_type"), expr("tus DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
      daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("day")).as("sx"), sum(col("cnt")).as("sy"),
          sum(col("day") * col("cnt")).as("sxy"),
          sum(col("day") * col("day")).as("sxx"))
        .select(col("event_type"), col("n_days"),
          (col("n_days") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
          (col("n_days") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
          round((col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n_days") * col("sxx") - col("sx") * col("sx")), 6).as("slope"))
        .orderBy(col("event_type"))
    },


    "q156_apply_changes" -> { (s, dir) =>
      // CDC MERGE (upsert + delete) of a change batch into a corpus
      // snapshot — the APPLY half of q125's snapshot-diff pair, and
      // the maintenance shape every incrementally-ingested corpus
      // runs: crawl N+1 lands as keyed changes, the snapshot is
      // rewritten keep-latest. The change batch derives
      // deterministically from the fixture (doc_id % 7 == 3 ->
      // re-edited text, % 7 == 5 -> delete, % 7 == 1 -> insert under
      // a fresh key) so both engines construct it identically. Merge
      // = union(snapshot@v0, changes@v1) -> per-key keep-highest-
      // version -> drop deletes: ONE hash shuffle on doc_id (the
      // window) + the presentation sort. At 100 TB both sides live
      // bucketed on doc_id so the merge is shuffle-free, and deletes
      // materialize as absence in the rewritten snapshot, not
      // tombstones. Streaming twin: DedupStreams.applyChanges folds
      // the same keep-latest contract into per-key state.
      val d = Tables(s, dir).documents
      val snap = d.select(col("doc_id"), col("text"), col("source"),
        lit(0L).as("ver"), lit("U").as("op"))
      val changes =
        d.filter(col("doc_id") % 7 === 3)
          .select(col("doc_id"), concat(lit("rev2: "), col("text")).as("text"),
            lit("editorial").as("source"), lit(1L).as("ver"), lit("U").as("op"))
          .unionAll(d.filter(col("doc_id") % 7 === 5)
            .select(col("doc_id"), lit(null).cast("string").as("text"),
              lit(null).cast("string").as("source"), lit(1L).as("ver"),
              lit("D").as("op")))
          .unionAll(d.filter(col("doc_id") % 7 === 1)
            .select((col("doc_id") + 100000000L).as("doc_id"),
              concat(lit("new: "), col("text")).as("text"),
              lit("ingest").as("source"), lit(1L).as("ver"), lit("U").as("op")))
      snap.unionAll(changes)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("ver").desc)))
        .filter(col("rk") === 1 && col("op") === "U")
        .select(col("doc_id"), md5(col("text").cast("binary")).as("content_hash"),
          col("source"))
        .orderBy(col("doc_id"))
    },


    "q159_mad_outliers" -> { (s, dir) =>
      // Robust per-type anomaly days by median absolute deviation —
      // the DISTRIBUTIONAL complement to q148's sequential CUSUM: MAD
      // is insensitive to the very outliers it hunts (a mean/stddev
      // z-score lets one spike inflate sigma and mask itself), and
      // everything stays exact-integer so both engines agree bit-wise.
      // Nearest-rank lower medians ((n+1) DIV 2 on the ascending
      // sorted list, q142's order-statistic contract), deviation
      // threshold 3.5 MAD as the integer cross-multiplication
      // dev*10 > 35*max(mad,1) — the max(_,1) floor keeps a
      // zero-MAD type (constant traffic) from flagging every epsilon
      // wiggle. Scale shape: the event stream collapses ONCE to
      // (type, day) cells; the two order-statistic aggregates and
      // their broadcast joins run on that bounded cell table
      // (|types| x |days|), so data volume only moves the first scan
      // — collect_list here is per-TYPE over days, bounded by the
      // calendar, never by events.
      val e = Tables(s, dir).events
      val cells = e.select(col("event_type"), Tables.eventMicros(e).as("tus"))
        .select(col("event_type"), expr("tus DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
      def rankMedian(df: DataFrame, v: String, out: String): DataFrame =
        df.groupBy(col("event_type"))
          .agg(sort_array(collect_list(col(v))).as("arr"), count(lit(1)).as("n"))
          .select(col("event_type"),
            element_at(col("arr"), expr("CAST((n + 1) DIV 2 AS INT)")).as(out))
      val med = rankMedian(cells, "cnt", "med")
      val devs = cells.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("cnt") - col("med")))
      val mad = rankMedian(devs, "dev", "mad")
      devs.join(broadcast(mad), "event_type")
        .filter(col("dev") * 10 > lit(35) * greatest(col("mad"), lit(1L)))
        .select(col("event_type"), col("day"), col("cnt"), col("med"),
          col("mad"), col("dev"))
        .orderBy(col("event_type"), col("day"))
    },


    "q140_rolling_active" -> { (s, dir) =>
      // DAU / trailing-7-day WAU / stickiness per day — the standard
      // engagement rollup, built the way it survives 100 TB: rolling
      // COUNT DISTINCT never runs as a window (distinct-over-window
      // needs the full user set per frame); instead each (user, day)
      // fact CONTRIBUTES to the 7 window-days it can activate
      // (map-only sequence explode), and WAU is a plain dedup+count on
      // (user, window_day). Everything after the first (user, day)
      // dedup is bounded by |users| x |days| x 7, not by events.
      // Output = activity days only (inner join of the two tiny aggs).
      val e = Tables(s, dir).events
      val ud = e.select(col("user_id"), Tables.eventMicros(e).as("tus"))
        .select(col("user_id"), expr("tus DIV 86400000000").as("day"))
        .distinct()
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("day"))
        .distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("wau"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
        .orderBy(col("day"))
    },


    "q138_cohort_retention" -> { (s, dir) =>
      // COHORT RETENTION matrix — the canonical product-analytics
      // rollup: users bucketed by first-seen day, activity counted at
      // (cohort, day-offset). Day arithmetic is exact integer division
      // on epoch-micros (no timezone, no double rounding at day
      // boundaries). ONE user shuffle: the first-seen window, the
      // (user, cohort, offset) dedup AND nothing else touch the event
      // stream — hash(user_id) satisfies the dedup's clustering (the
      // q85 subset rule), so dedup adds no exchange; the final
      // (cohort, offset) agg shuffles only deduped rows, bounded by
      // |users| x |days|. Output is the |days|^2-bounded matrix.
      val e = Tables(s, dir).events
      e.select(col("user_id"), Tables.eventMicros(e).as("tus"))
        .select(col("user_id"), expr("tus DIV 86400000000").as("day"))
        .withColumn("cohort_day",
          min(col("day")).over(Window.partitionBy(col("user_id"))))
        .select(col("user_id"), col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
        .distinct()
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },


    "q139_event_funnel" -> { (s, dir) =>
      // STRICT-SEQUENCE step funnel (view -> click -> purchase within
      // 7 days of the first view): each step's timestamp is the
      // earliest qualifying event strictly after the previous step —
      // three stacked conditional-min windows over the SAME
      // hash(user_id) partitioning (each references the previous
      // window's column; no re-exchange), then one row per user and a
      // global rollup to a single funnel row. The event stream
      // shuffles once; the rollup sees |users| rows. Completion is
      // judged on the earliest-qualifying chain (standard strict
      // semantics: a later click that would have converted does not
      // resurrect a funnel whose earliest click missed the window).
      val seven = 7L * 86400000000L
      funnelTimes(Tables(s, dir).events).agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("t2").isNotNull && col("t2") - col("t1") <= seven, 1L)
          .otherwise(0L)).as("n_click"),
        sum(when(col("t3").isNotNull && col("t3") - col("t1") <= seven, 1L)
          .otherwise(0L)).as("n_purchase"))
        .withColumn("view_to_click",
          round(col("n_click").cast("double") / col("n_view"), 6))
        .withColumn("click_to_purchase",
          round(col("n_purchase").cast("double") / col("n_click"), 6))
    },
  )

  def oracle: Map[String, String] = Map(
    "q206_kaplan_meier" ->
      """WITH u AS (SELECT o_custkey,
               min(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000)
                 AS fd,
               max(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000)
                 AS ld
             FROM orders GROUP BY o_custkey),
          m AS (SELECT max(ld) AS maxday FROM u),
          pu AS (SELECT ld - fd + 1 AS duration,
                  ld < (SELECT maxday FROM m) - 90 AS churn FROM u),
          bt AS (SELECT duration,
                  CAST(sum(CASE WHEN churn THEN 1 ELSE 0 END) AS BIGINT)
                    AS d_events,
                  CAST(count(*) AS BIGINT) AS leaving
                 FROM pu GROUP BY duration),
          r AS (SELECT duration, d_events,
                 CAST(sum(leaving) OVER (ORDER BY duration
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS n_risk
                FROM bt),
          t AS (SELECT duration, n_risk, d_events,
                 CAST(n_risk - d_events AS DOUBLE) / n_risk AS term
                FROM r WHERE d_events > 0),
          k AS (SELECT duration, n_risk, d_events,
                 CASE WHEN term > 0 THEN ln(term) ELSE 0 END AS lnterm,
                 CASE WHEN term <= 0 THEN 1 ELSE 0 END AS zf
                FROM t)
          SELECT duration, n_risk, d_events,
            CASE WHEN max(zf) OVER (ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
              THEN 0.0
              ELSE round(exp(sum(lnterm) OVER (ORDER BY duration
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
            END AS survival
          FROM k ORDER BY duration""",

    "q217_revenue_autocorr" ->
      """WITH daily AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                 AS day,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS rev
             FROM events WHERE event_type = 'purchase' GROUP BY 1),
          lags AS (SELECT CAST(unnest([1, 7]) AS BIGINT) AS lag),
          pr AS (SELECT lag, a.rev AS x, b.rev AS y
                 FROM daily a, lags
                 JOIN daily b ON b.day = a.day - lag),
          g AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
                 sum(CAST(x AS DOUBLE)) AS sx, sum(CAST(y AS DOUBLE)) AS sy,
                 sum(CAST(x AS DOUBLE) * y) AS sxy,
                 sum(CAST(x AS DOUBLE) * x) AS sxx,
                 sum(CAST(y AS DOUBLE) * y) AS syy
                FROM pr GROUP BY lag)
          SELECT lag, n_pairs,
            round((n_pairs * sxy - sx * sy) /
              (sqrt(n_pairs * sxx - sx * sx) *
               sqrt(n_pairs * syy - sy * sy)), 6) AS r
          FROM g ORDER BY lag""",

    "q215_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey,
               CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
             FROM orders),
          fy AS (SELECT o_custkey, min(yr) AS cohort_year FROM o
                 GROUP BY o_custkey),
          cs AS (SELECT cohort_year, CAST(count(*) AS BIGINT) AS n_customers
                 FROM fy GROUP BY cohort_year),
          ra AS (SELECT cohort_year, yr - cohort_year AS age,
                  CAST(sum(cents) AS BIGINT) AS rev_cents
                 FROM o JOIN fy USING (o_custkey)
                 GROUP BY cohort_year, yr - cohort_year),
          cm AS (SELECT cohort_year, age, rev_cents,
                  CAST(sum(rev_cents) OVER (PARTITION BY cohort_year
                    ORDER BY age ROWS BETWEEN UNBOUNDED PRECEDING AND
                    CURRENT ROW) AS BIGINT) AS cum_rev_cents
                 FROM ra)
          SELECT cohort_year, age, n_customers, rev_cents, cum_rev_cents,
            round(CAST(cum_rev_cents AS DOUBLE) / n_customers, 6)
              AS avg_cum_ltv_cents
          FROM cm JOIN cs USING (cohort_year)
          ORDER BY cohort_year, age""",

    "q209_lorenz_curve" ->
      """WITH per AS (SELECT user_id,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
             FROM events WHERE event_type = 'purchase' GROUP BY user_id),
          dq AS (SELECT cents, user_id,
                  CAST(ntile(10) OVER (ORDER BY cents, user_id) AS BIGINT)
                    AS decile
                 FROM per),
          g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(cents) AS BIGINT) AS decile_cents
                FROM dq GROUP BY decile)
          SELECT decile, n_users, decile_cents,
            round(CAST(sum(decile_cents) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
              CAST(sum(decile_cents) OVER () AS DOUBLE), 6) AS cum_share
          FROM g ORDER BY decile""",

    "q184_ewma_anomaly" ->
      """WITH dc AS (SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
               count(*) AS cnt FROM events GROUP BY 1, 2),
          j AS (SELECT a.event_type, a.day, a.cnt,
                 count(*) AS n_prior,
                 round(0.25 * sum(b.cnt * power(0.75, a.day - b.day - 1)), 6)
                   AS ewma_prev
                FROM dc a JOIN dc b
                  ON a.event_type = b.event_type AND b.day < a.day
                GROUP BY 1, 2, 3)
          SELECT event_type, day, cnt, ewma_prev,
                 round(cnt / ewma_prev, 6) AS ratio,
                 cnt > 2.0 * ewma_prev AS flagged
          FROM j WHERE n_prior >= 5 ORDER BY event_type, day""",

    "q185_decile_lift" ->
      s"""WITH $dsirScoredCte,
          dd AS (SELECT *, CAST(ntile(10) OVER
                   (ORDER BY score DESC, doc_id) AS BIGINT) AS decile FROM sc),
          g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
                FROM dd GROUP BY decile),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
                 CAST(sum(n_pos) AS BIGINT) AS tot_pos FROM g)
          SELECT decile, n, n_pos,
                 round(CAST(n_pos AS DOUBLE) / n, 6) AS pos_rate,
                 round(CAST(n_pos * tot AS DOUBLE) / (n * tot_pos), 6) AS lift,
                 round(CAST(sum(n_pos) OVER (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) / tot_pos, 6) AS cum_capture
          FROM g CROSS JOIN t ORDER BY decile""",

    "q186_calibration_bins" ->
      s"""WITH $dsirScoredCte,
          pp AS (SELECT y, 1.0 / (1.0 + exp(-8.0 * score)) AS p FROM sc),
          bb AS (SELECT y, p, least(CAST(floor(p * 10) AS BIGINT), 9) AS bin
                 FROM pp)
          SELECT bin, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                 round(avg(p), 6) AS avg_p,
                 round(CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*), 6) AS emp_rate,
                 round(avg(power(p - CASE WHEN y THEN 1.0 ELSE 0.0 END, 2)), 6)
                   AS brier
          FROM bb GROUP BY bin ORDER BY bin""",

    "q188_gini_concentration" ->
      """WITH per AS (SELECT user_id,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
             FROM events WHERE event_type = 'purchase' GROUP BY user_id),
          r AS (SELECT cents,
                 CAST(row_number() OVER (ORDER BY cents, user_id) AS BIGINT) AS i,
                 CAST(row_number() OVER (ORDER BY cents DESC, user_id) AS BIGINT) AS j,
                 CAST(count(*) OVER () AS BIGINT) AS n
                FROM per),
          g AS (SELECT max(n) AS n_users,
                 CAST(sum(cents) AS BIGINT) AS total_cents,
                 CAST(sum(i * cents) AS BIGINT) AS iw,
                 CAST(sum(CASE WHEN j * 100 <= n + 99 THEN cents ELSE 0 END)
                   AS BIGINT) AS top1,
                 CAST(sum(CASE WHEN j * 10 <= n + 9 THEN cents ELSE 0 END)
                   AS BIGINT) AS top10
                FROM r)
          SELECT n_users, total_cents,
                 round(CAST(2 * iw - (n_users + 1) * total_cents AS DOUBLE)
                   / CAST(n_users * total_cents AS DOUBLE), 6) AS gini,
                 round(CAST(top1 AS DOUBLE) / total_cents, 6) AS top1_share,
                 round(CAST(top10 AS DOUBLE) / total_cents, 6) AS top10_share
          FROM g""",

    "q199_scd2_intervals" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS od, o_orderpriority
             FROM orders),
          l AS (SELECT *, lag(o_orderpriority) OVER
                 (PARTITION BY o_custkey ORDER BY od, o_orderkey) AS prev
                FROM o),
          c AS (SELECT *, CASE WHEN prev IS NULL OR prev <> o_orderpriority
                 THEN 1 ELSE 0 END AS chg FROM l),
          r AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY o_custkey
                 ORDER BY od, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS run_id FROM c),
          iv AS (SELECT o_custkey AS custkey, run_id,
                  min(o_orderpriority) AS priority,
                  min(od) AS valid_from,
                  CAST(count(*) AS BIGINT) AS n_orders
                 FROM r GROUP BY 1, 2)
          SELECT custkey, run_id, priority, valid_from,
                 lead(valid_from) OVER (PARTITION BY custkey ORDER BY run_id)
                   AS valid_to, n_orders
          FROM iv ORDER BY custkey, run_id""",

    "q200_wow_revenue" ->
      """WITH f AS (SELECT r_name AS region,
               (CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 7 AS week,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
             FROM orders
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey),
          g AS (SELECT region, CAST(week AS BIGINT) AS week,
                 CAST(sum(cents) AS BIGINT) AS cents
                FROM f GROUP BY 1, 2),
          l AS (SELECT *, lag(cents) OVER (PARTITION BY region ORDER BY week)
                 AS prev_cents FROM g)
          SELECT region, week, cents, prev_cents,
                 CASE WHEN prev_cents IS NOT NULL AND prev_cents <> 0
                   THEN round(CAST(cents - prev_cents AS DOUBLE) / prev_cents, 6)
                 END AS wow_pct
          FROM l ORDER BY region, week""",

    "q192_winsorized_stats" ->
      """WITH b AS (SELECT event_type, event_id,
               CAST(floor(value * 100) AS BIGINT) AS c FROM events),
          w AS (SELECT event_type, c,
                 CAST(row_number() OVER (PARTITION BY event_type
                   ORDER BY c, event_id) AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
                FROM b),
          cut AS (SELECT event_type,
                 max(CASE WHEN 20 * rn <= n + 19 THEN c END) AS lo,
                 max(CASE WHEN 20 * rn <= 19 * n + 19 THEN c END) AS hi
                FROM w GROUP BY event_type)
          SELECT w.event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(max(cut.lo) AS BIGINT) AS p05_cents,
                 CAST(max(cut.hi) AS BIGINT) AS p95_cents,
                 round(CAST(sum(w.c) AS DOUBLE) / count(*), 6) AS raw_mean,
                 round(CAST(sum(greatest(least(w.c, cut.hi), cut.lo)) AS DOUBLE)
                   / count(*), 6) AS win_mean,
                 CAST(sum(CASE WHEN w.c < cut.lo OR w.c > cut.hi
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
          FROM w JOIN cut USING (event_type)
          GROUP BY w.event_type ORDER BY w.event_type""",

    "q193_rfm_segments" ->
      """WITH per AS (SELECT user_id,
               max(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS last_day,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
             FROM events WHERE event_type = 'purchase' GROUP BY user_id),
          sc AS (SELECT cents,
                 CAST(ntile(4) OVER (ORDER BY last_day, user_id) AS BIGINT) AS r_score,
                 CAST(ntile(4) OVER (ORDER BY freq, user_id) AS BIGINT) AS f_score,
                 CAST(ntile(4) OVER (ORDER BY cents, user_id) AS BIGINT) AS m_score
                FROM per)
          SELECT r_score, f_score, m_score,
                 CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(cents) AS BIGINT) AS total_cents,
                 round(CAST(sum(cents) AS DOUBLE) / count(*), 6) AS avg_cents
          FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q179_props_variant" ->
      """WITH k AS (SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             FROM events)
          SELECT event_type, k // 10 AS bucket, count(*) AS n,
            CAST(sum(k) AS BIGINT) AS sum_k
          FROM k WHERE k IS NOT NULL
          GROUP BY 1, 2 ORDER BY event_type, bucket""",

    "q180_share_of_total" ->
      """WITH g AS (SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
             FROM lineitem GROUP BY 1, 2)
          SELECT l_returnflag, l_linestatus, revenue_cents,
            round(CAST(revenue_cents AS DOUBLE) /
              CAST(CAST(sum(revenue_cents)
                OVER (PARTITION BY l_returnflag) AS BIGINT) AS DOUBLE), 6)
              AS share_of_flag,
            round(CAST(revenue_cents AS DOUBLE) /
              CAST(CAST(sum(revenue_cents) OVER () AS BIGINT) AS DOUBLE), 6)
              AS share_of_total
          FROM g ORDER BY l_returnflag, l_linestatus""",

    "q181_session_paths" ->
      """WITH e AS (SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS tus, event_type FROM events),
          s1 AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
                   OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
                 FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
          s2 AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
                   ORDER BY tus, event_id) AS BIGINT) AS session_seq FROM s1),
          s3 AS (SELECT *, row_number() OVER (PARTITION BY user_id, session_seq
                   ORDER BY tus, event_id) AS rn FROM s2),
          p AS (SELECT user_id, session_seq,
                 string_agg(event_type, '->' ORDER BY rn) AS path
                FROM s3 WHERE rn <= 8 GROUP BY 1, 2),
          c AS (SELECT path, count(*) AS n_sessions FROM p GROUP BY path),
          t AS (SELECT *, CAST(row_number() OVER
                  (ORDER BY n_sessions DESC, path) AS BIGINT) AS rk FROM c)
          SELECT rk, path, n_sessions FROM t WHERE rk <= 10 ORDER BY rk""",

    "q176_benford_audit" ->
      """WITH c AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                      AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                 count(*) AS n
               FROM orders GROUP BY 1),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c)
          SELECT digit, n,
            round(CAST(nt AS DOUBLE)
              * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)), 3) AS expected_n,
            round(pow(CAST(n AS DOUBLE) - CAST(nt AS DOUBLE)
                * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)), 2)
              / (CAST(nt AS DOUBLE)
                * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))), 4)
              AS chi2_contrib
          FROM c CROSS JOIN t ORDER BY digit""",

    "q172_basket_rules" ->
      """WITH b AS (SELECT DISTINCT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
               event_type FROM events),
          nb AS (SELECT count(*) AS n_baskets
                 FROM (SELECT DISTINCT user_id, day FROM b)),
          it AS (SELECT event_type AS a, count(*) AS n_a FROM b GROUP BY 1),
          pr AS (SELECT x.event_type AS a, y.event_type AS b,
                   count(*) AS n_ab
                 FROM b x JOIN b y ON x.user_id = y.user_id
                   AND x.day = y.day AND x.event_type <> y.event_type
                 GROUP BY 1, 2)
          SELECT pr.a, pr.b, n_ab, ia.n_a AS n_a, ib.n_a AS n_b,
            round(CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6) AS support,
            round(CAST(n_ab AS DOUBLE) / CAST(ia.n_a AS DOUBLE), 6) AS confidence,
            round(CAST(n_baskets AS DOUBLE) * CAST(n_ab AS DOUBLE)
              / (CAST(ia.n_a AS DOUBLE) * CAST(ib.n_a AS DOUBLE)), 6) AS lift
          FROM pr JOIN it ia ON ia.a = pr.a JOIN it ib ON ib.a = pr.b
          CROSS JOIN nb ORDER BY pr.a, pr.b""",

    "q168_seasonal_decompose" ->
      """WITH cells AS (SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
               count(*) AS cnt
             FROM events GROUP BY 1, 2),
          t AS (SELECT *,
                 CASE WHEN count(*) OVER w7 = 7
                      THEN sum(cnt) OVER w7 END AS trend7
                FROM cells
                WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                  RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING))
          SELECT event_type, (day + 4) % 7 AS dow,
            count(*) AS n_days,
            round(CAST(CAST(sum(7 * cnt - trend7) AS BIGINT) AS DOUBLE)
              / (7.0 * count(*)), 4) AS seasonal
          FROM t WHERE trend7 IS NOT NULL
          GROUP BY 1, 2 ORDER BY event_type, dow""",

    "q165_pivot_matrix" ->
      """WITH e AS (SELECT
               (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 AS dow,
               event_type FROM events)
          SELECT dow,
            count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
            count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
            count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
            count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
            count(CASE WHEN event_type = 'view' THEN 1 END) AS view
          FROM e GROUP BY dow ORDER BY dow""",

    "q166_corr_matrix" ->
      """WITH v AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
               CAST(floor(l_extendedprice) AS BIGINT) AS p,
               CAST(floor(l_discount * 100) AS BIGINT) AS d,
               CAST(floor(l_tax * 100) AS BIGINT) AS t FROM lineitem),
          m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) AS s_q,
                 CAST(CAST(sum(p) AS BIGINT) AS DOUBLE) AS s_p,
                 CAST(CAST(sum(d) AS BIGINT) AS DOUBLE) AS s_d,
                 CAST(CAST(sum(t) AS BIGINT) AS DOUBLE) AS s_t,
                 CAST(CAST(sum(q*q) AS BIGINT) AS DOUBLE) AS ss_q,
                 CAST(CAST(sum(p*p) AS BIGINT) AS DOUBLE) AS ss_p,
                 CAST(CAST(sum(d*d) AS BIGINT) AS DOUBLE) AS ss_d,
                 CAST(CAST(sum(t*t) AS BIGINT) AS DOUBLE) AS ss_t,
                 CAST(CAST(sum(q*p) AS BIGINT) AS DOUBLE) AS sp_q_p,
                 CAST(CAST(sum(q*d) AS BIGINT) AS DOUBLE) AS sp_q_d,
                 CAST(CAST(sum(q*t) AS BIGINT) AS DOUBLE) AS sp_q_t,
                 CAST(CAST(sum(p*d) AS BIGINT) AS DOUBLE) AS sp_p_d,
                 CAST(CAST(sum(p*t) AS BIGINT) AS DOUBLE) AS sp_p_t,
                 CAST(CAST(sum(d*t) AS BIGINT) AS DOUBLE) AS sp_d_t
                FROM v)
          SELECT var_a, var_b,
            round((n * sp - s_a * s_b) /
              (sqrt(n * ss_a - s_a * s_a) * sqrt(n * ss_b - s_b * s_b)), 6)
              AS corr
          FROM (
            SELECT 'q' AS var_a, 'p' AS var_b, sp_q_p AS sp, s_q AS s_a, s_p AS s_b, ss_q AS ss_a, ss_p AS ss_b, n FROM m
            UNION ALL SELECT 'q', 'd', sp_q_d, s_q, s_d, ss_q, ss_d, n FROM m
            UNION ALL SELECT 'q', 't', sp_q_t, s_q, s_t, ss_q, ss_t, n FROM m
            UNION ALL SELECT 'p', 'd', sp_p_d, s_p, s_d, ss_p, ss_d, n FROM m
            UNION ALL SELECT 'p', 't', sp_p_t, s_p, s_t, ss_p, ss_t, n FROM m
            UNION ALL SELECT 'd', 't', sp_d_t, s_d, s_t, ss_d, ss_t, n FROM m)
          ORDER BY var_a, var_b""",

    "q162_skyline" ->
      """WITH o AS (SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
               epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS date_us FROM orders),
          w AS (SELECT *,
                 max(date_us) OVER (ORDER BY price_c DESC
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hi,
                 max(date_us) OVER (PARTITION BY price_c) AS eqm
                FROM o)
          SELECT o_orderkey, price_c, date_us FROM w
          WHERE (hi IS NULL OR hi < date_us) AND date_us = eqm
          ORDER BY price_c DESC, o_orderkey""",

    "q159_mad_outliers" ->
      """WITH cells AS (SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
               count(*) AS cnt FROM events GROUP BY 1, 2),
          med AS (SELECT event_type,
                   (list(cnt ORDER BY cnt))[CAST((count(*) + 1) // 2 AS INT)] AS med
                  FROM cells GROUP BY event_type),
          devs AS (SELECT c.event_type, c.day, c.cnt, m.med,
                    abs(c.cnt - m.med) AS dev
                   FROM cells c JOIN med m USING (event_type)),
          mad AS (SELECT event_type,
                   (list(dev ORDER BY dev))[CAST((count(*) + 1) // 2 AS INT)] AS mad
                  FROM devs GROUP BY event_type)
          SELECT d.event_type, d.day, d.cnt, d.med, m.mad, d.dev
          FROM devs d JOIN mad m USING (event_type)
          WHERE d.dev * 10 > 35 * greatest(m.mad, 1)
          ORDER BY d.event_type, d.day""",

    "q156_apply_changes" ->
      """WITH snap AS (SELECT doc_id, text, source, 0 AS ver, 'U' AS op
               FROM documents),
          ch AS (SELECT doc_id, 'rev2: ' || text AS text,
                   'editorial' AS source, 1 AS ver, 'U' AS op
                 FROM documents WHERE doc_id % 7 = 3
                 UNION ALL
                 SELECT doc_id, NULL, NULL, 1, 'D'
                 FROM documents WHERE doc_id % 7 = 5
                 UNION ALL
                 SELECT doc_id + 100000000, 'new: ' || text, 'ingest', 1, 'U'
                 FROM documents WHERE doc_id % 7 = 1),
          u AS (SELECT *, row_number() OVER
                  (PARTITION BY doc_id ORDER BY ver DESC) AS rk
                FROM (SELECT * FROM snap UNION ALL SELECT * FROM ch))
          SELECT doc_id, md5(text) AS content_hash, source
          FROM u WHERE rk = 1 AND op = 'U' ORDER BY doc_id""",

    "q85_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS tus, value FROM events),
         f AS (SELECT user_id, event_id, tus, value,
                 CASE WHEN lag(tus) OVER w IS NULL
                        OR tus - lag(tus) OVER w > 1800000000
                      THEN 1 ELSE 0 END AS new_sess
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
         s AS (SELECT user_id, tus, value,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
               FROM f)
         SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           min(tus) AS session_start_us, max(tus) AS session_end_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""",


    // the salt is invisible to results by construction — the oracle is
    // the PLAIN join
    "q145_salted_join" ->
      """SELECT c_mktsegment, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment, event_type
         ORDER BY c_mktsegment, event_type""",


    // Funnel latency rebuilt: the shared funnel CTEs, converted-user
    // latencies, quantile_cont percentiles.
    "q142_funnel_latency" -> (funnelCteSql +
      """,
          l AS (SELECT
                  CASE WHEN t2 IS NOT NULL AND t2 - t1 <= 604800000000
                       THEN t2 - t1 END AS cl,
                  CASE WHEN t3 IS NOT NULL AND t3 - t1 <= 604800000000
                       THEN t3 - t1 END AS pl
                FROM u),
          a AS (SELECT list_sort(list(cl) FILTER (cl IS NOT NULL)) AS cls,
                  list_sort(list(pl) FILTER (pl IS NOT NULL)) AS pls FROM l)
          SELECT CAST(len(cls) AS BIGINT) AS n_click_conv,
            cls[CAST((len(cls) * 1 + 1) // 2 AS INT)] AS click_p50_us,
            cls[CAST((len(cls) * 9 + 9) // 10 AS INT)] AS click_p90_us,
            CAST(len(pls) AS BIGINT) AS n_purchase_conv,
            pls[CAST((len(pls) * 1 + 1) // 2 AS INT)] AS purchase_p50_us,
            pls[CAST((len(pls) * 9 + 9) // 10 AS INT)] AS purchase_p90_us
          FROM a"""),


    // Transition matrix rebuilt: the same lead window and pair
    // counts, marginals as a window over the pair table.
    "q141_event_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
          p AS (SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY tus, event_id) AS to_type
                FROM e),
          c AS (SELECT from_type, to_type, count(*) AS n FROM p
                WHERE to_type IS NOT NULL GROUP BY 1, 2)
          SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
            round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS p
          FROM c ORDER BY from_type, to_type""",


    // Rolling actives rebuilt: the same contribution explode and
    // double dedup.
    // Page-Hinkley rebuilt: the same (type, day) integer revenue
    // cells, the identical running-mean / dev-cumsum / running-min
    // double spellings in day order, the same unrounded-lambda alarm.
    "q241_page_hinkley" ->
      """WITH daily AS (SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS x
              FROM events GROUP BY 1, 2),
          m AS (SELECT event_type, day, x,
                 CAST(sum(x) OVER w AS DOUBLE) / (count(*) OVER w) AS mean_t
                FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          u AS (SELECT *, sum(CAST(x AS DOUBLE) - mean_t) OVER w AS u
                FROM m WINDOW w AS (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          p AS (SELECT *, u - min(u) OVER w AS ph
                FROM u WINDOW w AS (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          SELECT event_type, day, x, round(mean_t, 6) AS running_mean,
            round(ph, 6) AS ph_stat, ph > 100000.0 AS alarm
          FROM p ORDER BY event_type, day""",


    // CUSUM via the closed window form: S = cum - least(runmin(cum), 0).
    // DuckDB's window sums widen to HUGEINT mid-CTE (exact); outputs
    // are CAST back to BIGINT.
    "q148_cusum_anomaly" ->
      """WITH dc AS (SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
               count(*) AS cnt FROM events GROUP BY 1, 2),
          m AS (SELECT event_type, sum(cnt) // count(*) AS mu
                FROM dc GROUP BY 1),
          c AS (SELECT dc.event_type, day, mu,
                 sum(cnt - mu) OVER (PARTITION BY dc.event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM dc JOIN m USING (event_type)),
          s AS (SELECT event_type, day, mu,
                 cum - least(min(cum) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS s
                FROM c),
          p AS (SELECT event_type, max(s) AS peak FROM s GROUP BY 1)
          SELECT s.event_type, CAST(max(s.s) AS BIGINT) AS peak_cusum,
                 min(day) AS peak_day, CAST(max(mu) AS BIGINT) AS mean_daily
          FROM s JOIN p ON s.event_type = p.event_type AND s.s = p.peak
          GROUP BY s.event_type ORDER BY s.event_type""",


    // the identical coalition construction: bit order = alphabetical
    // channel order, v(S) via the same left join (empty coalitions keep
    // v = 0), factorial weights from the same literal table, one double
    // division at the end
    "q225_shapley_attribution" ->
      """WITH ch AS (SELECT event_type,
               CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT) AS bit
             FROM (SELECT DISTINCT event_type FROM events
                   WHERE event_type <> 'purchase')),
          e2 AS (SELECT user_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                   min(CASE WHEN event_type = 'purchase'
                     THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
                     OVER (PARTITION BY user_id) AS fp
                 FROM events),
          per AS (SELECT user_id,
                   coalesce(bit_or(CASE WHEN ch.bit IS NOT NULL
                       AND (fp IS NULL OR tus < fp)
                     THEN (1::BIGINT << CAST(ch.bit AS INT)) END), 0) AS mask,
                   max(CASE WHEN e2.event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
                  FROM e2 LEFT JOIN ch ON e2.event_type = ch.event_type
                  GROUP BY user_id),
          em AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS c FROM per GROUP BY mask),
          n AS (SELECT CAST(count(*) AS BIGINT) AS nch FROM ch),
          coal AS (SELECT nch, unnest(range(0, (1::BIGINT << CAST(nch AS INT)))) AS S
                   FROM n),
          va AS (SELECT coal.S, CAST(sum(em.c) AS BIGINT) AS vv
                 FROM coal JOIN em ON (em.mask & ~coal.S) = 0 GROUP BY coal.S),
          v AS (SELECT coal.S, coal.nch, coalesce(va.vv, 0) AS v
                FROM coal LEFT JOIN va ON va.S = coal.S),
          f(x, fx) AS (VALUES (0, 1), (1, 1), (2, 2), (3, 6), (4, 24),
            (5, 120), (6, 720), (7, 5040), (8, 40320), (9, 362880),
            (10, 3628800), (11, 39916800), (12, 479001600)),
          m AS (SELECT ch.event_type, v.S, v.nch, v.v, v2.v AS v2,
                 CAST(bit_count(v.S) AS BIGINT) AS s_size
                FROM ch JOIN v ON (v.S & (1::BIGINT << CAST(ch.bit AS INT))) = 0
                JOIN v v2 ON v2.S = (v.S | (1::BIGINT << CAST(ch.bit AS INT)))),
          t AS (SELECT event_type,
                 CAST(sum(CAST(fa.fx AS BIGINT) * fb.fx * (v2 - v)) AS BIGINT) AS num,
                 max(nch) AS nch
                FROM m JOIN f fa ON fa.x = m.s_size
                JOIN f fb ON fb.x = m.nch - m.s_size - 1
                GROUP BY event_type)
          SELECT event_type AS channel,
            round(CAST(num AS DOUBLE) /
              (SELECT fx FROM f WHERE x = t.nch), 6) AS shapley_conversions
          FROM t ORDER BY channel""",

    "q149_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
               epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
          lv AS (SELECT *, max(CASE WHEN event_type = 'view' THEN tus END)
                   OVER (PARTITION BY user_id ORDER BY tus, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view
                FROM e),
          p AS (SELECT tus // 86400000000 AS day,
                 (last_view IS NOT NULL AND tus - last_view <= 604800000000) AS attr,
                 CAST(floor(value * 100) AS BIGINT) AS cents
                FROM lv WHERE event_type = 'purchase')
          SELECT day, CAST(count(*) AS BIGINT) AS n_purchases,
                 CAST(sum(CASE WHEN attr THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
                 CAST(sum(CASE WHEN attr THEN cents ELSE 0 END) AS BIGINT) AS attributed_cents
          FROM p GROUP BY day ORDER BY day""",


    // OLS slope from integer sums; DuckDB's sums widen to HUGEINT
    // (exact) mid-CTE, outputs CAST to BIGINT; the single float op
    // (division) runs on identical integers on both engines.
    "q150_daily_trend" ->
      """WITH dc AS (SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
               count(*) AS cnt FROM events GROUP BY 1, 2),
          a AS (SELECT event_type, count(*) AS n, sum(day) AS sx,
                 sum(cnt) AS sy, sum(day * cnt) AS sxy,
                 sum(day * day) AS sxx
                FROM dc GROUP BY 1)
          SELECT event_type, CAST(n AS BIGINT) AS n_days,
                 CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
                 CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
                 round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS BIGINT), 6) AS slope
          FROM a ORDER BY event_type""",


    "q140_rolling_active" ->
      """WITH ud AS (SELECT DISTINCT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
          dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
          wau AS (SELECT wday AS day, count(DISTINCT user_id) AS wau
                  FROM (SELECT user_id, day + k AS wday FROM ud, range(0, 7) t(k))
                  GROUP BY wday)
          SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
            round(d.dau * 1.0 / w.wau, 6) AS stickiness
          FROM dau d JOIN wau w USING (day) ORDER BY day""",


    // Cohort retention rebuilt: integer day division on epoch-micros,
    // first-seen window, distinct activity cells, matrix count.
    "q138_cohort_retention" ->
      """WITH e AS (SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
          c AS (SELECT user_id, day,
                 min(day) OVER (PARTITION BY user_id) AS cohort_day FROM e),
          d AS (SELECT DISTINCT user_id, cohort_day, day - cohort_day AS day_offset FROM c)
          SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_users
          FROM d GROUP BY 1, 2 ORDER BY 1, 2""",


    // Funnel rebuilt: the same three stacked conditional-min windows
    // (each layered in its own select so it can reference the
    // previous step), per-user rollup, single funnel row.
    "q139_event_funnel" -> (funnelCteSql +
      """,
          f AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                  CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                  CAST(sum(CASE WHEN t2 IS NOT NULL AND t2 - t1 <= 604800000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                  CAST(sum(CASE WHEN t3 IS NOT NULL AND t3 - t1 <= 604800000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
                FROM u)
          SELECT n_users, n_view, n_click, n_purchase,
            round(n_click * 1.0 / n_view, 6) AS view_to_click,
            round(n_purchase * 1.0 / n_click, 6) AS click_to_purchase
          FROM f"""),
  )
}
