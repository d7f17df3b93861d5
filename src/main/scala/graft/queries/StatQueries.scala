package graft.queries

import graft.Tables
import graft.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment-statistics family over the events table: A/B readouts,
  * CUPED, bootstrap CIs, diff-in-diff, Mann-Whitney, SPRT,
  * post-stratified ATE, MDE/power.
  *
  * Split from BiQueries.scala (round 13 housekeeping, same rule as the
  * round-12 Pipeline split): query/oracle entries only, moved verbatim
  * — every shared helper, memo cache and SQL CTE stays in [[Pipeline]]
  * so behavior and plan shapes are byte-identical. */
private[graft] object StatQueries {
  import Pipeline._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q231_mann_kendall" -> { (s, dir) =>
      // Mann-Kendall trend test + Theil-Sen slope over daily purchase
      // revenue — the nonparametric "is this metric actually trending"
      // readout (Mann 1945, Kendall 1975; Sen 1968 for the slope): S =
      // sum over day pairs of sign(rev_j - rev_i), the tie-corrected
      // variance var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18,
      // the continuity-corrected z, Kendall's tau = S / (n(n-1)/2),
      // and the Theil-Sen slope = median of the n(n-1)/2 pairwise
      // slopes (cents/day; median = mean of the two middle order
      // statistics, exact via row_number over the pair table). Counts
      // and S are exact integers; every double derives from them with
      // one fixed spelling. Scale shape: the event stream collapses to
      // |days| cells in ONE map-side-combined agg; the pair "join" is
      // the calendar-bounded daily table crossed against its own
      // broadcast under d1 < d2 (q184's bounded-pair posture,
      // |days|^2/2 rows, SF-invariant), and every window runs on that
      // bounded pair table — corpus rows never move twice.
      val e = Tables(s, dir).events
      val daily = e.filter(col("event_type") === "purchase")
        .select(Tables.eventMicros(e).as("tus"),
          floor(col("value") * 100).cast("long").as("c"))
        .select(expr("tus DIV 86400000000").as("day"), col("c"))
        .groupBy(col("day")).agg(sum(col("c")).as("rev"))
      val pairs = daily.select(col("day").as("d1"), col("rev").as("r1"))
        .join(broadcast(daily.select(col("day").as("d2"), col("rev").as("r2"))),
          col("d1") < col("d2"))
        .select(col("d1"), col("d2"),
          when(col("r2") > col("r1"), 1L)
            .when(col("r2") < col("r1"), -1L).otherwise(0L).as("sg"),
          ((col("r2") - col("r1")).cast("double") / (col("d2") - col("d1")))
            .as("slope"))
      val ranked = pairs.withColumn("rn",
        row_number().over(Window.orderBy(col("slope"), col("d1"), col("d2")))
          .cast("long"))
      val nrow = daily.agg(count(lit(1)).as("nd"))
      val ties = daily.groupBy(col("rev")).agg(count(lit(1)).as("t"))
        .agg(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L))
          .as("sum_t"))
      val sAgg = ranked.agg(sum(col("sg")).as("s_stat"), count(lit(1)).as("m"))
      val med = ranked.crossJoin(broadcast(nrow))
        .filter(col("rn") === expr("(nd * (nd - 1) DIV 2 + 1) DIV 2") ||
          col("rn") === expr("(nd * (nd - 1) DIV 2 + 2) DIV 2"))
        .agg(avg(col("slope")).as("sen_slope"))
      sAgg.crossJoin(broadcast(nrow)).crossJoin(broadcast(ties))
        .crossJoin(broadcast(med))
        .withColumn("var_s_raw",
          expr("CAST(nd * (nd - 1) * (2 * nd + 5) - sum_t AS DOUBLE) / 18.0"))
        .select(col("nd").as("n_days"), col("s_stat"),
          round(col("s_stat").cast("double") / col("m"), 6).as("tau"),
          round(col("var_s_raw"), 6).as("var_s"),
          round(when(col("s_stat") > 0,
              (col("s_stat").cast("double") - 1) / sqrt(col("var_s_raw")))
            .when(col("s_stat") < 0,
              (col("s_stat").cast("double") + 1) / sqrt(col("var_s_raw")))
            .otherwise(lit(0.0)), 6).as("z"),
          round(col("sen_slope"), 6).as("sen_slope"))
    },


    "q232_fdr_bh" -> { (s, dir) =>
      // Multiple-testing control across the experiment's metric family
      // — Welch z per event_type between the "ab:" arms, normal
      // p-values via the Zelen-Severo 26.2.17 polynomial (identical
      // literals both engines; neither has an inverse normal CDF), and
      // Benjamini-Hochberg FDR at alpha = 0.05: rank the m metrics by
      // p ascending, find the largest rank k with p(k) <= alpha*k/m,
      // reject ranks <= k. The readout that stops "test 5 metrics,
      // ship the one that hit p<0.05" false discoveries. All moment
      // sums are exact integer cents (q219's pattern); every double
      // derives from them with one fixed spelling, and the BH
      // comparison runs on UNROUNDED doubles computed identically in
      // both engines. Scale shape: the event stream collapses to
      // |types| x 2 moment cells in ONE map-side-combined agg; the
      // ranking windows run on the |types|-row metric table.
      val arm = pmod(md5_lower64(concat(lit("ab:"),
        col("user_id").cast("string")).cast("binary")), lit(2L))
      val e = Tables(s, dir).events
      val m = e.select(col("event_type"), arm.as("arm"),
          floor(col("value") * 100).cast("long").as("c"))
        .groupBy(col("event_type"), col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
          sum(col("c") * col("c")).as("scc"))
        .groupBy(col("event_type"))
        .agg(max(when(col("arm") === 1, col("n"))).as("n1"),
          max(when(col("arm") === 1, col("sc"))).as("sc1"),
          max(when(col("arm") === 1, col("scc"))).as("scc1"),
          max(when(col("arm") === 0, col("n"))).as("n0"),
          max(when(col("arm") === 0, col("sc"))).as("sc0"),
          max(when(col("arm") === 0, col("scc"))).as("scc0"))
        // Guard discipline (q214's): a type seen in only one arm (null
        // n) or with a single observation (n = 1, Welch divides by
        // n-1) would yield a null p_raw, and Spark's NULLS FIRST vs
        // DuckDB's NULLS LAST default would silently rank it
        // differently. Both engines drop those types BEFORE ranking,
        // so the m in the BH critical value also agrees.
        .filter(col("n1") > 1 && col("n0") > 1)
      def mean(sc: Column, n: Column) = sc.cast("double") / n
      def s2(scc: Column, sc: Column, n: Column) =
        (scc.cast("double") / n - (sc.cast("double") / n) *
          (sc.cast("double") / n)) * (n.cast("double") / (n - 1L))
      val zc = (mean(col("sc1"), col("n1")) - mean(col("sc0"), col("n0"))) /
        sqrt(s2(col("scc1"), col("sc1"), col("n1")) / col("n1") +
          s2(col("scc0"), col("sc0"), col("n0")) / col("n0"))
      // 1 - Phi(x) = phi(x) * poly(1/(1 + 0.2316419 x)), Zelen-Severo
      // 26.2.17 — the identical Horner spelling lives in the oracle
      val tC = lit(1.0) / (lit(1.0) + lit(0.2316419) * abs(col("z_raw")))
      val horner = ((((lit(1.330274429) * tC - lit(1.821255978)) * tC +
        lit(1.781477937)) * tC - lit(0.356563782)) * tC +
        lit(0.319381530)) * tC
      val pC = lit(2.0) * (lit(0.3989422804014327) *
        exp(-abs(col("z_raw")) * abs(col("z_raw")) / lit(2.0)) * horner)
      val wAll = Window.orderBy(col("p_raw"), col("event_type"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      m.withColumn("z_raw", zc)
        .withColumn("p_raw", pC)
        .withColumn("p_rank", row_number().over(
          Window.orderBy(col("p_raw"), col("event_type"))).cast("long"))
        .withColumn("mm", count(lit(1)).over(wAll))
        .withColumn("crit_raw",
          lit(0.05) * col("p_rank").cast("double") / col("mm"))
        .withColumn("kmax", max(when(col("p_raw") <= col("crit_raw"),
          col("p_rank"))).over(wAll))
        .select(col("event_type"), col("n1").as("n_treat"),
          col("n0").as("n_ctrl"), round(col("z_raw"), 6).as("z"),
          round(col("p_raw"), 6).as("p"), col("p_rank"),
          round(col("crit_raw"), 6).as("crit"),
          (col("p_rank") <= coalesce(col("kmax"), lit(0L))).as("significant"))
        .orderBy(col("p_rank"))
    },


    "q233_qte_deciles" -> { (s, dir) =>
      // Quantile treatment effects — the distributional readout a mean
      // contrast (q207/q214) hides: cut EACH arm into deciles of
      // per-user post-period purchase cents (exact per-arm order
      // statistics via operators/Quantile grouped by arm + the ANSI
      // ntile closed form — never a global sort), then contrast
      // matching deciles: qte_d = mean(y | treat, decile d) -
      // mean(y | ctrl, decile d). Detects "the treatment only moved
      // the top decile" effects. Same "ab:" arms as the rest of the
      // experiment family so the readouts compose. All means are
      // single divisions of exact integer cent sums. Scale shape: ONE
      // user shuffle, Quantile's bounded-cell passes (|groups| = 2),
      // then a 10-cell decile agg.
      val arm = pmod(md5_lower64(concat(lit("ab:"),
        col("user_id").cast("string")).cast("binary")), lit(2L))
      val perUser = Tables(s, dir).events
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), floor(col("value") * 100).cast("long").as("c"))
        .groupBy(col("user_id")).agg(sum(col("c")).as("y"))
        .withColumn("arm", arm)
      // r16: Quantile.ntiled — per-arm deciles via broadcast boundary
      // compare instead of ranking every user row (user_id unique
      // after the rollup); same ANSI decile assignment per arm
      // (oracle-verified)
      graft.operators.Quantile.ntiled(perUser, Seq("arm"), "y", "user_id",
          10, "decile")
        .groupBy(col("decile"))
        .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treat"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_ctrl"),
          sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sy1"),
          sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sy0"))
        // a one-arm decile is possible only at planted-tiny cohorts;
        // report null means there rather than divide by zero (q214's
        // guard discipline)
        .select(col("decile"), col("n_treat"), col("n_ctrl"),
          when(col("n_treat") > 0,
            round(col("sy1").cast("double") / col("n_treat"), 6))
            .as("mean_treat"),
          when(col("n_ctrl") > 0,
            round(col("sy0").cast("double") / col("n_ctrl"), 6))
            .as("mean_ctrl"),
          when(col("n_treat") > 0 && col("n_ctrl") > 0,
            round(col("sy1").cast("double") / col("n_treat")
              - col("sy0").cast("double") / col("n_ctrl"), 6)).as("qte"))
        .orderBy(col("decile"))
    },


    "q238_cmh_strata" -> { (s, dir) =>
      // Cochran-Mantel-Haenszel common-effect readout across strata
      // (Mantel & Haenszel 1959) — the confounding guard when the
      // conversion base rate varies by stratum (here day-of-week):
      // per-stratum 2x2 arm-by-conversion tables from the "ab:" arms,
      // the Mantel-Haenszel common odds ratio sum(a*d/T)/sum(b*c/T),
      // and the CMH chi-square (sum(a - E))^2 / sum(V) with
      // E = n1(a+c)/T and the hypergeometric V (no continuity
      // correction — one fixed spelling both engines). Every cell is
      // an exact integer; the per-stratum odds ratio rides beside the
      // pooled readout so Simpson-style sign flips are visible.
      // Scale shape: the event stream collapses to |dow| x 2 cells in
      // ONE map-side-combined agg; the pooled sums are windows over
      // the 7-row stratum table.
      val arm = pmod(md5_lower64(concat(lit("ab:"),
        col("user_id").cast("string")).cast("binary")), lit(2L))
      val e = Tables(s, dir).events
      val cells = e.select(arm.as("arm"), Tables.eventMicros(e).as("tus"),
          (col("event_type") === "purchase").as("conv"))
        .select(col("arm"), expr("(tus DIV 86400000000) % 7").as("dow"),
          col("conv"))
        .groupBy(col("dow"), col("arm"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("conv"), 1L).otherwise(0L)).as("cv"))
        .groupBy(col("dow"))
        .agg(max(when(col("arm") === 1, col("cv"))).as("a"),
          max(when(col("arm") === 1, col("n") - col("cv"))).as("b"),
          max(when(col("arm") === 0, col("cv"))).as("c"),
          max(when(col("arm") === 0, col("n") - col("cv"))).as("d"))
      def dd(c: Column) = c.cast("double")
      val t = col("a") + col("b") + col("c") + col("d")
      val wAll = Window.orderBy(col("dow"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      cells
        .withColumn("aE", dd(col("a")) -
          dd(col("a") + col("b")) * dd(col("a") + col("c")) / t)
        .withColumn("v", dd(col("a") + col("b")) * dd(col("c") + col("d")) *
          dd(col("a") + col("c")) * dd(col("b") + col("d")) /
          (dd(t) * dd(t) * dd(t - 1L)))
        .withColumn("num", sum(col("aE")).over(wAll))
        .withColumn("den", sum(col("v")).over(wAll))
        .withColumn("orn", sum(dd(col("a")) * dd(col("d")) / t).over(wAll))
        .withColumn("ord", sum(dd(col("b")) * dd(col("c")) / t).over(wAll))
        .select(col("dow"), col("a"), col("b"), col("c"), col("d"),
          round(dd(col("a")) * dd(col("d")) /
            (dd(col("b")) * dd(col("c"))), 6).as("or_stratum"),
          round(col("orn") / col("ord"), 6).as("or_mh"),
          round(col("num") * col("num") / col("den"), 6).as("cmh_chi2"))
        .orderBy(col("dow"))
    },


    "q239_jackknife_ratio" -> { (s, dir) =>
      // Leave-one-day-out jackknife CI for a RATIO metric (Quenouille/
      // Tukey; the delta-method-free uncertainty readout ratio metrics
      // need because E[X/Y] != E[X]/E[Y]): the corpus metric is mean
      // purchase cents per purchase EVENT, replicates drop one day at
      // a time — r_i = (S - s_i)/(N - n_i) from exact integer day
      // cells — and var_jk = (k-1)/k * sum((r_i - rbar)^2). Output:
      // the point ratio, jackknife SE and the +/-1.959964*se interval.
      // Scale shape: ONE |days| cell agg; the totals ride a broadcast
      // 1-row cross and every replicate is arithmetic on the bounded
      // day table (the bootstrap-free sibling of q202).
      val e = Tables(s, dir).events
      val daily = e.filter(col("event_type") === "purchase")
        .select(Tables.eventMicros(e).as("tus"),
          floor(col("value") * 100).cast("long").as("c"))
        .select(expr("tus DIV 86400000000").as("day"), col("c"))
        .groupBy(col("day"))
        .agg(sum(col("c")).as("s"), count(lit(1)).as("n"))
      val tot = daily.agg(sum(col("s")).as("ts"), sum(col("n")).as("tn"),
        count(lit(1)).as("k"))
      val reps = daily.crossJoin(broadcast(tot))
        .select(col("day"), col("ts"), col("tn"), col("k"),
          ((col("ts") - col("s")).cast("double") / (col("tn") - col("n")))
            .as("r"))
      val rb = reps.agg(avg(col("r")).as("rbar"))
      val se = sqrt((col("k_days") - 1L).cast("double") / col("k_days") *
        col("ssq"))
      reps.crossJoin(broadcast(rb))
        .agg(max(col("k")).as("k_days"),
          max(col("ts").cast("double") / col("tn")).as("ratio_raw"),
          sum((col("r") - col("rbar")) * (col("r") - col("rbar"))).as("ssq"))
        // k = 1 leaves the single leave-one-out replicate dividing by
        // (tn - n) = 0 — the jackknife is UNDEFINED, and Spark (null)
        // vs DuckDB (inf) disagree on 0-division. Gate the replicate
        // readouts on k >= 2 so a degenerate corpus reports an agreed
        // explicit null instead of an engine-dependent value.
        .select(col("k_days"), round(col("ratio_raw"), 6).as("ratio"),
          when(col("k_days") >= 2L, round(se, 6)).as("se_jackknife"),
          when(col("k_days") >= 2L,
            round(col("ratio_raw") - lit(1.959964) * se, 6)).as("ci_lo"),
          when(col("k_days") >= 2L,
            round(col("ratio_raw") + lit(1.959964) * se, 6)).as("ci_hi"))
    },


    "q240_matched_att" -> { (s, dir) =>
      // Caliper-matched treatment effect on the treated (the
      // propensity-matching estimator family, Rosenbaum & Rubin 1983;
      // here 1-D exact matching on the pre-period covariate): each
      // treat user matches its NEAREST control by pre-period spend
      // within a pre-registered caliper of 1000 cents (ties: lowest
      // control id), unmatched treat users are dropped and REPORTED —
      // the readout q214's stratification approximates with 5 coarse
      // bins. ATT = mean(y_treat - y_matched_control) over exact
      // integer cents. Scale shape: ONE user shuffle to (x, y, arm);
      // the candidate join is bucket-banded — controls replicate to
      // the 3 caliper-width buckets a within-caliper treat could
      // occupy, the join is EQUI on bucket, and best-match selection
      // is a map-side-combinable min(struct) AGGREGATION (not a
      // window), so a hot covariate value cannot serialize a task.
      // Never all-pairs: candidates are caliper-bounded by
      // construction.
      val cal = 1000L
      val e = Tables(s, dir).events
      val days = e.select(Tables.eventMicros(e).as("tus"))
        .select(expr("tus DIV 86400000000").as("day"))
        .agg(min(col("day")), max(col("day"))).head
      val cutoff = (days.getLong(0) + days.getLong(1) + 1L) / 2L
      val arm = pmod(md5_lower64(concat(lit("ab:"),
        col("user_id").cast("string")).cast("binary")), lit(2L))
      val perUser = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), Tables.eventMicros(e).as("tus"),
          floor(col("value") * 100).cast("long").as("c"))
        .select(col("user_id"),
          (expr("tus DIV 86400000000") >= cutoff).as("post"), col("c"))
        .groupBy(col("user_id"))
        .agg(sum(when(!col("post"), col("c")).otherwise(0L)).as("x"),
          sum(when(col("post"), col("c")).otherwise(0L)).as("y"))
        .withColumn("arm", arm)
      val treat = perUser.filter(col("arm") === 1)
        .select(col("user_id").as("tid"), col("x").as("tx"), col("y").as("ty"))
      val ctrl = perUser.filter(col("arm") === 0)
        .select(col("user_id").as("cid"), col("x").as("cx"), col("y").as("cy"))
        .select(col("cid"), col("cx"), col("cy"),
          explode(array(lit(-1L), lit(0L), lit(1L))).as("d"))
        .select(col("cid"), col("cx"), col("cy"),
          (expr(s"cx DIV $cal") + col("d")).as("bkt"))
      val best = treat
        .join(ctrl, expr(s"tx DIV $cal") === col("bkt") &&
          abs(col("tx") - col("cx")) <= cal)
        .groupBy(col("tid"))
        .agg(max(col("ty")).as("ty"),
          min(struct(abs(col("tx") - col("cx")).as("adx"),
            col("cid").as("cid"), col("cy").as("cy"))).as("m"))
      val nT = perUser.agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_ctrl"))
      best
        .agg(count(lit(1)).as("n_matched"),
          sum(col("ty") - col("m.cy")).as("sdiff"),
          sum(col("m.adx")).as("sadx"))
        .crossJoin(broadcast(nT))
        .select(col("n_treat"), col("n_ctrl"), col("n_matched"),
          round(col("n_matched").cast("double") / col("n_treat"), 6)
            .as("match_rate"),
          round(col("sdiff").cast("double") / col("n_matched"), 6)
            .as("att_cents"),
          round(col("sadx").cast("double") / col("n_matched"), 6)
            .as("mean_abs_dx"))
    },


    "q171_holdout_ab" -> { (s, dir) =>
      // Deterministic holdout experiment readout: users split 50/50 by
      // id-hash (q83's assignment — no RNG, any engine or re-run
      // reproduces the arms), outcome = heavy purchaser (>= 14
      // purchase events — every fixture user purchases at least once,
      // so plain did-purchase is degenerate at 100%); the 2x2
      // contingency table and its chi-square statistic come out of
      // exact integer counts with ONE double division at the end,
      // null-guarded when a margin is empty (both engines). The event
      // stream collapses once per user, the table is 2 rows, the
      // statistic closed-form — the 100 TB cost is the single user
      // rollup. (The assignment hash must be independent of q83's
      // split salt, or the experiment silently correlates with
      // train/test membership — different salt here.)
      val ev = Tables(s, dir).events
      val arm = pmod(md5_lower64(concat(lit("ab:"),
        col("user_id").cast("string")).cast("binary")), lit(2L)).as("arm")
      val users = ev.select(col("user_id"), arm,
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("cv"))
        .groupBy(col("user_id"), col("arm"))
        .agg(when(sum(col("cv")) >= 14, 1L).otherwise(0L).as("converted"))
      val cells = users.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
      // chi2 = N (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)) over
      // a=conv_0, b=nonconv_0, c=conv_1, d=nonconv_1
      val w = cells.agg(
        max(when(col("arm") === 0, col("n_users"))).as("n0"),
        max(when(col("arm") === 0, col("n_conv"))).as("c0"),
        max(when(col("arm") === 1, col("n_users"))).as("n1"),
        max(when(col("arm") === 1, col("n_conv"))).as("c1"))
      def d(c: Column) = c.cast("double")
      val (a, b2, c2, d2) = (col("c0"), col("n0") - col("c0"),
        col("c1"), col("n1") - col("c1"))
      val n = col("n0") + col("n1")
      val num = d(n) * pow(d(a) * d(d2) - d(b2) * d(c2), 2)
      val den = d(a + b2) * d(c2 + d2) * d(a + c2) * d(b2 + d2)
      w.select(col("n0"), col("c0"), col("n1"), col("c1"),
        round(d(col("c0")) / d(col("n0")), 6).as("rate0"),
        round(d(col("c1")) / d(col("n1")), 6).as("rate1"),
        when(a + c2 > 0 && b2 + d2 > 0, round(num / den, 4)).as("chi2"))
    },


    "q245_ipw_ate" -> { (s, dir) =>
      // Inverse-propensity-weighted treatment effect (Horvitz-Thompson
      // weights, Hajek-normalized; Rosenbaum & Rubin 1983) with the
      // propensity estimated per pre-spend quintile — the third leg of
      // the observational-adjustment family: q214 re-weights STRATUM
      // CONTRASTS by population share, q240 matches INDIVIDUALS within
      // a caliper; IPW re-weights individuals by 1/e(x) and reports
      // the weight-health diagnostics (Kish effective sample size per
      // arm) the other two cannot give — an ESS far below n flags
      // propensities too extreme to trust ANY adjusted estimate. With
      // stratified propensities the Hajek point estimate provably
      // equals q214's valid-strata weighted fold (PipelineSpec pins
      // that cross-estimator law); strata with an empty arm drop out
      // exactly as q214 weights them out. All per-user mass rolls up
      // as exact integer cents per (stratum, arm) CELL; doubles appear
      // only in the 5-row fold (round 6 absorbs last-ulp). Scale
      // shape: ONE user shuffle + Quantile's bounded-cell ranking +
      // a 5-row fold — q214's exact plan with a different readout.
      val e = Tables(s, dir).events
      val days = e.select(Tables.eventMicros(e).as("tus"))
        .select(expr("tus DIV 86400000000").as("day"))
        .agg(min(col("day")), max(col("day"))).head
      val cutoff = (days.getLong(0) + days.getLong(1) + 1L) / 2L
      val arm = pmod(md5_lower64(concat(lit("ab:"),
        col("user_id").cast("string")).cast("binary")), lit(2L))
      val perUser = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), Tables.eventMicros(e).as("tus"),
          floor(col("value") * 100).cast("long").as("c"))
        .select(col("user_id"),
          (expr("tus DIV 86400000000") >= cutoff).as("post"), col("c"))
        .groupBy(col("user_id"))
        .agg(sum(when(!col("post"), col("c")).otherwise(0L)).as("x"),
          sum(when(col("post"), col("c")).otherwise(0L)).as("y"))
        .withColumn("arm", arm)
      val one = lit(1).cast("double")
      // r16: Quantile.ntiled — quintile strata via broadcast boundary
      // compare instead of ranking every user row (user_id unique
      // after the rollup); same ANSI bucket assignment (oracle-verified)
      val cells = graft.operators.Quantile.ntiled(perUser, Seq.empty,
          "x", "user_id", 5, "stratum")
        .groupBy(col("stratum"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treat"),
          sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sy1"),
          sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sy0"))
        .withColumn("n_ctrl", col("n_users") - col("n_treat"))
        .filter(col("n_treat") > 0 && col("n_ctrl") > 0)
        .withColumn("e", col("n_treat").cast("double") / col("n_users"))
      cells.agg(
          count(lit(1)).as("n_strata_used"),
          sum(col("n_treat")).as("n_treat"),
          sum(col("n_ctrl")).as("n_ctrl"),
          sum(col("sy1").cast("double") / col("e")).as("t1"),
          sum(col("n_treat").cast("double") / col("e")).as("w1"),
          sum(col("n_treat").cast("double") / (col("e") * col("e")))
            .as("w1b"),
          sum(col("sy0").cast("double") / (one - col("e"))).as("t0"),
          sum(col("n_ctrl").cast("double") / (one - col("e"))).as("w0"),
          sum(col("n_ctrl").cast("double") /
            ((one - col("e")) * (one - col("e")))).as("w0b"))
        .select(col("n_strata_used"), col("n_treat"), col("n_ctrl"),
          round(col("t1") / col("w1"), 6).as("mean_treat_ipw"),
          round(col("t0") / col("w0"), 6).as("mean_ctrl_ipw"),
          round(col("t1") / col("w1") - col("t0") / col("w0"), 6)
            .as("ate_ipw"),
          round(col("w1") * col("w1") / col("w1b"), 6).as("ess_treat"),
          round(col("w0") * col("w0") / col("w0b"), 6).as("ess_ctrl"))
    },

    "q202_bootstrap_ci" -> { (s, dir) =>
      // Poisson bootstrap (Chamandy et al. 2012, "Estimating
      // uncertainty for massive data streams" — the Google form of the
      // bootstrap that needs NO resampling pass): every row gets an
      // independent Poisson(1) weight per replicate, so each of B=40
      // replicate means is just a weighted aggregate computed in the
      // SAME scan. Weights are DETERMINISTIC — u = 53 md5 bits of
      // (event_id, b) mapped through the hardcoded Poisson(1) CDF
      // thresholds (identical double literals both engines), so
      // re-runs and the oracle reproduce every weight exactly. Each
      // replicate's mean is one division of exact integer sums
      // (k <= 6, so sum(k*c) stays a long); the CI is the nearest-rank
      // 2.5%/97.5% order statistic over the 40 replicate means. Scale
      // shape: one scan projects 40 (b, k) pairs per row that
      // map-side-combine to |types| x 40 cells; the rank windows run
      // on those 200 rows. No data movement beyond one partial-agg
      // shuffle — the whole point of the Poisson form.
      val b40 = 40
      val u = md5_lower64(concat(lit("bs:"), col("event_id").cast("string"),
          lit(":"), col("b").cast("string")).cast("binary"))
        .bitwiseAND(lit(9007199254740991L)).cast("double") /
        lit(9007199254740992.0)
      val k = when(u < 0.36787944117144233, 0L)
        .when(u < 0.7357588823428847, 1L)
        .when(u < 0.9196986029286058, 2L)
        .when(u < 0.9810118431238462, 3L)
        .when(u < 0.9963401531726563, 4L)
        .when(u < 0.9994058151824183, 5L)
        .otherwise(6L)
      val reps = Tables(s, dir).events
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 100).cast("long").as("c"))
        .select(col("event_type"), col("event_id"), col("c"),
          explode(sequence(lit(0), lit(b40 - 1))).as("b"))
        .select(col("event_type"), col("b"), col("c"), k.as("k"))
        .groupBy(col("event_type"), col("b"))
        .agg(sum(col("k") * col("c")).as("wx"), sum(col("k")).as("w"))
        // an all-zero-weight replicate (P ~ e^-n per (type, b) —
        // unreachable at fixture scale) would make wx/w null and
        // silently shift the rn=1/rn=39 CI picks: fail loudly instead
        .select(col("event_type"), col("b"),
          when(col("w") > 0, round(col("wx").cast("double") / col("w"), 6))
            .otherwise(raise_error(concat(lit("q202: degenerate replicate "),
              col("event_type"), lit("/"), col("b").cast("string"),
              lit(" has zero total weight")))).as("rep_mean"))
      val wt = Window.partitionBy(col("event_type"))
      val wr = Window.partitionBy(col("event_type"))
        .orderBy(col("rep_mean"), col("b"))
      val base = Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("c")).cast("double") / count(lit(1)), 6).as("mean"))
      reps
        .withColumn("rn", row_number().over(wr).cast("long"))
        .withColumn("lo", max(when(col("rn") === 1, col("rep_mean"))).over(wt))
        .withColumn("hi", max(when(col("rn") === 39, col("rep_mean"))).over(wt))
        .groupBy(col("event_type"))
        .agg(max(col("lo")).as("ci_lo"), max(col("hi")).as("ci_hi"))
        .join(broadcast(base), "event_type")
        .select(col("event_type"), col("n"), col("mean"),
          col("ci_lo"), col("ci_hi"))
        .orderBy(col("event_type"))
    },


    "q203_diff_in_diff" -> { (s, dir) =>
      // Difference-in-differences readout — the experiment-analysis
      // estimator when arms differ at baseline: DiD =
      // (treat_post - treat_pre) - (ctrl_post - ctrl_pre) over mean
      // purchase cents, arms from q171's deterministic id-hash (same
      // "ab:" salt so the two readouts describe the SAME experiment),
      // periods split at the integer midpoint of the observed day
      // span (one 2-scalar agg, broadcast back as plan input). Every
      // cell mean is one division of exact integer sums; the double
      // subtractions combine identically-computed values, so both
      // engines agree bit-for-bit before the 6dp round. Scale shape:
      // purchases collapse to FOUR (arm, period) cells in one
      // map-side-combined agg; the driver only moves the day bounds.
      val e = Tables(s, dir).events
      val arm = pmod(md5_lower64(concat(lit("ab:"),
        col("user_id").cast("string")).cast("binary")), lit(2L))
      val days = e.select(Tables.eventMicros(e).as("tus"))
        .select(expr("tus DIV 86400000000").as("day"))
        .agg(min(col("day")), max(col("day"))).head
      val cutoff = (days.getLong(0) + days.getLong(1) + 1L) / 2L
      val cells = e.filter(col("event_type") === "purchase")
        .select(arm.as("arm"), Tables.eventMicros(e).as("tus"),
          floor(col("value") * 100).cast("long").as("c"))
        .select(col("arm"),
          (expr("tus DIV 86400000000") >= cutoff).as("post"), col("c"))
        .groupBy(col("arm"), col("post"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
        .withColumn("m", col("sc").cast("double") / col("n"))
      def cell(a: Int, p: Boolean) =
        max(when(col("arm") === a && col("post") === p, col("m")))
      cells.agg(sum(col("n")).as("n_purchases"),
          cell(1, false).as("treat_pre"), cell(1, true).as("treat_post"),
          cell(0, false).as("ctrl_pre"), cell(0, true).as("ctrl_post"))
        .select(col("n_purchases"),
          round(col("treat_pre"), 6).as("treat_pre"),
          round(col("treat_post"), 6).as("treat_post"),
          round(col("ctrl_pre"), 6).as("ctrl_pre"),
          round(col("ctrl_post"), 6).as("ctrl_post"),
          round((col("treat_post") - col("treat_pre")) -
            (col("ctrl_post") - col("ctrl_pre")), 6).as("did_cents"))
    },


    "q207_cuped" -> { (s, dir) =>
      // CUPED variance-reduced experiment readout (Deng et al. 2013,
      // WSDM — "Improving the Sensitivity of Online Controlled
      // Experiments by Utilizing Pre-Experiment Data"): per user,
      // X = pre-period purchase cents, Y = post-period purchase cents
      // (periods split at the integer midpoint of the observed day
      // span, arms from q171/q203's deterministic "ab:" id-hash so all
      // three readouts describe the SAME experiment). theta =
      // cov(X,Y)/var(X) POOLED across arms; each arm reports its raw
      // post mean and the adjusted mean Ybar_a - theta*(Xbar_a - Xbar).
      // rho2 = cov^2/(var X * var Y) is the variance-reduction factor.
      // All five moment sums are EXACT integers (x,y <= ~1e6 cents per
      // user, x*y <= 1e12, summed over <=1e6 ladder users ~ 1e18 —
      // fits a long; the 100 TB form would widen to DECIMAL), and
      // every double is derived from those longs with one fixed
      // spelling, so both engines agree bit-for-bit before the 6dp
      // round. Scale shape: purchases collapse to per-user (x, y) in
      // ONE user shuffle, then to per-arm + pooled 1-row moment aggs.
      val e = Tables(s, dir).events
      val days = e.select(Tables.eventMicros(e).as("tus"))
        .select(expr("tus DIV 86400000000").as("day"))
        .agg(min(col("day")), max(col("day"))).head
      val cutoff = (days.getLong(0) + days.getLong(1) + 1L) / 2L
      val arm = pmod(md5_lower64(concat(lit("ab:"),
        col("user_id").cast("string")).cast("binary")), lit(2L))
      val perUser = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), Tables.eventMicros(e).as("tus"),
          floor(col("value") * 100).cast("long").as("c"))
        .select(col("user_id"),
          (expr("tus DIV 86400000000") >= cutoff).as("post"), col("c"))
        .groupBy(col("user_id"))
        .agg(sum(when(!col("post"), col("c")).otherwise(0L)).as("x"),
          sum(when(col("post"), col("c")).otherwise(0L)).as("y"))
        .withColumn("arm", arm)
      val pooled = perUser.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
        .select(col("n"),
          (col("sx").cast("double") / col("n")).as("mx"),
          (col("sy").cast("double") / col("n")).as("my"),
          (col("sxy").cast("double") / col("n")).as("mxy"),
          (col("sxx").cast("double") / col("n")).as("mxx"),
          (col("syy").cast("double") / col("n")).as("myy"))
        .select(col("mx"),
          (col("mxy") - col("mx") * col("my")).as("cxy"),
          (col("mxx") - col("mx") * col("mx")).as("vx"),
          (col("myy") - col("my") * col("my")).as("vy"))
        .select(col("mx"), (col("cxy") / col("vx")).as("theta"),
          (col("cxy") * col("cxy") / (col("vx") * col("vy"))).as("rho2"))
      perUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"), sum(col("x")).as("ax"),
          sum(col("y")).as("ay"))
        .crossJoin(broadcast(pooled))
        .select(col("arm"), col("n_users"),
          round(col("ay").cast("double") / col("n_users"), 6).as("mean_post"),
          round(col("ay").cast("double") / col("n_users") - col("theta") *
            (col("ax").cast("double") / col("n_users") - col("mx")), 6)
            .as("adj_mean"),
          round(col("theta"), 6).as("theta"),
          round(col("rho2"), 6).as("rho2"))
        .orderBy(col("arm"))
    },


    "q208_mann_whitney" -> { (s, dir) =>
      // Mann-Whitney U (Wilcoxon rank-sum) between the two "ab:" arms
      // over purchase cents — the nonparametric significance readout
      // when t-test normality can't be assumed. Average ranks for
      // ties: collapsing to the per-VALUE table (cnt, cnt_arm1) makes
      // the tied-rank sum exact integers — 2*R1 = sum over values of
      // cnt1 * (2*rank_before + cnt + 1) — and the tie-corrected
      // variance term sum(t^3 - t) stays an exact BIGINT (largest tie
      // multiplicity t must stay < ~2e6 for the long bound; ladder max
      // is ~1e3). U, z are doubles derived from those exact integers
      // with one fixed spelling. Scale shape: purchases collapse to
      // the value-level table in ONE hash shuffle; the exclusive
      // prefix count over that (unbounded-cardinality) table comes
      // from operators/Quantile.prefixSum — range-bucketed exact
      // prefix sums, no single-partition window anywhere.
      val arm = pmod(md5_lower64(concat(lit("ab:"),
        col("user_id").cast("string")).cast("binary")), lit(2L))
      val byVal = Tables(s, dir).events
        .filter(col("event_type") === "purchase")
        .select(arm.as("arm"), floor(col("value") * 100).cast("long").as("c"))
        .groupBy(col("c"))
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cnt1"))
      graft.operators.Quantile.prefixSum(byVal, Seq.empty, "c", "c",
          weight = "cnt", prefixCol = "rank_before")
        .agg(sum(col("cnt1") * (lit(2L) * col("rank_before") + col("cnt")
            + 1L)).as("two_r1"),
          sum(col("cnt1")).as("n1"), sum(col("cnt")).as("nn"),
          sum(col("cnt") * (col("cnt") - 1L) * (col("cnt") + 1L)).as("tie"))
        .select(col("n1"), (col("nn") - col("n1")).as("n2"), col("nn"),
          col("two_r1"), col("tie"))
        .select(col("n1"), col("n2"),
          ((col("two_r1").cast("double") - col("n1").cast("double") *
            (col("n1") + 1L)) / 2.0).as("u1"),
          (col("n1").cast("double") * col("n2") / 2.0).as("mu"),
          (col("n1").cast("double") * col("n2") / 12.0 *
            ((col("nn") + 1L).cast("double") - col("tie").cast("double") /
              (col("nn").cast("double") * (col("nn") - 1L).cast("double"))))
            .as("vu"))
        .select(col("n1"), col("n2"), round(col("u1"), 6).as("u1"),
          round((col("u1") - col("mu")) / sqrt(col("vu")), 6).as("z"))
    },


    "q211_sprt" -> { (s, dir) =>
      // Wald's Sequential Probability Ratio Test walked day by day —
      // the "can we stop the experiment early" readout: on the
      // treatment arm ("ab:" hash = 1), each day contributes
      // conv*ln(p1/p0) + (trials-conv)*ln((1-p1)/(1-p0)) to the
      // cumulative log-likelihood ratio for H1: p=0.25 vs H0: p=0.2
      // (pre-registered constants, as SPRT requires — NOT data-derived),
      // and the day's decision compares the running LLR to the
      // alpha=beta=0.05 bounds +/-ln(19). Counts are exact integers;
      // the LLR cumsum runs in day order over the bounded day table,
      // so both engines add the same terms in the same order.
      // Scale shape: events collapse to |days| cells in ONE
      // map-side-combined agg; every window runs on that bounded table.
      val e = Tables(s, dir).events
      val arm = pmod(md5_lower64(concat(lit("ab:"),
        col("user_id").cast("string")).cast("binary")), lit(2L))
      val wCum = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      e.select(arm.as("arm"), Tables.eventMicros(e).as("tus"),
          (col("event_type") === "purchase").as("conv"))
        .filter(col("arm") === 1)
        .select(expr("tus DIV 86400000000").as("day"), col("conv"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("trials"),
          sum(when(col("conv"), 1L).otherwise(0L)).as("conversions"))
        .withColumn("llr", round(sum(
          col("conversions").cast("double") * log(lit(0.25) / lit(0.2)) +
            (col("trials") - col("conversions")).cast("double") *
              log(lit(0.75) / lit(0.8))).over(wCum), 6))
        .select(col("day"), col("trials"), col("conversions"), col("llr"),
          when(col("llr") >= log(lit(19.0)), "accept_h1")
            .when(col("llr") <= -log(lit(19.0)), "accept_h0")
            .otherwise("continue").as("decision"))
        .orderBy(col("day"))
    },


    "q214_post_stratification" -> { (s, dir) =>
      // Post-stratified treatment-effect estimate — the
      // observational-bias guard when arms are imbalanced on a
      // pre-metric: users cut into exact quintiles of PRE-period
      // spend (operators/Quantile ranks + the ANSI ntile closed form,
      // never a global sort), the per-stratum arm contrast
      // ate_s = mean(y|treat) - mean(y|ctrl), and the overall estimate
      // reweights each stratum by its population share — versus the
      // raw contrast that confounds arm with stratum mix. Same "ab:"
      // arms / midpoint periods as q207, so the readouts compose. All
      // means are single divisions of exact integer cent sums; the
      // weighted fold runs over 5 stratum rows. Scale shape: ONE user
      // shuffle to (x, y, arm), Quantile's bounded-cell ranking, then
      // a 10-cell agg.
      val e = Tables(s, dir).events
      val days = e.select(Tables.eventMicros(e).as("tus"))
        .select(expr("tus DIV 86400000000").as("day"))
        .agg(min(col("day")), max(col("day"))).head
      val cutoff = (days.getLong(0) + days.getLong(1) + 1L) / 2L
      val arm = pmod(md5_lower64(concat(lit("ab:"),
        col("user_id").cast("string")).cast("binary")), lit(2L))
      val perUser = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), Tables.eventMicros(e).as("tus"),
          floor(col("value") * 100).cast("long").as("c"))
        .select(col("user_id"),
          (expr("tus DIV 86400000000") >= cutoff).as("post"), col("c"))
        .groupBy(col("user_id"))
        .agg(sum(when(!col("post"), col("c")).otherwise(0L)).as("x"),
          sum(when(col("post"), col("c")).otherwise(0L)).as("y"))
        .withColumn("arm", arm)
      // r16: Quantile.ntiled — quintile strata via broadcast boundary
      // compare instead of ranking every user row (user_id unique
      // after the rollup); same ANSI bucket assignment (oracle-verified)
      val strat = graft.operators.Quantile.ntiled(perUser, Seq.empty,
          "x", "user_id", 5, "stratum")
        .groupBy(col("stratum"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treat"),
          sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sy1"),
          sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sy0"))
        // a one-arm stratum (possible at tiny cohort sizes) reports
        // null means and is weighted OUT of the overall estimate —
        // both engines spell the identical CASE guards
        .withColumn("valid",
          col("n_treat") > 0 && col("n_users") - col("n_treat") > 0)
        .withColumn("mean_treat", when(col("n_treat") > 0,
          round(col("sy1").cast("double") / col("n_treat"), 6)))
        .withColumn("mean_ctrl", when(col("n_users") - col("n_treat") > 0,
          round(col("sy0").cast("double") /
            (col("n_users") - col("n_treat")), 6)))
        .withColumn("ate_s", when(col("valid"),
          round(col("sy1").cast("double") / col("n_treat")
            - col("sy0").cast("double") /
              (col("n_users") - col("n_treat")), 6)))
      val wAll = Window.orderBy(col("stratum"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      strat
        .withColumn("ate_weighted", round(
          sum(when(col("valid"),
            (col("sy1").cast("double") / col("n_treat") -
              col("sy0").cast("double") / (col("n_users") - col("n_treat"))) *
              col("n_users")).otherwise(lit(0.0))).over(wAll) /
            sum(when(col("valid"), col("n_users")).otherwise(0L)).over(wAll),
          6))
        .select(col("stratum"), col("n_users"), col("n_treat"),
          col("mean_treat"), col("mean_ctrl"), col("ate_s"),
          col("ate_weighted"))
        .orderBy(col("stratum"))
    },


    "q219_mde_power" -> { (s, dir) =>
      // Minimum detectable effect at 80% power / 5% two-sided alpha —
      // the pre-experiment sizing readout (how small a lift could this
      // user base even detect?): MDE = (z_{a/2} + z_b) * sqrt(s^2 *
      // (1/n1 + 1/n0)) over per-user purchase cents, arms from the
      // same "ab:" hash as q171/q203/q207 so the whole experiment
      // family describes one assignment. The z constants are the
      // pre-registered literals 1.959964 and 0.841621 (both engines
      // spell them identically — no inverse-CDF in either engine);
      // sample variance comes from exact integer sums via one fixed
      // double spelling (the n*Syy integer product would overflow a
      // long at the sf10 ladder, the q207 pattern). Scale shape: ONE
      // user shuffle, then a 2-cell arm agg folded to a 1-row readout.
      val arm = pmod(md5_lower64(concat(lit("ab:"),
        col("user_id").cast("string")).cast("binary")), lit(2L))
      val perUser = Tables(s, dir).events
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), floor(col("value") * 100).cast("long").as("c"))
        .groupBy(col("user_id")).agg(sum(col("c")).as("y"))
        .withColumn("arm", arm)
      perUser
        .agg(count(lit(1)).as("n"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"))
        .select(col("n1").as("n_treat"), (col("n") - col("n1")).as("n_ctrl"),
          col("n"), (col("sy").cast("double") / col("n")).as("my"),
          ((col("syy").cast("double") / col("n") -
            (col("sy").cast("double") / col("n")) *
            (col("sy").cast("double") / col("n"))) *
            (col("n").cast("double") / (col("n") - 1L))).as("s2"))
        .select(col("n_treat"), col("n_ctrl"),
          round(col("my"), 6).as("mean_cents"),
          round(sqrt(col("s2")), 6).as("sd_cents"),
          round((lit(1.959964) + lit(0.841621)) * sqrt(col("s2") *
            (lit(1.0) / col("n_treat") + lit(1.0) / col("n_ctrl"))), 6)
            .as("mde_abs_cents"),
          round((lit(1.959964) + lit(0.841621)) * sqrt(col("s2") *
            (lit(1.0) / col("n_treat") + lit(1.0) / col("n_ctrl"))) /
            col("my"), 6).as("mde_rel"))
    },
  )

  def oracle: Map[String, String] = Map(

    // Mann-Kendall rebuilt: the same daily cells, the bounded d1 < d2
    // pair table, exact integer S / tie sums, and the identical double
    // spellings for tau, var, the continuity-corrected z and the
    // two-middle-order-statistics Theil-Sen median.
    "q231_mann_kendall" ->
      """WITH daily AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
               AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS rev
            FROM events WHERE event_type = 'purchase' GROUP BY 1),
          nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM daily),
          pr AS (SELECT a.day AS d1, b.day AS d2,
                 CASE WHEN b.rev > a.rev THEN 1
                      WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sg,
                 CAST(b.rev - a.rev AS DOUBLE) / (b.day - a.day) AS slope
                FROM daily a JOIN daily b ON a.day < b.day),
          rk AS (SELECT sg, slope,
                 CAST(row_number() OVER (ORDER BY slope, d1, d2) AS BIGINT)
                   AS rn FROM pr),
          ag AS (SELECT CAST(sum(sg) AS BIGINT) AS s_stat,
                 CAST(count(*) AS BIGINT) AS m FROM rk),
          tie AS (SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                   AS sum_t
                FROM (SELECT CAST(count(*) AS BIGINT) AS t
                      FROM daily GROUP BY rev) tt),
          med AS (SELECT avg(slope) AS sen_slope FROM rk, nd
                WHERE rn = (nd.nd * (nd.nd - 1) // 2 + 1) // 2
                   OR rn = (nd.nd * (nd.nd - 1) // 2 + 2) // 2),
          v AS (SELECT nd.nd, ag.s_stat, ag.m, med.sen_slope,
                 CAST(nd.nd * (nd.nd - 1) * (2 * nd.nd + 5) - tie.sum_t
                   AS DOUBLE) / 18.0 AS var_s_raw
                FROM nd, ag, tie, med)
          SELECT nd AS n_days, s_stat,
            round(CAST(s_stat AS DOUBLE) / m, 6) AS tau,
            round(var_s_raw, 6) AS var_s,
            round(CASE WHEN s_stat > 0
                THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(var_s_raw)
                WHEN s_stat < 0
                THEN (CAST(s_stat AS DOUBLE) + 1) / sqrt(var_s_raw)
                ELSE 0.0 END, 6) AS z,
            round(sen_slope, 6) AS sen_slope
          FROM v""",

    // BH-FDR rebuilt: the same (type, arm) integer moment cells, the
    // identical Welch-z / Zelen-Severo-polynomial double spellings, and
    // the same rank / alpha*k/m comparison on unrounded doubles.
    "q232_fdr_bh" ->
      """WITH cells AS (SELECT event_type,
               CAST(md5_number_lower('ab:' || user_id) & 1 AS BIGINT) AS arm,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sc,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)
                 * CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS scc
             FROM events GROUP BY 1, 2),
          g AS (SELECT event_type,
                 max(CASE WHEN arm = 1 THEN n END) AS n1,
                 max(CASE WHEN arm = 1 THEN sc END) AS sc1,
                 max(CASE WHEN arm = 1 THEN scc END) AS scc1,
                 max(CASE WHEN arm = 0 THEN n END) AS n0,
                 max(CASE WHEN arm = 0 THEN sc END) AS sc0,
                 max(CASE WHEN arm = 0 THEN scc END) AS scc0
                FROM cells GROUP BY event_type),
          zz AS (SELECT event_type, n1, n0,
                 (CAST(sc1 AS DOUBLE) / n1 - CAST(sc0 AS DOUBLE) / n0) /
                   sqrt((CAST(scc1 AS DOUBLE) / n1
                       - (CAST(sc1 AS DOUBLE) / n1) * (CAST(sc1 AS DOUBLE) / n1))
                       * (CAST(n1 AS DOUBLE) / (n1 - 1)) / n1
                     + (CAST(scc0 AS DOUBLE) / n0
                       - (CAST(sc0 AS DOUBLE) / n0) * (CAST(sc0 AS DOUBLE) / n0))
                       * (CAST(n0 AS DOUBLE) / (n0 - 1)) / n0) AS z_raw
                FROM g WHERE n1 > 1 AND n0 > 1),
          tt AS (SELECT event_type, n1, n0, z_raw,
                 1.0 / (1.0 + 0.2316419 * abs(z_raw)) AS t FROM zz),
          pv AS (SELECT event_type, n1, n0, z_raw,
                 2.0 * (0.3989422804014327
                   * exp(-abs(z_raw) * abs(z_raw) / 2.0)
                   * (((((1.330274429 * t - 1.821255978) * t
                     + 1.781477937) * t - 0.356563782) * t
                     + 0.319381530) * t)) AS p_raw
                FROM tt),
          rk AS (SELECT *,
                 CAST(row_number() OVER (ORDER BY p_raw, event_type)
                   AS BIGINT) AS p_rank,
                 CAST(count(*) OVER () AS BIGINT) AS mm FROM pv),
          bh AS (SELECT *, 0.05 * CAST(p_rank AS DOUBLE) / mm AS crit_raw
                FROM rk),
          km AS (SELECT *, max(CASE WHEN p_raw <= crit_raw THEN p_rank END)
                   OVER () AS kmax FROM bh)
          SELECT event_type, n1 AS n_treat, n0 AS n_ctrl,
            round(z_raw, 6) AS z, round(p_raw, 6) AS p, p_rank,
            round(crit_raw, 6) AS crit,
            p_rank <= coalesce(kmax, 0) AS significant
          FROM km ORDER BY p_rank""",

    // QTE rebuilt: the same per-user cents, a plain per-arm ntile(10)
    // window standing in for the Quantile operator (a genuine
    // cross-check — different construction, same exact deciles), the
    // same guarded integer-mean contrasts.
    "q233_qte_deciles" ->
      """WITH pu AS (SELECT user_id,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y,
               CAST(md5_number_lower('ab:' || user_id) & 1 AS BIGINT) AS arm
             FROM events WHERE event_type = 'purchase' GROUP BY user_id),
          d AS (SELECT y, arm,
                 CAST(ntile(10) OVER (PARTITION BY arm
                   ORDER BY y, user_id) AS BIGINT) AS decile
                FROM pu),
          g AS (SELECT decile,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_treat,
                 CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ctrl,
                 CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT)
                   AS sy1,
                 CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT)
                   AS sy0
                FROM d GROUP BY decile)
          SELECT decile, n_treat, n_ctrl,
            CASE WHEN n_treat > 0
              THEN round(CAST(sy1 AS DOUBLE) / n_treat, 6) END AS mean_treat,
            CASE WHEN n_ctrl > 0
              THEN round(CAST(sy0 AS DOUBLE) / n_ctrl, 6) END AS mean_ctrl,
            CASE WHEN n_treat > 0 AND n_ctrl > 0
              THEN round(CAST(sy1 AS DOUBLE) / n_treat
                - CAST(sy0 AS DOUBLE) / n_ctrl, 6) END AS qte
          FROM g ORDER BY decile""",

    // Matching rebuilt: the same per-user cells, controls replicated to
    // their 3 caliper buckets, the same equi-join + caliper filter, a
    // row_number standing in for the engine's min(struct) best-match
    // (identical (adx, cid) order), exact integer difference sums.
    "q240_matched_att" ->
      """WITH d AS (SELECT min(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)
               AS mn, max(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS mx
             FROM events),
          p AS (SELECT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                   >= (SELECT (mn + mx + 1) // 2 FROM d) AS post,
                 CAST(floor(value * 100) AS BIGINT) AS c
                FROM events WHERE event_type = 'purchase'),
          pu AS (SELECT user_id,
                  CAST(sum(CASE WHEN NOT post THEN c ELSE 0 END) AS BIGINT)
                    AS x,
                  CAST(sum(CASE WHEN post THEN c ELSE 0 END) AS BIGINT) AS y,
                  CAST(md5_number_lower('ab:' || user_id) & 1 AS BIGINT)
                    AS arm
                 FROM p GROUP BY user_id),
          t AS (SELECT user_id AS tid, x AS tx, y AS ty FROM pu
                WHERE arm = 1),
          c AS (SELECT user_id AS cid, x AS cx, y AS cy FROM pu
                WHERE arm = 0),
          ce AS (SELECT cid, cx, cy, cx // 1000 + dd AS bkt FROM c
                 CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dd) u),
          cand AS (SELECT t.tid, t.ty, ce.cid, ce.cy,
                    abs(t.tx - ce.cx) AS adx
                   FROM t JOIN ce ON t.tx // 1000 = ce.bkt
                   WHERE abs(t.tx - ce.cx) <= 1000),
          best AS (SELECT tid, ty, cid, cy, adx FROM (
                    SELECT *, row_number() OVER (PARTITION BY tid
                      ORDER BY adx, cid) AS rk FROM cand) WHERE rk = 1),
          nt AS (SELECT
                  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_treat,
                  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_ctrl FROM pu),
          ag AS (SELECT CAST(count(*) AS BIGINT) AS n_matched,
                  CAST(sum(ty - cy) AS BIGINT) AS sdiff,
                  CAST(sum(adx) AS BIGINT) AS sadx FROM best)
          SELECT n_treat, n_ctrl, n_matched,
            round(CAST(n_matched AS DOUBLE) / n_treat, 6) AS match_rate,
            round(CAST(sdiff AS DOUBLE) / n_matched, 6) AS att_cents,
            round(CAST(sadx AS DOUBLE) / n_matched, 6) AS mean_abs_dx
          FROM ag, nt""",

    // CMH rebuilt: the same (dow, arm) integer cells, the identical
    // E/V/odds-ratio double spellings, pooled sums as full-frame
    // windows over the 7-row stratum table.
    "q238_cmh_strata" ->
      """WITH p AS (SELECT CAST(md5_number_lower('ab:' || user_id) & 1
                   AS BIGINT) AS arm,
                 (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) % 7 AS dow,
                 event_type = 'purchase' AS conv
                FROM events),
          c2 AS (SELECT dow, arm, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS cv
                 FROM p GROUP BY 1, 2),
          g AS (SELECT dow,
                 max(CASE WHEN arm = 1 THEN cv END) AS a,
                 max(CASE WHEN arm = 1 THEN n - cv END) AS b,
                 max(CASE WHEN arm = 0 THEN cv END) AS c,
                 max(CASE WHEN arm = 0 THEN n - cv END) AS d
                FROM c2 GROUP BY dow),
          x AS (SELECT *, a + b + c + d AS t FROM g),
          y AS (SELECT *,
                 CAST(a AS DOUBLE) - CAST(a + b AS DOUBLE)
                   * CAST(a + c AS DOUBLE) / t AS aE,
                 CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                   * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)
                   / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
                     * CAST(t - 1 AS DOUBLE)) AS v,
                 CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / t AS orn_i,
                 CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / t AS ord_i
                FROM x),
          z AS (SELECT *,
                 sum(aE) OVER () AS num, sum(v) OVER () AS den,
                 sum(orn_i) OVER () AS orn, sum(ord_i) OVER () AS ord
                FROM y)
          SELECT dow, a, b, c, d,
            round(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
              / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)), 6) AS or_stratum,
            round(orn / ord, 6) AS or_mh,
            round(num * num / den, 6) AS cmh_chi2
          FROM z ORDER BY dow""",

    // Jackknife rebuilt: the same day cells, leave-one-out replicate
    // ratios from integer totals, the identical (k-1)/k variance and
    // z-interval double spellings.
    "q239_jackknife_ratio" ->
      """WITH daily AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
               AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
            FROM events WHERE event_type = 'purchase' GROUP BY 1),
          tot AS (SELECT CAST(sum(s) AS BIGINT) AS ts,
                  CAST(sum(n) AS BIGINT) AS tn,
                  CAST(count(*) AS BIGINT) AS k FROM daily),
          reps AS (SELECT ts, tn, k,
                  CAST(ts - s AS DOUBLE) / (tn - n) AS r
                 FROM daily, tot),
          rb AS (SELECT avg(r) AS rbar FROM reps),
          agg AS (SELECT max(k) AS k_days,
                  max(CAST(ts AS DOUBLE) / tn) AS ratio_raw,
                  sum((r - rbar) * (r - rbar)) AS ssq
                 FROM reps, rb)
          SELECT k_days, round(ratio_raw, 6) AS ratio,
            CASE WHEN k_days >= 2 THEN
              round(sqrt(CAST(k_days - 1 AS DOUBLE) / k_days * ssq), 6)
            END AS se_jackknife,
            CASE WHEN k_days >= 2 THEN round(ratio_raw - 1.959964
              * sqrt(CAST(k_days - 1 AS DOUBLE) / k_days * ssq), 6)
            END AS ci_lo,
            CASE WHEN k_days >= 2 THEN round(ratio_raw + 1.959964
              * sqrt(CAST(k_days - 1 AS DOUBLE) / k_days * ssq), 6)
            END AS ci_hi
          FROM agg""",

    "q171_holdout_ab" ->
      """WITH u AS (SELECT user_id,
               CAST(md5_number_lower('ab:' || user_id) & 1 AS BIGINT) AS arm,
               CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
                    THEN 1 ELSE 0 END AS converted
             FROM events GROUP BY 1, 2),
          t AS (SELECT arm, count(*) AS n_users,
                 CAST(sum(converted) AS BIGINT) AS n_conv
                FROM u GROUP BY arm),
          w AS (SELECT
                 max(CASE WHEN arm = 0 THEN n_users END) AS n0,
                 max(CASE WHEN arm = 0 THEN n_conv END) AS c0,
                 max(CASE WHEN arm = 1 THEN n_users END) AS n1,
                 max(CASE WHEN arm = 1 THEN n_conv END) AS c1
                FROM t)
          SELECT n0, c0, n1, c1,
            round(CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS rate0,
            round(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS rate1,
            CASE WHEN c0 + c1 > 0 AND (n0 - c0) + (n1 - c1) > 0 THEN
              round(CAST(n0 + n1 AS DOUBLE)
                * pow(CAST(c0 AS DOUBLE) * CAST(n1 - c1 AS DOUBLE)
                    - CAST(n0 - c0 AS DOUBLE) * CAST(c1 AS DOUBLE), 2)
                / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
                   * CAST(c0 + c1 AS DOUBLE) * CAST((n0 - c0) + (n1 - c1) AS DOUBLE)),
                4) END AS chi2
          FROM w""",

    "q202_bootstrap_ci" ->
      """WITH e AS (SELECT event_type, event_id,
               CAST(floor(value * 100) AS BIGINT) AS c FROM events),
          x AS (SELECT event_type, b, c,
                 CAST(md5_number_lower('bs:' || event_id || ':' || b)
                   & 9007199254740991 AS DOUBLE) / 9007199254740992.0 AS u
                FROM e, range(0, 40) t(b)),
          kk AS (SELECT event_type, b, c,
                 CASE WHEN u < 0.36787944117144233 THEN 0
                      WHEN u < 0.7357588823428847 THEN 1
                      WHEN u < 0.9196986029286058 THEN 2
                      WHEN u < 0.9810118431238462 THEN 3
                      WHEN u < 0.9963401531726563 THEN 4
                      WHEN u < 0.9994058151824183 THEN 5
                      ELSE 6 END AS k
                FROM x),
          r AS (SELECT event_type, b,
                 round(CAST(sum(k * c) AS DOUBLE) / CAST(sum(k) AS BIGINT), 6)
                   AS rep_mean
                FROM kk GROUP BY 1, 2),
          o AS (SELECT event_type, rep_mean,
                 CAST(row_number() OVER (PARTITION BY event_type
                   ORDER BY rep_mean, b) AS BIGINT) AS rn FROM r),
          ci AS (SELECT event_type,
                  max(CASE WHEN rn = 1 THEN rep_mean END) AS ci_lo,
                  max(CASE WHEN rn = 39 THEN rep_mean END) AS ci_hi
                 FROM o GROUP BY 1),
          base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                    round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS mean
                   FROM e GROUP BY 1)
          SELECT event_type, n, mean, ci_lo, ci_hi
          FROM ci JOIN base USING (event_type) ORDER BY event_type""",

    "q203_diff_in_diff" ->
      """WITH d AS (SELECT min(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)
               AS mn, max(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS mx
             FROM events),
          p AS (SELECT CAST(md5_number_lower('ab:' || user_id) & 1 AS BIGINT)
                   AS arm,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                   >= (SELECT (mn + mx + 1) // 2 FROM d) AS post,
                 CAST(floor(value * 100) AS BIGINT) AS c
                FROM events WHERE event_type = 'purchase'),
          cells AS (SELECT arm, post, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(c) AS BIGINT) AS sc FROM p GROUP BY 1, 2),
          m AS (SELECT arm, post, n, CAST(sc AS DOUBLE) / n AS m FROM cells),
          w AS (SELECT CAST(sum(n) AS BIGINT) AS n_purchases,
                 max(CASE WHEN arm = 1 AND NOT post THEN m END) AS treat_pre,
                 max(CASE WHEN arm = 1 AND post THEN m END) AS treat_post,
                 max(CASE WHEN arm = 0 AND NOT post THEN m END) AS ctrl_pre,
                 max(CASE WHEN arm = 0 AND post THEN m END) AS ctrl_post
                FROM m)
          SELECT n_purchases, round(treat_pre, 6) AS treat_pre,
                 round(treat_post, 6) AS treat_post,
                 round(ctrl_pre, 6) AS ctrl_pre,
                 round(ctrl_post, 6) AS ctrl_post,
                 round((treat_post - treat_pre) - (ctrl_post - ctrl_pre), 6)
                   AS did_cents
          FROM w""",

    "q207_cuped" ->
      """WITH d AS (SELECT min(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)
               AS mn, max(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS mx
             FROM events),
          p AS (SELECT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                   >= (SELECT (mn + mx + 1) // 2 FROM d) AS post,
                 CAST(floor(value * 100) AS BIGINT) AS c
                FROM events WHERE event_type = 'purchase'),
          pu AS (SELECT user_id,
                  CAST(sum(CASE WHEN NOT post THEN c ELSE 0 END) AS BIGINT)
                    AS x,
                  CAST(sum(CASE WHEN post THEN c ELSE 0 END) AS BIGINT) AS y,
                  CAST(md5_number_lower('ab:' || user_id) & 1 AS BIGINT)
                    AS arm
                 FROM p GROUP BY user_id),
          mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy FROM pu),
          mm AS (SELECT n, CAST(sx AS DOUBLE) / n AS mx,
                  CAST(sy AS DOUBLE) / n AS my, CAST(sxy AS DOUBLE) / n AS mxy,
                  CAST(sxx AS DOUBLE) / n AS mxx, CAST(syy AS DOUBLE) / n AS myy
                 FROM mom),
          cv AS (SELECT mx, mxy - mx * my AS cxy, mxx - mx * mx AS vx,
                  myy - my * my AS vy FROM mm),
          th AS (SELECT mx, cxy / vx AS theta,
                  cxy * cxy / (vx * vy) AS rho2 FROM cv),
          a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(x) AS BIGINT) AS ax, CAST(sum(y) AS BIGINT) AS ay
                FROM pu GROUP BY arm)
          SELECT arm, n_users,
            round(CAST(ay AS DOUBLE) / n_users, 6) AS mean_post,
            round(CAST(ay AS DOUBLE) / n_users - theta *
              (CAST(ax AS DOUBLE) / n_users - mx), 6) AS adj_mean,
            round(theta, 6) AS theta, round(rho2, 6) AS rho2
          FROM a, th ORDER BY arm""",

    "q208_mann_whitney" ->
      """WITH p AS (SELECT CAST(md5_number_lower('ab:' || user_id) & 1
                   AS BIGINT) AS arm,
                 CAST(floor(value * 100) AS BIGINT) AS c
                FROM events WHERE event_type = 'purchase'),
          bv AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt,
                  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS cnt1
                 FROM p GROUP BY c),
          r AS (SELECT cnt, cnt1,
                 CAST(coalesce(sum(cnt) OVER (ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS rank_before
                FROM bv),
          agg AS (SELECT
                 CAST(sum(cnt1 * (2 * rank_before + cnt + 1)) AS BIGINT)
                   AS two_r1,
                 CAST(sum(cnt1) AS BIGINT) AS n1,
                 CAST(sum(cnt) AS BIGINT) AS nn,
                 CAST(sum(cnt * (cnt - 1) * (cnt + 1)) AS BIGINT) AS tie
                FROM r),
          d AS (SELECT n1, nn - n1 AS n2, nn,
                 (CAST(two_r1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1))
                   / 2.0 AS u1,
                 CAST(n1 AS DOUBLE) * (nn - n1) / 2.0 AS mu,
                 CAST(n1 AS DOUBLE) * (nn - n1) / 12.0 *
                   (CAST(nn + 1 AS DOUBLE) - CAST(tie AS DOUBLE) /
                     (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE))) AS vu
                FROM agg)
          SELECT n1, n2, round(u1, 6) AS u1,
                 round((u1 - mu) / sqrt(vu), 6) AS z
          FROM d""",

    "q211_sprt" ->
      """WITH p AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                   AS day,
                 event_type = 'purchase' AS conv
                FROM events
                WHERE CAST(md5_number_lower('ab:' || user_id) & 1
                  AS BIGINT) = 1),
          d AS (SELECT day, CAST(count(*) AS BIGINT) AS trials,
                 CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT)
                   AS conversions
                FROM p GROUP BY day),
          c AS (SELECT day, trials, conversions,
                 round(sum(CAST(conversions AS DOUBLE) * ln(0.25 / 0.2) +
                   CAST(trials - conversions AS DOUBLE) * ln(0.75 / 0.8))
                   OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS llr
                FROM d)
          SELECT day, trials, conversions, llr,
            CASE WHEN llr >= ln(19.0) THEN 'accept_h1'
                 WHEN llr <= -ln(19.0) THEN 'accept_h0'
                 ELSE 'continue' END AS decision
          FROM c ORDER BY day""",

    "q245_ipw_ate" ->
      """WITH d AS (SELECT min(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)
               AS mn, max(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS mx
             FROM events),
          p AS (SELECT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                   >= (SELECT (mn + mx + 1) // 2 FROM d) AS post,
                 CAST(floor(value * 100) AS BIGINT) AS c
                FROM events WHERE event_type = 'purchase'),
          pu AS (SELECT user_id,
                  CAST(sum(CASE WHEN NOT post THEN c ELSE 0 END) AS BIGINT)
                    AS x,
                  CAST(sum(CASE WHEN post THEN c ELSE 0 END) AS BIGINT) AS y,
                  CAST(md5_number_lower('ab:' || user_id) & 1 AS BIGINT)
                    AS arm
                 FROM p GROUP BY user_id),
          sq AS (SELECT y, arm,
                  CAST(ntile(5) OVER (ORDER BY x, user_id) AS BIGINT)
                    AS stratum
                 FROM pu),
          g AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_treat,
                 CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT)
                   AS sy1,
                 CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT)
                   AS sy0
                FROM sq GROUP BY stratum),
          v AS (SELECT stratum, n_users, n_treat, n_users - n_treat AS n_ctrl,
                 sy1, sy0, CAST(n_treat AS DOUBLE) / n_users AS e
                FROM g WHERE n_treat > 0 AND n_users - n_treat > 0),
          a AS (SELECT CAST(count(*) AS BIGINT) AS n_strata_used,
                 CAST(sum(n_treat) AS BIGINT) AS n_treat,
                 CAST(sum(n_ctrl) AS BIGINT) AS n_ctrl,
                 sum(CAST(sy1 AS DOUBLE) / e) AS t1,
                 sum(CAST(n_treat AS DOUBLE) / e) AS w1,
                 sum(CAST(n_treat AS DOUBLE) / (e * e)) AS w1b,
                 sum(CAST(sy0 AS DOUBLE) / (CAST(1 AS DOUBLE) - e)) AS t0,
                 sum(CAST(n_ctrl AS DOUBLE) / (CAST(1 AS DOUBLE) - e))
                   AS w0,
                 sum(CAST(n_ctrl AS DOUBLE) / ((CAST(1 AS DOUBLE) - e)
                   * (CAST(1 AS DOUBLE) - e))) AS w0b
                FROM v)
          SELECT n_strata_used, n_treat, n_ctrl,
            round(t1 / w1, 6) AS mean_treat_ipw,
            round(t0 / w0, 6) AS mean_ctrl_ipw,
            round(t1 / w1 - t0 / w0, 6) AS ate_ipw,
            round(w1 * w1 / w1b, 6) AS ess_treat,
            round(w0 * w0 / w0b, 6) AS ess_ctrl
          FROM a""",

    "q214_post_stratification" ->
      """WITH d AS (SELECT min(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)
               AS mn, max(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS mx
             FROM events),
          p AS (SELECT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                   >= (SELECT (mn + mx + 1) // 2 FROM d) AS post,
                 CAST(floor(value * 100) AS BIGINT) AS c
                FROM events WHERE event_type = 'purchase'),
          pu AS (SELECT user_id,
                  CAST(sum(CASE WHEN NOT post THEN c ELSE 0 END) AS BIGINT)
                    AS x,
                  CAST(sum(CASE WHEN post THEN c ELSE 0 END) AS BIGINT) AS y,
                  CAST(md5_number_lower('ab:' || user_id) & 1 AS BIGINT)
                    AS arm
                 FROM p GROUP BY user_id),
          sq AS (SELECT y, arm,
                  CAST(ntile(5) OVER (ORDER BY x, user_id) AS BIGINT)
                    AS stratum
                 FROM pu),
          g AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_treat,
                 CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT)
                   AS sy1,
                 CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT)
                   AS sy0
                FROM sq GROUP BY stratum),
          v AS (SELECT *, n_treat > 0 AND n_users - n_treat > 0 AS valid
                FROM g)
          SELECT stratum, n_users, n_treat,
            CASE WHEN n_treat > 0
              THEN round(CAST(sy1 AS DOUBLE) / n_treat, 6) END AS mean_treat,
            CASE WHEN n_users - n_treat > 0
              THEN round(CAST(sy0 AS DOUBLE) / (n_users - n_treat), 6)
              END AS mean_ctrl,
            CASE WHEN valid THEN round(CAST(sy1 AS DOUBLE) / n_treat -
              CAST(sy0 AS DOUBLE) / (n_users - n_treat), 6) END AS ate_s,
            round(sum(CASE WHEN valid THEN (CAST(sy1 AS DOUBLE) / n_treat -
                CAST(sy0 AS DOUBLE) / (n_users - n_treat)) * n_users
                ELSE 0.0 END)
                OVER (ORDER BY stratum ROWS BETWEEN UNBOUNDED PRECEDING
                  AND UNBOUNDED FOLLOWING) /
              sum(CASE WHEN valid THEN n_users ELSE 0 END)
                OVER (ORDER BY stratum ROWS BETWEEN UNBOUNDED
                PRECEDING AND UNBOUNDED FOLLOWING), 6) AS ate_weighted
          FROM v ORDER BY stratum""",

    "q219_mde_power" ->
      """WITH pu AS (SELECT user_id,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y,
               CAST(md5_number_lower('ab:' || user_id) & 1 AS BIGINT) AS arm
             FROM events WHERE event_type = 'purchase' GROUP BY user_id),
          g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(y * y) AS BIGINT) AS syy FROM pu),
          m AS (SELECT n1 AS n_treat, n - n1 AS n_ctrl, n,
                 CAST(sy AS DOUBLE) / n AS my,
                 (CAST(syy AS DOUBLE) / n -
                   (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) *
                   (CAST(n AS DOUBLE) / (n - 1)) AS s2
                FROM g)
          SELECT n_treat, n_ctrl, round(my, 6) AS mean_cents,
            round(sqrt(s2), 6) AS sd_cents,
            round((1.959964 + 0.841621) * sqrt(s2 *
              (1.0 / n_treat + 1.0 / n_ctrl)), 6) AS mde_abs_cents,
            round((1.959964 + 0.841621) * sqrt(s2 *
              (1.0 / n_treat + 1.0 / n_ctrl)) / my, 6) AS mde_rel
          FROM m""",
  )
}
