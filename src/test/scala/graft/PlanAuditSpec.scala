package graft

import org.scalatest.funsuite.AnyFunSuite

/** Automated scale audit over the FULL query inventory: no query may
  * plan an unbounded cartesian/nested-loop join except the documented
  * broadcast brute-force baselines, and parquet scans must prune
  * columns. This is the regression net for the 100 TB design claims —
  * a new query that accidentally cross-joins fails here, not in
  * production.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  // documented exceptions: broadcast nested-loop is intentional where
  // one side is a scalar/tiny broadcast or the query IS the exact
  // all-pairs validation harness (q37; q36 and q118 broadcast the
  // 10-row query side — q118's corpus side is the compressed PQ-code
  // scan, which is the point; q11's scalar subquery is a 1-row cross)
  private val nestedLoopAllowed = Set(
    "q11_scalar_subquery", "q36_ann_topk", "q37_embedding_neardup",
    "q118_pq_ann",
    // q124 crosses against the broadcast ONE-ROW (vmin, vmax) scalar agg
    "q124_quantile_sketch",
    // q135 crosses against the broadcast ONE-ROW bigram total (same
    // pattern as q124's bounds row)
    "q135_pmi_collocations",
    // q151 crosses the |sources|-row (<= 20) vector table against its
    // own broadcast — the q102 matrix posture, bounded by sources^2
    "q151_source_divergence",
    // q158 embeds q36 (the exact baseline being audited) verbatim,
    // inheriting its documented broadcast-of-10-queries cross
    "q158_ann_recall_audit",
    // q161 pairs the <=|sources|-row sketch table against its own
    // broadcast under src_a < src_b (the q151 matrix posture); data
    // only ever shuffles in the one token scan that built the sketches
    "q161_kmv_overlap",
    // q163 crosses against the broadcast ONE-ROW (mn, mx, n) bounds
    // row — q124's pattern
    "q163_equifreq_bins",
    // q169 crosses its 1-row funnel aggregate against the broadcast
    // ONE-ROW key count — two scalars meeting, not data
    "q169_bloom_join",
    // q172 crosses the |types|^2-bounded pair table against the
    // broadcast ONE-ROW basket total (q124's bounds pattern)
    "q172_basket_rules",
    // q174 crosses the |days|-row spine against the broadcast 256-row
    // register-cell range — days x 256 bounded, no corpus rows
    "q174_cumulative_distinct",
    // q176/q177/q178 cross tiny fixed-row reports against broadcast
    // ONE-ROW totals (q124's bounds pattern) — scalars meeting scalars
    "q176_benford_audit", "q177_dq_report", "q178_joinsize_sketch",
    // q182 crosses its 1-row DCG against the broadcast 1-row IDCG
    "q182_bm25_ndcg",
    // q225 crosses literal-sized coalition tables: |channels| (<= 12)
    // x 2^|channels| rows and the <= 2^n exact-set table against their
    // own broadcasts — the corpus collapsed in the one user shuffle
    // upstream; every nested-loop input is bounded by the factorial
    // table's n <= 12
    "q225_shapley_attribution",
    // q187's summary row crosses four broadcast ONE-ROW counts
    "q187_knn_graph_stats",
    // q190 crosses the pair table against two broadcast ONE-ROW totals
    "q190_pmi_pairs",
    // q194/q195 cross class/token cells against broadcast ONE-ROW totals
    "q194_ctfidf_keywords", "q195_token_burstiness",
    // q185/q188's Quantile.ranked (global grouping) crosses against
    // the broadcast ONE-ROW (mn, mx) bounds row — q124's pattern
    "q185_decile_lift", "q188_gini_concentration",
    // q208/q209/q214 ride the same global-grouping Quantile bounds
    // cross; q207 crosses per-arm rows against the broadcast ONE-ROW
    // pooled-moments row; q210 crosses the gram/doc tables against the
    // broadcast 16-ROW checkpoint table
    "q207_cuped", "q208_mann_whitney", "q209_lorenz_curve",
    "q210_heaps_law", "q214_post_stratification",
    // q245 rides q214's exact Quantile plan (the global-grouping
    // bounds cross) with a different 5-row readout fold
    "q245_ipw_ate",
    // q216 crosses the corpus against the broadcast 10-query sample x
    // 3-row dim table (q36's audited brute-harness posture); q217
    // crosses the |days| spine against the broadcast 2-row lag table
    "q216_mrl_truncation", "q217_revenue_autocorr",
    // q220 crosses the |sources|-row centroid table against its own
    // broadcast copy — |sources|^2 bounded (q151/q161's matrix shape)
    "q220_source_semantic_matrix",
    // q221 crosses the verified pair set against the broadcast 4-row
    // threshold table (bounded explode, both report branches)
    "q221_dedup_threshold_sweep",
    // q230 crosses the bigram-type table against the broadcast ONE-ROW
    // type total (q135's bounds pattern)
    "q230_kneser_ney",
    // q247 scores against q230's type table and inherits the same
    // broadcast 1-row type-total cross
    "q247_kn_perplexity",
    // q250 holds out the eval split against the train-split type
    // table — the same broadcast 1-row type-total cross as q247
    "q250_kn_heldout",
    // q231 crosses the |days|-bounded daily table against its own
    // broadcast under d1 < d2 (q184's bounded pair posture) plus the
    // 1-row readout folds — SF-invariant, never corpus rows
    "q231_mann_kendall",
    // q236 pairs the <=|sources|-row sketch table against its own
    // broadcast under src != src (q161's matrix posture); grams only
    // ever shuffle in the one scan that built the sketches
    "q236_kmv_unique_vocab",
    // q239 crosses the |days|-row replicate table against broadcast
    // ONE-ROW totals/mean (q124's bounds pattern)
    "q239_jackknife_ratio",
    // q240 crosses its 1-row match rollup against the broadcast
    // ONE-ROW arm counts (q124's bounds pattern); the candidate join
    // itself is EQUI on caliper buckets
    "q240_matched_att",
    // q249 crosses the corpus against the broadcast |labels|-row
    // centroid table (q216's audited posture) — the whole point of
    // the centroid simplification is avoiding the O(n^2) pair sum
    "q249_label_silhouette")

  test("no unplanned cartesian products or nested-loop joins") {
    val offenders = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Exception => fail(s"$name failed to plan: $e") }
      val hasNlj = plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct")
      if (hasNlj && !nestedLoopAllowed.contains(name))
        offenders += s"$name:\n$plan"
    }
    val bad = offenders.result()
    assert(bad.isEmpty,
      s"unexpected nested-loop/cartesian joins in:\n${bad.map(_.takeWhile(_ != '\n')).mkString("\n")}")
  }

  test("parquet scans prune columns on the relational tier") {
    // q01 projects 4 lineitem columns; the scan must not read all 16
    val plan = SparkEntry.queries("q01_groupby_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    val scanCols = "FileScan parquet \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(scanCols.nonEmpty, s"no FileScan in plan:\n$plan")
    assert(scanCols.forall(_.split(",").length <= 8),
      s"scan reads too many columns: $scanCols")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "filter not pushed to the parquet scan")
  }

  // Worst ACTUAL width per table across all 78 queries (surveyed at
  // round 7): lineitem 6 of 16, events 5, nation/orders/supplier/
  // documents 3, everything else 2. A query that forgets to project —
  // reading all 16 lineitem columns for a 2-column aggregate — is a
  // 100 TB defect (scan bytes scale with width) and fails here.
  private val maxScanCols = Map(
    "lineitem" -> 6, "events" -> 5).withDefaultValue(4)

  test("every parquet scan in every query prunes to the columns it uses") {
    val re = "FileScan parquet \\[([^\\]]*)\\][^\\n]*file:([^,\\]\\n]*)".r
    val offenders = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      re.findAllMatchIn(plan).foreach { m =>
        val width = m.group(1).split(",").length
        val table = m.group(2).split("/").last.stripSuffix(".parquet")
        if (width > maxScanCols(table))
          offenders += s"$name scans $width columns of $table (cap ${maxScanCols(table)})"
      }
    }
    assert(offenders.result().isEmpty,
      s"unpruned scans:\n${offenders.result().mkString("\n")}")
  }

  test("per-row kernels evaluate above the range sort, not below it") {
    // A per-row query shaped select(id, expensive).orderBy(id) plans
    // the expensive projection BELOW the range exchange: the range
    // partitioner's sampling job then evaluates every kernel just to
    // sample the sort key, and the shuffle carries rendered output
    // instead of raw inputs (measured 2x on q77 at sf0.1). The
    // orderBy-first shape keeps kernels above the Sort. This audit
    // pins that for every single-exchange query that range-sorts raw
    // source columns: no static_invoke kernel may appear below the
    // rangepartitioning exchange. Queries sorting computed values
    // (aggregates, join outputs, window ranks) have >1 exchange or no
    // kernels and fall outside the rule by construction.
    val offenders = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val lines = fn(spark, sf).queryExecution.executedPlan.toString.linesIterator.toVector
      val exchanges = lines.zipWithIndex.filter(_._1.contains("Exchange "))
      exchanges match {
        case Vector((line, idx)) if line.contains("rangepartitioning") =>
          val below = lines.drop(idx + 1).filter(_.contains("static_invoke"))
          if (below.nonEmpty)
            offenders += s"$name: ${below.size} kernel line(s) below the range exchange"
        case _ => // multi-exchange / hash-partitioned / kernel-free: out of scope
      }
    }
    assert(offenders.result().isEmpty,
      s"kernels evaluated below the range sort in:\n${offenders.result().mkString("\n")}")
  }

  // The README's "single codegen'd projection, zero data shuffles"
  // claim for the per-row signal family, pinned mechanically: these
  // queries may plan NO hash-partitioning exchange — the only allowed
  // exchange is the presentation sort's range partitioning. A refactor
  // that sneaks a groupBy/join into a per-row signal fails here.
  private val perRowQueries = Seq(
    "q32_canonical_fingerprint", "q33_quality_score", "q34_lang_id",
    "q35_token_count", "q39_rolling_fingerprint", "q40_multimodal_features",
    "q83_stratified_split", "q87_pii_redact", "q89_repetition_stats",
    "q92_quality_filter", "q95_char_entropy")

  test("per-row signal queries plan zero data shuffles") {
    val offenders = Seq.newBuilder[String]
    perRowQueries.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      if (plan.contains("Exchange hashpartitioning"))
        offenders += s"$name plans a hash exchange"
      val ranges = "Exchange rangepartitioning".r.findAllIn(plan).size
      if (ranges > 1) offenders += s"$name plans $ranges range exchanges"
    }
    assert(offenders.result().isEmpty,
      s"per-row queries with data shuffles:\n${offenders.result().mkString("\n")}")
  }

  // Queries whose Scaladoc claims "ONE data shuffle": pinned as a total
  // exchange budget (the one data exchange + the presentation sort's
  // range exchange; q106 is explode-only so just the sort). At 100 TB
  // each extra exchange is a full rewrite of the data — a refactor that
  // splits the reused partitioning (e.g. q85's window/groupBy no longer
  // sharing the user_id hash) fails here, not in production.
  private val exchangeBudget = Map(
    "q15_hourly_agg" -> 2, "q30_exact_dedup" -> 2, "q84_vocab_topk" -> 2,
    "q85_sessionize" -> 2,
    // q88/q101: Quantile.prefixSum's bounded-bucket passes replace
    // the per-shard/per-lang running-sum window that serialized each
    // shard into one partition. (Round 13 bumped every Quantile rider
    // by one exchange: the level-3 per-subcell span pass that
    // dissolves the heavy-co-celled-value residual — see
    // operators/Quantile.scala pass 2.)
    "q88_sequence_pack" -> 7,
    "q101_token_budget_fill" -> 7, "q106_chunk_windows" -> 1,
    "q107_asof_join" -> 2,
    // q109: lang-count agg + the tiny counts window + presentation
    // sort — the corpus itself never hash-shuffles
    "q109_mixture_materialize" -> 3,
    // q111: pair agg + token rollup (MinKAgg bounded state) + sort
    "q111_inverted_index" -> 3,
    // q112: (doc,term) agg + df window + doc rollup; top-20 is
    // TakeOrderedAndProject, no sort exchange
    "q112_bm25_topk" -> 3,
    // q113: bucket equi-join (broadcast at this sf; 2 more exchanges
    // allowed for the SMJ form real stats would pick) + rollup + sort
    "q113_range_join" -> 4,
    // q135: bigram-type agg + a/b marginal windows over the SMALL
    // type table + broadcast-total (no exchange) — pair-type scale
    "q135_pmi_collocations" -> 5,
    // q136: trigram stream shuffles twice (hash(c) shared by three
    // windows, hash(a,b) for the context) + doc rollup + sort
    "q136_stupid_backoff" -> 4,
    // q138: user shuffle (window + dedup share it) + matrix agg + sort
    "q138_cohort_retention" -> 3,
    // q139: ONE user shuffle + the single-row rollup
    "q139_event_funnel" -> 2,
    // q142: the user shuffle + Quantile's exact-rank passes (bounds
    // agg, per-cell stats agg, bucket-count agg, rank buckets — every
    // partition (measure, cell)-bounded) + the 1-row report fold; the
    // corpus-scale collect_list-into-one-row is gone
    "q142_funnel_latency" -> 8,
    // q140: (user,day) dedup + day agg + (user,wday) dedup + wday agg
    // + the tiny agg join + sort — everything after the first dedup is
    // (users x days)-bounded
    "q140_rolling_active" -> 6,
    // q141: user window + pair agg + marginal window + sort
    "q141_event_transitions" -> 4,
    // q144: shard groupBy + presentation sort — the z-value itself is
    // map-side bit math, shard assignment never shuffles
    "q144_zorder_layout" -> 2,
    // q145: fact + 8x-replicated dim shuffles for the salted hash
    // join, then the bounded groupBy + sort
    "q145_salted_join" -> 4,
    // q147: 256-cell count agg + its single-partition cumsum window
    // (256 rows) + the bin rollup + sort; the cell->bin map rides a
    // BroadcastExchange so data rows never shuffle for the join
    "q147_balanced_shards" -> 4,
    // q148: (type,day) count agg + the hash(type) windows (mean, cum,
    // runmin, peak all share it) + sort — the raw stream shuffles once
    "q148_cusum_anomaly" -> 3,
    // q149: user-timeline window + day rollup + sort
    "q149_attribution" -> 3,
    // q150: (type,day) count agg + per-type sum rollup + sort
    "q150_daily_trend" -> 3,
    // q152: map-only draw; the row-gather join (broadcast at this sf,
    // 2 more allowed for the SMJ real stats would pick) + sort
    "q152_negative_sampling" -> 4,
    // q153: three count aggs + three 1-row rollups feeding the union
    "q153_skew_report" -> 6,
    // q155: the projection pass is map-only with the mean/component as
    // plan literals — just the presentation sort (the mean/Gramian
    // passes are memoized control-plane, not part of this plan)
    "q155_pca_project" -> 1,
    // q156: ONE doc_id hash shuffle (the keep-latest window) + the
    // presentation sort; at 100 TB both merge sides live bucketed on
    // doc_id and even that shuffle disappears
    "q156_apply_changes" -> 2,
    // q157: ONE source token-count shuffle collapses the corpus to
    // |sources| rows; the water-filling windows and sort run on that
    // tiny single-partition table (q147's cumsum posture)
    "q157_mixture_waterfill" -> 4,
    // q159: the event stream collapses ONCE to (type,day) cells; the
    // two order-statistic aggregates reuse that hash(type,day)->
    // hash(type) chain and their results ride BroadcastExchanges back
    "q159_mad_outliers" -> 4,
    // q160: the ONE token->register agg; every later exchange moves
    // <=256-cells-per-source sketch rows
    "q160_sketch_rollup" -> 3,
    // q161: the ONE distinct-token scan builds the sketches; the pair
    // stage and audit ride the sources-bounded sketch/type tables
    "q161_kmv_overlap" -> 3,
    // q162: the salt-partitioned local-skyline window + the survivor
    // stage (global window + presentation sort on frontier-sized data)
    "q162_skyline" -> 2,
    // q163: 256-cell histogram agg + its single-partition cumsum +
    // bin rollup — the corpus itself shuffles once (q147's posture)
    "q163_equifreq_bins" -> 3,
    // q164: ONE doc-rollup agg; top-k is TakeOrderedAndProject and the
    // rank window runs on the k-row result
    "q164_weighted_sample" -> 1,
    // q165: the dow partial-agg shuffle + tiny-table presentation
    "q165_pivot_matrix" -> 3,
    // q166: ONE 1-row moments agg; the matrix unpivot is an explode
    // over that row, no further movement
    "q166_corr_matrix" -> 1,
    // q167: token-count agg + the variant-bucket join shuffle — both
    // at vocabulary TYPE scale, never corpus rows
    "q167_fuzzy_join" -> 2,
    // q168: the ONE (type,day) cell agg; MA window + dow rollup reuse
    // the hash(event_type) chain on the calendar-bounded cell table
    "q168_seasonal_decompose" -> 3,
    // q169: map-only bloom probe, then the ONE audit-join shuffle of
    // survivors (the point: unflagged fact rows never move)
    "q169_bloom_join" -> 1,
    // q170: the ONE MinKAgg shuffle (3 longs of state per nation);
    // the unpack + rank run on <= k*|nations| rows, nation dim rides
    // a BroadcastExchange
    "q170_topk_bounded" -> 1,
    // q171: user rollup + 2-row arm agg + the 1-row pivot
    "q171_holdout_ab" -> 3,
    // q172: the ONE basket dedup shuffle feeds the in-basket pair
    // join; marginals/total ride broadcasts; + the tiny-table sort
    "q172_basket_rules" -> 3,
    // q173 (r16 form): the (col, value)-type rollup is CHECKPOINTED
    // (its one exchange + the single lineitem scan live in the
    // materialization job — VERDICT r15 #2: the r15 plan still scanned
    // lineitem twice because the isNotNull pushdown under the HLL
    // branch defeated ReuseExchange); the returned plan reads the
    // bounded type table and pays the per-col base agg + the (col,idx)
    // register agg + the cols-row estimate rollup. plans/r16 carries
    // both the final plan and the materialization plan (one scan).
    "q173_profile" -> 3,
    // q174: the (user,day) dedup + user first-seen rollup + the
    // (day,idx) register agg — the cumsum/prefix-max windows run on
    // days-bounded cell tables
    "q174_cumulative_distinct" -> 4,
    // q175: map-side isin filters; the per-(doc,phrase) and doc
    // rollups + the left-join spine are the only movement
    "q175_blocklist_filter" -> 3,
    // q176: the 9-cell digit agg + its 1-row total + the tiny sort
    "q176_benford_audit" -> 3,
    // q177: anti-join/agg shuffles per check, all bounded reports
    "q177_dq_report" -> 1,
    // q178: the ONE cms-grid cell agg + per-row rollup; exact-F2
    // audit reuses the token shuffle shape
    "q178_joinsize_sketch" -> 2,
    // q179: the ONE (type, bucket) partial agg + tiny sort
    "q179_props_variant" -> 2,
    // q180: the ONE group agg; share windows run on the 6-row table
    "q180_share_of_total" -> 2,
    // q181: the ONE user_id shuffle (lag/counter/rank/rollup all
    // reuse it) + the path count; top-10 is TakeOrdered
    "q181_session_paths" -> 2,
    // q182: the query-term (doc, term) agg + doc rollup; both
    // top-10s are TakeOrdered, the folds run on 10 rows
    "q182_bm25_ndcg" -> 2,
    // q183: the ONE 64-row manifest rollup; packing windows run on it
    "q183_compaction_plan" -> 2,
    // q184: the two (type, day) agg sides of the pair self-join
    // (ReuseExchange collapses them at runtime) + presentation sort;
    // the quadratic join runs on the bounded daily table
    "q184_ewma_anomaly" -> 3,
    // q185: scoring is map-only; the decile cut is Quantile's exact
    // distributed rank (4 bounded-bucket exchanges replace the former
    // corpus-wide single-partition ntile) — later stages run on 10
    // decile rows. r16: ntiled inlines the boundary computation
    // (Quantile passes 0-3 + the hot-bucket pick) under the broadcast
    // side, +1 exchange over the r15 count, but every one of them is a
    // bounded-table exchange and the full-input rank window (with its
    // full ranked-table checkpoint) is gone — the A/B measured
    // 5.63 -> 3.00 s at sf0.1
    "q185_decile_lift" -> 9,
    // q188: the per-user rollup + Quantile's exact-rank passes — the
    // two former global rank windows over |users| rows are gone
    "q188_gini_concentration" -> 8,
    // q186: the 10-cell bin agg + presentation sort
    "q186_calibration_bins" -> 2,
    // q189: the ONE quasi-identifier hash agg + presentation sort
    "q189_kanon_audit" -> 2,
    // q190: the positional pair join's doc_id exchange feeds the pair
    // agg; marginals/totals broadcast; top-20 is TakeOrdered
    "q190_pmi_pairs" -> 4,
    // q191: assignment is map-only (plan-literal centroids); the
    // Quantile exact-rank passes (cluster-partitioned windows would
    // funnel the corpus into k partitions) + broadcast cutoffs + sort
    "q191_cluster_outliers" -> 8,
    // q192: Quantile's exact-rank passes partitioned by (type, cell)
    // — raw events no longer funnel into |event_type| ~ 5 partitions;
    // the cutoff table broadcasts back + rollup + presentation sort
    "q192_winsorized_stats" -> 9,
    // q193: the per-user rollup + ONE unpivoted Quantile pass over
    // (dim, value, user) + the user_id pivot-back + 64-cell agg +
    // presentation sort — the three corpus-wide ntile windows are gone
    "q193_rfm_segments" -> 10,
    // q194: the (source, token) agg (class-total window reuses it) +
    // the vocab marginal agg + presentation sort; totals broadcast
    "q194_ctfidf_keywords" -> 3,
    // q195: the (doc, token) agg + vocab rollup; doc total broadcast
    "q195_token_burstiness" -> 2,
    // q196: the 64-cell dim agg + presentation sort
    "q196_embedding_dim_stats" -> 2,
    // q197: the (source, token) agg + |sources| rollup + sort
    "q197_source_diversity" -> 3,
    // q198: the token agg + the |vocab| rank window's single
    // partition; the OLS rollup rides on it
    "q198_zipf_fit" -> 2,
    // q199: the ONE custkey exchange (lag/cumsum/group/lead all reuse
    // it, every key starts with o_custkey) + presentation sort
    "q199_scd2_intervals" -> 2,
    // q200: dims broadcast; the (region, week) agg + the lag window's
    // region exchange + presentation sort
    "q200_wow_revenue" -> 3,
    // q201: the moments agg to |types| cells; allocation windows run
    // on that tiny table (single partition)
    "q201_neyman_allocation" -> 2,
    // q202: the |types| x 40 replicate agg + the base-mean agg; rank
    // windows run on 200 cells, base broadcast back
    "q202_bootstrap_ci" -> 2,
    // q203: the FOUR (arm, period) cells + the 1-row readout fold
    "q203_diff_in_diff" -> 2,
    // q204: the distinct-fingerprint aggs (two-phase distinct rewrite)
    "q204_capture_recapture" -> 2,
    // q205: map-only encode/decode/explode; only the presentation sort
    "q205_audio_pcm_windows" -> 1,
    // q235: the ZCR rollup is a higher-order fold over the kernel's
    // window array — no explode, no groupBy; only the presentation sort
    "q235_audio_noisiness" -> 1,
    // q123/q222: map-only PNG decode + bounded explode; only the
    // presentation sort (the image twins of q205)
    "q123_multimodal_frames" -> 1,
    "q222_image_row_stats" -> 1,
    // q223: the capped band-bucket agg + the pair distinct + sort —
    // the decode+dhash pass itself is shuffle-free (8 bytes/doc ship)
    "q223_image_dhash_neardup" -> 3,
    // q242: map-only JPEG Huffman+IDCT decode + bounded explode; only
    // the presentation sort (q222's plan with the codec swapped)
    "q242_jpeg_row_stats" -> 1,
    // q246: map-only DQT marker walk + quality inversion; only the
    // presentation sort exchanges
    "q246_jpeg_quality_triage" -> 1,
    // q243: q223's band/cap/pair plan over image_dhash of JPEG payloads
    "q243_jpeg_dhash_neardup" -> 3,
    // q206: the custkey rollup + the |duration|-cell agg + presentation
    // sort; survival windows run on the bounded duration table
    "q206_kaplan_meier" -> 3,
    // q207: the per-user rollup + the per-arm agg + presentation sort;
    // pooled moments broadcast back as a 1-row cross
    "q207_cuped" -> 3,
    // q208: the value-level agg + Quantile.prefixSum's bounded-cell
    // passes over it + the 1-row readout fold
    "q208_mann_whitney" -> 7,
    // q209: the per-user rollup + Quantile's exact-rank passes + the
    // 10-cell decile agg (windows run on it)
    "q209_lorenz_curve" -> 9,
    // q210: the gram first-occurrence agg + the 16-cell checkpoint
    // fold (doc side reuses the broadcast checkpoints)
    "q210_heaps_law" -> 2,
    // q211: the |days| cell agg + presentation sort; the LLR window
    // runs on the bounded day table
    "q211_sprt" -> 2,
    // q212: the gram min agg + the gram join back + the per-doc
    // rollup/sort (token-volume bound, q94's family)
    "q212_ngram_novelty" -> 3,
    // q213: map-only regex counts; only the presentation sort
    "q213_readability" -> 1,
    // q214: the per-user rollup + Quantile's exact-rank passes + the
    // 5-cell stratum agg (windows run on it)
    "q214_post_stratification" -> 9,
    // q215: the custkey first-order rollup reused by the order join +
    // the (cohort x age) cell agg + cohort sizes broadcast + sort
    "q215_cohort_ltv" -> 4,
    // q216: the (qid, dim) top-5 windows + the hits/k rollups over
    // 30-cell tables + presentation sort (query/dim sides broadcast)
    "q216_mrl_truncation" -> 5,
    // q217: the |days| cell agg + the 2-cell lag rollup + sort
    "q217_revenue_autocorr" -> 3,
    // q218: the q31 band/verify edge build + degree agg; the five
    // PageRank rounds REUSE the edge/rank hash partitioning (AQE folds
    // the per-round joins onto the same exchanges), top-20 TakeOrdered
    "q218_dup_pagerank" -> 6,
    // q219: the per-user rollup + the 1-row moment fold
    "q219_mde_power" -> 2,
    // q244: the edge/degree tables are localCheckpoint'd (the q31
    // band/verify build pays its exchanges once, outside this plan);
    // downstream: the wedge/closing equi-joins reuse the checkpointed
    // partitioning, leaving the per-node census agg + the final
    // node join + the presentation sort
    "q244_triangle_census" -> 3,
    // q245: q214's plan — ONE user shuffle + Quantile's bounded-cell
    // ranking passes + the 5-row stratum agg and 1-row readout fold
    "q245_ipw_ate" -> 9,
    // q251: map-only kernel parse + the bounded (source x brand) agg;
    // the presentation sort folds onto its exchange — q226's shape
    "q251_mp4_triage" -> 2,
    // q248: the shingle-TYPE inverted-index agg feeds the fused
    // pair-count groupBy (bounded: sum C(df,2) <= 32*postings under
    // the df cap) and the anchor-side MinKAgg rollup; the per-doc
    // frequent-gram arrays and slim size joins broadcast (q82's
    // posture) and the TakeOrdered-style sort folds onto the MinK
    // exchange — never all-pairs
    "q248_hard_negatives" -> 2,
    // q249: the (label, dim) centroid agg + the centroid-array
    // rollup + the per-vector a/b agg + the |labels|-cell readout +
    // presentation sort
    "q249_label_silhouette" -> 5,
    // q247: the bigram-type agg (ca/na share its hash(a) exchange),
    // the hash(b) window, the (a, b) score join back onto the token
    // stream, the per-doc rollup + presentation sort
    "q247_kn_perplexity" -> 4,
    // q220: the (source, dim) centroid agg + the |sources| array
    // rollup + presentation sort; the pair join is broadcast
    "q220_source_semantic_matrix" -> 3,
    // q221: the q31 band/verify edge build feeding two report
    // branches (per-threshold pair agg; distinct-doc agg) + sort
    "q221_dedup_threshold_sweep" -> 4,
    // q230: the ONE bigram-type agg + the hash(b) marginal re-shuffle
    // (the a-marginals reuse the pair agg's partitioning); type total
    // broadcasts, top-20 is TakeOrdered
    "q230_kneser_ney" -> 2,
    // q231: the ONE |days| cell agg (pair cross, tie agg and readout
    // folds all ride broadcasts of it) + the pair table's bounded
    // median window
    "q231_mann_kendall" -> 2,
    // q232: the (type, arm) moment agg + the type pivot + the
    // |types|-row ranking windows' single partition
    "q232_fdr_bh" -> 3,
    // q233: the per-user rollup + Quantile's per-arm exact-rank passes
    // + the 10-cell decile agg (q214's rider posture)
    "q233_qte_deciles" -> 9,
    // q236: the ONE distinct (source, gram) scan -> sketch agg; the
    // rest-union explode/agg and the unique-gram audit run at sketch /
    // gram-TYPE scale
    "q236_kmv_unique_vocab" -> 4,
    // q234: the k selection scans are memoized control-plane (q114's
    // posture — map-only passes + TakeOrdered-1 argmaxes); the emitted
    // plan is the 8-row local table + its presentation sort
    "q234_kcenter_coreset" -> 1,
    // q237: the kNN edge build is localCheckpoint'ed once; the three
    // vote rounds reuse its partitioning (per-round vote join + agg +
    // degree-bounded majority window over the checkpoint) + the final
    // audit join + presentation sort
    "q237_label_propagation" -> 10,
    // q238: the (dow, arm) cell agg + the dow pivot + the 7-row
    // pooled-sum windows' single partition
    "q238_cmh_strata" -> 3,
    // q239: the ONE |days| cell agg; totals/mean/replicates all ride
    // broadcasts of it + the 1-row folds
    "q239_jackknife_ratio" -> 4,
    // q240: the ONE per-user rollup (treat/ctrl/arm-count branches all
    // reuse it); the bucket-banded candidate join is broadcast at this
    // sf and the best-match min(struct) agg map-side-combines
    "q240_matched_att" -> 2,
    // q241: the (type, day) cell agg + the shared hash(event_type)
    // window exchange + presentation sort
    "q241_page_hinkley" -> 3)

  // ──────────────────────────────────────────────────────────────────
  // The round-11 `weak` bug class, pinned mechanically: no query may
  // funnel corpus-scale rows into a single-partition (or merely
  // type-partitioned) window/sort — the global-ntile ceiling the
  // operators/Quantile rewrite removed. Detection walks the PHYSICAL
  // plan: a SinglePartition shuffle, or a Window partitioned only by
  // low-cardinality dimension keys, must sit on a provably BOUNDED
  // subtree — one where every path to a corpus-table scan passes an
  // aggregate grouped by bounded keys, a limit, or a broadcast.

  import org.apache.spark.sql.execution.{SparkPlan, FileSourceScanExec,
    LocalTableScanExec, TakeOrderedAndProjectExec, GlobalLimitExec,
    LocalLimitExec, CollectLimitExec}
  import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
  import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
  import org.apache.spark.sql.execution.window.WindowExec
  import org.apache.spark.sql.execution.aggregate.{HashAggregateExec,
    ObjectHashAggregateExec, SortAggregateExec}
  import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
  import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

  // dimension-like keys: bounded CARDINALITY (event types, sources,
  // calendar cells, report labels, score cells) — an agg grouped only
  // by these yields a bounded table, but a window partitioned ONLY by
  // these over raw corpus rows is exactly the q192 ceiling this rule
  // exists to catch
  private val dimKeyNames = Set("event_type", "source", "lang", "day",
    "dow", "wday", "week", "dim", "m", "bin", "decile", "cluster", "arm",
    "period", "check", "segment", "nation", "region", "b", "r_score",
    "f_score", "m_score", "from_type", "to_type", "next_type",
    "event_name", "l_returnflag", "l_linestatus",
    // round-13 additions, each a provably bounded domain: customer
    // lifetime in days (<= calendar span, q206), the fixed 16-row
    // corpus-prefix checkpoints (q210), ntile(5) strata (q214), and
    // order-calendar years / ages-in-years (q215)
    "duration", "ckpt", "stratum", "cohort_year", "age")
  // bucket keys: bounded per-partition SIZE by construction (range
  // cells, salt buckets, shard ids) — safe to partition a window by
  // over any input, and they bound an agg's output to |cells| rows
  private def isBucketKey(n: String): Boolean =
    n.startsWith("__q_") || n.startsWith("cell") || n.startsWith("bucket") ||
      n.startsWith("shard") || n.startsWith("salt") || n == "c1" || n == "c2"
  private def attrNames(es: Seq[Expression]): Seq[String] =
    es.flatMap(_.collect { case a: Attribute => a.name })
  private def boundedKeys(names: Seq[String]): Boolean =
    names.forall(n => dimKeyNames(n) || isBucketKey(n))

  // provably bounded subtree: every path from here to a corpus-table
  // scan passes a bounded-key aggregate, a limit, or a broadcast.
  // `credits` (nullable) records the grouping-name sets of every
  // aggregate this walk credits as bounding VIA THE NAME LIST — the
  // measured back-stop test executes those queries and asserts the
  // credited aggregates' actual output row counts, so a corpus-scale
  // column merely RENAMED to a dim key cannot drift through.
  private def boundedPlan(p: SparkPlan): Boolean = boundedPlanC(p, null)
  private def aggCredit(ges: Seq[Expression], child: SparkPlan,
      credits: scala.collection.mutable.Buffer[Seq[String]]): Boolean = {
    val names = attrNames(ges)
    if (ges.isEmpty) true
    else if (boundedKeys(names)) {
      if (credits != null && names.exists(dimKeyNames)) credits += names
      true
    } else boundedPlanC(child, credits)
  }
  private def boundedPlanC(p: SparkPlan,
      credits: scala.collection.mutable.Buffer[Seq[String]]): Boolean = p match {
    case a: HashAggregateExec =>
      aggCredit(a.groupingExpressions, a.child, credits)
    case a: ObjectHashAggregateExec =>
      aggCredit(a.groupingExpressions, a.child, credits)
    case a: SortAggregateExec =>
      aggCredit(a.groupingExpressions, a.child, credits)
    case _: TakeOrderedAndProjectExec | _: GlobalLimitExec |
         _: LocalLimitExec | _: CollectLimitExec => true
    case _: BroadcastExchangeExec => true
    case _: LocalTableScanExec => true
    case s: FileSourceScanExec =>
      val loc = s.relation.location.rootPaths.headOption
        .map(_.toString).getOrElse("")
      // only the true dimension tables are bounded at 100 TB
      loc.endsWith("region.parquet") || loc.endsWith("nation.parquet")
    case other =>
      other.children.nonEmpty &&
        other.children.forall(c => boundedPlanC(c, credits))
  }

  /** Offender descriptions for one physical plan (empty = clean). */
  private def singlePartOffenders(plan: SparkPlan): Seq[String] =
    plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition &&
            !boundedPlan(e.child) =>
        s"SinglePartition exchange over unbounded input (${e.child.nodeName})"
      case w: WindowExec
          if (w.partitionSpec.isEmpty ||
            (attrNames(w.partitionSpec).forall(dimKeyNames) &&
              !attrNames(w.partitionSpec).exists(isBucketKey))) &&
            !boundedPlan(w.child) =>
        val spec =
          if (w.partitionSpec.isEmpty) "global"
          else attrNames(w.partitionSpec).mkString(",")
        s"Window partitioned by [$spec] over unbounded input"
    }

  // queries whose flagged node is provably bounded by an argument the
  // walker cannot see — each with that argument, the nestedLoopAllowed
  // discipline
  private val singlePartAllowed: Map[String, String] = Map(
    "q128_stratified_sample" ->
      ("the rank window's input is filtered to prio <= the broadcast " +
        "k-th-lowest cutoff: <= k + md5-collision rows per stratum"),
    "q135_pmi_collocations" ->
      ("the marginal windows run on the bigram TYPE table (distinct " +
        "token pairs) — vocabulary-bounded, never corpus rows"),
    "q230_kneser_ney" ->
      ("q135's posture: the c(a)/N1+ marginal windows run on the " +
        "bigram TYPE table — vocabulary-bounded, never corpus rows " +
        "(the flag is the 'b' column name colliding with q202's " +
        "replicate-index dim key)"),
    "q247_kn_perplexity" ->
      ("q230's exact model-statistics windows (same TYPE-table input, " +
        "same 'b' name collision); the corpus-scale token stream only " +
        "ever meets the scored types in an equi-join"),
    "q250_kn_heldout" ->
      ("q247's model windows on the COMBINED train+eval bigram TYPE " +
        "table (conditional train counts) — vocabulary-bounded, same " +
        "'b' name collision; the eval token stream meets the types in " +
        "an equi-join only"),
    "q162_skyline" ->
      ("the global window runs on salt-bucket-local skyline survivors " +
        "— frontier-sized by the operator's contract (OperatorLawSpec " +
        "pins bucket-count invariance)"),
    "q194_ctfidf_keywords" ->
      ("the class-total and top-5 windows run on (source, token) " +
        "cells — |classes| x vocabulary, never raw token occurrences"),
    "q198_zipf_fit" ->
      ("the rank window runs on the |vocab| token-type table (the " +
        "corpus collapses in the preceding token agg); a string token " +
        "key has no integer order for the Quantile bucket form"))

  test("no corpus-scale single-partition or dim-partitioned window/sort") {
    val offenders = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val found = singlePartOffenders(fn(spark, sf).queryExecution.sparkPlan)
      if (found.nonEmpty && !singlePartAllowed.contains(name))
        offenders += s"$name: ${found.mkString("; ")}"
    }
    assert(offenders.result().isEmpty,
      s"corpus-scale narrow windows/sorts in:\n${offenders.result().mkString("\n")}")
  }

  // ── measured back-stop for the name-based classifier (round 13) ──
  // dimKeyNames is a hand-grown list; the structural walk trusts it.
  // The drift risk: a corpus-cardinality column RENAMED to "day" (or
  // any listed name) makes an aggregate grouped by it look bounding,
  // and a global window above that agg sails through. Back-stop: for
  // every query where the walk ACCEPTED a suspicious window/exchange
  // because of a dimKey-named aggregate, execute the query at test SF
  // and read that aggregate's actual numOutputRows metric — a credited
  // FINAL aggregate may not exceed the arity-aware row bound. Single
  // dim keys all have domains <= ~512 (event types, sources, deciles,
  // calendar days/weeks of the fixture span), so one key gets 512;
  // a PRODUCT of bounded dims multiplies (q200's (region, week) is
  // legitimately ~5 x 370 cells, SF-invariant), so multi-key aggs get
  // 4096. A corpus key sneaking in under a single dim name blows past
  // 512 (events alone is 1000 rows at sf0.001 and SCALES with SF while
  // true dims do not); the residual gap — a corpus key hiding inside a
  // multi-key agg under 4096 rows — is documented, not silent.
  private def dimAggRowBound(arity: Int): Long = if (arity <= 1) 512L else 4096L

  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(allNodes)
  }

  /** Grouping-name sets of dimKey aggregates the walk credits under a
    * suspicious (single-partition / dim-partitioned-window) node —
    * empty means nothing name-credited, so no execution needed. */
  private def dimCreditedSets(plan: SparkPlan): Seq[Seq[String]] = {
    val credits = scala.collection.mutable.Buffer.empty[Seq[String]]
    plan.foreach {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        boundedPlanC(e.child, credits)
      case w: WindowExec
          if w.partitionSpec.isEmpty ||
            (attrNames(w.partitionSpec).forall(dimKeyNames) &&
              !attrNames(w.partitionSpec).exists(isBucketKey)) =>
        boundedPlanC(w.child, credits)
      case _ =>
    }
    credits.distinct.toSeq
  }

  /** After execution: every FINAL-mode aggregate grouped solely by
    * dim-list names must have produced rows within the arity bound. */
  private def measuredDimAggOffenders(
      qe: org.apache.spark.sql.execution.QueryExecution): Seq[String] = {
    def check(ges: Seq[Expression], reqDist: Option[Seq[Expression]],
        metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric])
        : Seq[String] = {
      val names = attrNames(ges)
      if (ges.isEmpty || !names.forall(dimKeyNames) || reqDist.isEmpty) Nil
      else {
        val bound = dimAggRowBound(names.distinct.size)
        metrics.get("numOutputRows").map(_.value).filter(_ > bound)
          .map(n => s"dim agg [${names.mkString(",")}] produced $n rows" +
            s" (bound $bound)").toSeq
      }
    }
    allNodes(qe.executedPlan).flatMap {
      case a: HashAggregateExec => check(a.groupingExpressions,
        a.requiredChildDistributionExpressions, a.metrics)
      case a: ObjectHashAggregateExec => check(a.groupingExpressions,
        a.requiredChildDistributionExpressions, a.metrics)
      case a: SortAggregateExec => check(a.groupingExpressions,
        a.requiredChildDistributionExpressions, a.metrics)
      case _ => Nil
    }
  }

  test("name-credited bounded aggregates are ACTUALLY bounded at test SF") {
    val offenders = Seq.newBuilder[String]
    var executed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf)
      if (dimCreditedSets(df.queryExecution.sparkPlan).nonEmpty) {
        df.collect() // populate metrics on this QueryExecution
        executed += 1
        measuredDimAggOffenders(df.queryExecution)
          .foreach(o => offenders += s"$name: $o")
      }
    }
    assert(executed > 0, "no query exercises the name-credited path; " +
      "the back-stop is dead code — rewire it")
    assert(offenders.result().isEmpty,
      s"dim-named aggregates with corpus-scale output:\n${offenders.result().mkString("\n")}")
  }

  test("a corpus-scale column RENAMED to a dim key IS caught by the measured bound") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, sf).events
    // event_id is corpus-cardinality; name its agg key "day" and put a
    // global window on top — the exact drift the name list cannot see
    val g = ev.select(col("event_id").as("day"), col("value"))
      .groupBy(col("day")).agg(sum(col("value")).as("s"))
      .withColumn("r", row_number().over(W.orderBy(col("s"))))
    // the structural walk ALONE accepts it (the round-12 gap)...
    assert(singlePartOffenders(g.queryExecution.sparkPlan).isEmpty,
      "structural walk unexpectedly flags the canary (name list changed?)")
    assert(dimCreditedSets(g.queryExecution.sparkPlan).nonEmpty,
      "canary should be name-credited")
    // ...and the measured back-stop catches it
    g.collect()
    assert(measuredDimAggOffenders(g.queryExecution).nonEmpty,
      "renamed corpus key escaped the measured bound")
  }

  test("a deliberately reintroduced corpus-scale ntile/rank IS caught") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, sf).events
    // the exact shape the q185/q193 rewrite removed: global ntile
    val g = ev.withColumn("d",
      ntile(10).over(W.orderBy(col("value"), col("event_id"))))
    assert(singlePartOffenders(g.queryExecution.sparkPlan).nonEmpty,
      "global ntile over raw events escaped the detector")
    // ...and the q192 shape: a rank window partitioned only by type
    val t = ev.withColumn("rn", row_number().over(
      W.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))))
    assert(singlePartOffenders(t.queryExecution.sparkPlan).nonEmpty,
      "type-partitioned rank over raw events escaped the detector")
  }

  test("documented single-shuffle queries stay inside their exchange budget") {
    val offenders = Seq.newBuilder[String]
    exchangeBudget.foreach { case (name, budget) =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val n = "(?m)^\\s*\\+?-?\\s*Exchange ".r.findAllIn(plan).size
      if (n > budget) offenders += s"$name plans $n exchanges (budget $budget)"
    }
    assert(offenders.result().isEmpty,
      s"exchange budgets exceeded:\n${offenders.result().mkString("\n")}")
  }
}
