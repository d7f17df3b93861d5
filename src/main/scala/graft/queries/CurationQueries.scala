package graft.queries

import graft.Tables
import graft.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation family: splits, vocab, packing, decontam,
  * mixtures, budgets, reports, DAGs, chunking, snapshot diff,
  * manifests, compaction, sampling, k-anon, z-order, multimodal.
  *
  * Split from Pipeline.scala (round 12 housekeeping): query/oracle
  * entries only — every shared helper, memo cache and SQL CTE stays in
  * [[Pipeline]] (widened to private[queries]) so behavior and plan
  * shapes are byte-identical. */
private[graft] object CurationQueries {
  import Pipeline._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- corpus curation ----------------------------------------------
    "q83_stratified_split" -> { (s, dir) =>
      // Deterministic hash-based train/valid/test assignment: a doc's
      // split depends only on its id (md5 of "split:<id>", low 10 bits),
      // never on data order, partitioning, or cluster size — re-runs and
      // backfills land every doc in the same split, and a grown corpus
      // never reshuffles old docs across splits. 80/10/10 by bucket
      // threshold (819/922 of 1024); stratification across sources
      // follows from hash uniformity within each source (pinned by
      // PipelineSpec). Per-row kernel, no shuffle beyond the
      // presentation sort.
      val bucket = md5_lower64(concat(lit("split:"),
        col("doc_id").cast("string")).cast("binary")).bitwiseAND(lit(1023L))
      Tables(s, dir).documents
        .orderBy(col("doc_id"))
        .select(col("doc_id"), col("source"), bucket.as("bucket"),
          when(bucket < 819, "train").when(bucket < 922, "valid")
            .otherwise("test").as("split"))
    },


    "q144_zorder_layout" -> { (s, dir) =>
      // Z-ORDER (Morton) physical layout + zone maps — the data-layout
      // operator behind multi-dimensional scan pruning (the technique
      // Delta/Iceberg OPTIMIZE ZORDER applies; Morton 1966). Both keys
      // are min-max normalized to 16 bits, bit-interleaved into a
      // 32-bit z-value, and the top 4 bits of EACH dimension (zval >>
      // 24) name one of 256 grid cells = target shards. Output is the
      // shard-level zone map (row count + min/max of both keys and of
      // zval): a reader filtering on EITHER key can skip ~15/16 of the
      // shards from the zone map alone, vs no skipping on one of the
      // two keys under any single-column sort. Scale shape: bounds are
      // one 4-cell agg (driver moves 4 longs), the z-value is pure
      // map-side bit math in whole-stage codegen, shard assignment is
      // shuffle-FREE (no global sort, unlike ntile-based layout), and
      // the zone map is ONE groupBy over 256 groups. The real rewrite
      // is then write.partitionBy(shard_id) — same plan plus the sink.
      val li = Tables(s, dir).lineitem
      val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).head
      val (pmin, pspan) = (b.getLong(0), math.max(1L, b.getLong(1) - b.getLong(0)))
      val (smin, sspan) = (b.getLong(2), math.max(1L, b.getLong(3) - b.getLong(2)))
      zoneMaps(li, pmin, pspan, smin, sspan).orderBy(col("shard_id"))
    },


    "q147_balanced_shards" -> { (s, dir) =>
      // EQUI-DEPTH z-range sharding — q144's layout rebalanced: the
      // 256 equi-width z-cells carry skewed row counts whenever keys
      // cluster, so writers get unbalanced files. Here each z-cell is
      // assigned to one of 16 bins by its cumulative row count —
      // bin = floor(rows_before_cell * 16 / total) — which packs
      // consecutive cells until each bin holds ~1/16 of the data (what
      // repartitionByRange's sampler approximates; this rule is exact
      // and deterministic). Scale shape: one 256-cell count agg, a
      // window cumsum over those 256 rows (bounded — not a data-scale
      // global sort), and the cell->bin map joins back by BROADCAST,
      // so row assignment stays map-side. Bins stay range-contiguous
      // in z (zone maps still prune on both keys). Output: per-bin
      // zone map; the spec asserts the balance the equi-width grid
      // can't guarantee.
      val li = Tables(s, dir).lineitem
      val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).head
      val (pmin, pspan) = (b.getLong(0), math.max(1L, b.getLong(1) - b.getLong(0)))
      val (smin, sspan) = (b.getLong(2), math.max(1L, b.getLong(3) - b.getLong(2)))
      val xs = ((col("l_partkey") - lit(pmin)) * lit(65535L) / lit(pspan)).cast("long")
      val ys = ((col("l_suppkey") - lit(smin)) * lit(65535L) / lit(sspan)).cast("long")
      val z = li.select(morton16(xs, ys).as("zval"))
        .withColumn("cell", shiftright(col("zval"), 24))
      val cells = z.groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
      val wc = Window.orderBy(col("cell"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val binOf = cells
        .withColumn("cum", coalesce(sum(col("cnt")).over(wc), lit(0L)))
        .withColumn("tot", sum(col("cnt")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("cell"),
          floor(col("cum") * 16 / col("tot")).cast("long").as("bin"))
      z.join(broadcast(binOf), Seq("cell"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("zval")).as("z_min"), max(col("zval")).as("z_max"))
        .orderBy(col("bin"))
    },


    "q153_skew_report" -> { (s, dir) =>
      // JOIN-KEY SKEW diagnosis — the report that decides between a
      // plain hash join, AQE skew handling, and q145's explicit
      // salting: for each candidate key, distinct-key count, the
      // hottest key and its row count, and the hot task's load
      // multiple vs a perfectly uniform spread (max_cnt * n_keys /
      // n_rows — at 1000 executors a multiple of 50 means the hot
      // reducer runs 50x the average). NO global sort and no ranking
      // window: each key column is ONE count agg + ONE tiny rollup
      // (max + argmax via the (cnt, key) struct-max trick, order-free
      // and layout-deterministic); the three reports union into a
      // 3-row table. All-integer except the rounded multiple.
      def report(df: DataFrame, key: Column, name: String): DataFrame =
        df.groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
          .agg(lit(name).as("key_name"),
            sum(col("cnt")).as("n_rows"),
            count(lit(1)).as("n_keys"),
            max(struct(col("cnt"), col("k"))).as("m"))
          .select(col("key_name"), col("n_rows"), col("n_keys"),
            col("m.cnt").as("max_cnt"), col("m.k").as("hot_key"),
            round(col("m.cnt") * col("n_keys") /
              col("n_rows").cast("double"), 6).as("skew_multiple"))
      val e = Tables(s, dir).events
      val li = Tables(s, dir).lineitem
      report(e, col("user_id"), "events.user_id")
        .unionAll(report(li, col("l_partkey"), "lineitem.l_partkey"))
        .unionAll(report(li, col("l_suppkey"), "lineitem.l_suppkey"))
        .orderBy(col("key_name"))
    },


    "q154_split_leakage" -> { (s, dir) =>
      // TRAIN/TEST LEAKAGE audit — the contamination the q83 split
      // cannot see: a near-duplicate CLUSTER whose members land in
      // different splits leaks training text into eval (Lee et al.
      // 2022's core warning). Composition of two existing layers:
      // q143's star components over the verified near-dup graph,
      // joined to q83's hash-bucket split rule (map-only), rolled up
      // per cluster; output = only the leaky clusters with their split
      // spread. Scale shape: component labels are (doc_id, label)
      // pairs, the split is a per-row kernel, and the rollup is
      // bounded by the dup-graph size — the corpus itself never
      // shuffles beyond what the dup detection already paid.
      val comp = graft.operators.Components.components(
        minhashDupPairs(s, dir).select(col("doc_a").as("u"), col("doc_b").as("v")))
        .select(col("node").as("doc_id"), col("component").as("cluster_id"))
      val bucket = md5_lower64(concat(lit("split:"),
        col("doc_id").cast("string")).cast("binary")).bitwiseAND(lit(1023L))
      val sp = Tables(s, dir).documents.select(col("doc_id"),
        when(bucket < 819, "train").when(bucket < 922, "valid")
          .otherwise("test").as("split"))
      comp.join(sp, "doc_id")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col("split") === "valid", 1L).otherwise(0L)).as("n_valid"),
          sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
        .filter((when(col("n_train") > 0, 1).otherwise(0) +
          when(col("n_valid") > 0, 1).otherwise(0) +
          when(col("n_test") > 0, 1).otherwise(0)) > 1)
        .orderBy(col("cluster_id"))
    },


    "q152_negative_sampling" -> { (s, dir) =>
      // Deterministic NEGATIVE SAMPLING for contrastive training: 4
      // uniformly-hashed negatives per anchor doc over the dense
      // doc_id space, self-hits deflected to the next id — the pair
      // generator behind embedding/reranker training sets. Determinism
      // is the point: retries, resumed shards, and the oracle all draw
      // the SAME negatives because the draw is md5(anchor, k) mod n,
      // never rand(). Scale shape: |corpus| rides as a plan literal
      // (one memoized count), the draw is map-only explode x4, and the
      // only shuffle is the equi-join that fetches each negative's
      // row — at 100 TB that join is the unavoidable gather, and it's
      // hash-colocatable by pre-bucketing documents on doc_id.
      val docs = Tables(s, dir).documents
      val n: Long = memo(docCount, dir)(docs.count())
      val cand = pmod(
        md5_lower64(concat(lit("neg:"), col("doc_id").cast("string"),
          lit(":"), col("k").cast("string")).cast("binary"))
          .bitwiseAND(lit(Long.MaxValue)), lit(n))
      docs.select(col("doc_id"), explode(sequence(lit(0L), lit(3L))).as("k"))
        .withColumn("cand", cand)
        .withColumn("neg_id", when(col("cand") === col("doc_id"),
          pmod(col("cand") + 1, lit(n))).otherwise(col("cand")))
        .join(docs.select(col("doc_id").as("neg_id"),
          col("source").as("neg_source")), "neg_id")
        .select(col("doc_id"), col("k"), col("neg_id"), col("neg_source"))
        .orderBy(col("doc_id"), col("k"))
    },


    "q88_sequence_pack" -> { (s, dir) =>
      // Greedy sequence packing for training: walk each shard's docs in
      // doc_id order, accumulate token counts, and assign each doc to
      // the context-window bin its running offset falls in (bin =
      // tokens-before-me DIV budget — the doc that crosses a boundary
      // belongs to the bin it started in). A GLOBAL pack is inherently
      // serial, so the operator packs per shard (source) by design —
      // shards pack in parallel, and the running offset is the EXACT
      // distributed prefix sum (operators/Quantile.prefixSum: bucket
      // the doc_id order into range cells, cumulate per-cell token
      // totals over the bounded cell table, local running sum within
      // each cell) — a shard's docs never serialize into ONE window
      // partition, which is what `sum over (partition by source)` did.
      // Budget 256 tokens keeps multiple bins per shard at test scale;
      // at 100 TB budget is the model context and shards are whatever
      // corpus partitioning exists upstream.
      val base = Tables(s, dir).documents
        .select(col("doc_id"), col("source"),
          size(toks(col("text"))).cast("long").as("n_tokens"))
      graft.operators.Quantile.prefixSum(
          base, Seq("source"), "doc_id", "doc_id", "n_tokens")
        .select(col("doc_id"), col("source"), col("n_tokens"),
          expr("prev_cum DIV 256").as("bin"),
          (col("prev_cum") % 256).as("bin_offset"))
        .orderBy(col("doc_id"))
    },


    "q90_decontaminate" -> { (s, dir) =>
      // Benchmark decontamination: flag training docs sharing any
      // 3-gram shingle with the held-out eval split (doc_id % 20 == 0
      // here; in production the benchmark suite). The classic n-gram
      // overlap test (GPT-3 appendix C) as a BROADCAST semi-shape: the
      // eval corpus is tiny by construction, so its distinct shingle
      // set broadcasts and the 100 TB training side never shuffles —
      // only matched (doc_id, gram) rows reach the count aggregation.
      // Docs with zero overlap are absent (the common case at scale;
      // emitting them would be a full corpus rewrite).
      val sh = shingled(Tables(s, dir))
      val evalGrams = sh.filter(col("doc_id") % 20 === 0)
        .select(explode(col("sh")).as("g")).distinct()
      sh.filter(col("doc_id") % 20 =!= 0)
        .select(col("doc_id"), size(col("sh")).as("n_sh"),
          explode(col("sh")).as("g"))
        .join(broadcast(evalGrams), Seq("g"))
        .groupBy(col("doc_id"))
        // sh is distinct per doc, so plain count = distinct shared grams
        .agg(count(lit(1)).as("n_shared"), max(col("n_sh")).as("n_sh"))
        .select(col("doc_id"), col("n_shared"),
          (col("n_shared").cast("double") / col("n_sh")).as("contam_frac"))
        .orderBy(col("doc_id"))
    },


    "q91_mixture_sample" -> { (s, dir) =>
      // Temperature-flattened language mixture (multilingual-LM
      // sampling, tau = 0.5): keep-rate per language proportional to
      // p_lang^(tau-1), normalized so the rarest language keeps
      // everything — rate_l = sqrt(n_min / n_l) — with the inverse
      // rate emitted as an importance weight so downstream statistics
      // stay unbiased. Membership is decided by a doc_id hash, never by
      // position or partitioning, so re-runs and backfills keep the
      // same docs (q83's determinism argument). Plan shape: one tiny
      // per-language count (map-side partial agg), broadcast back, then
      // a pure per-row filter — the corpus itself never shuffles.
      val docs = Tables(s, dir).documents
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      // nmin attaches via an unpartitioned window over the per-language
      // counts — a handful of rows on one partition, vs. the 1-row cross
      // join PlanAuditSpec would (rightly) flag as a nested loop.
      val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val rates = counts.select(col("lang"),
        sqrt(min(col("n")).over(all).cast("double") / col("n")).as("rate"))
      val bucket = md5_lower64(concat(lit("mix:"),
        col("doc_id").cast("string")).cast("binary")).bitwiseAND(lit(4095L))
      docs.join(broadcast(rates), Seq("lang"))
        .filter(bucket.cast("double") < col("rate") * 4096.0)
        .select(col("doc_id"), col("lang"), (lit(1.0) / col("rate")).as("weight"))
        .orderBy(col("doc_id"))
    },


    "q104_curation_funnel" -> { (s, dir) =>
      // The curation funnel: how many documents and tokens survive each
      // stage — raw corpus, after the quality gate, after exact dedup
      // among gate survivors (q97's stage order). The one-row report
      // every pipeline prints before training. One pass: the gate
      // decision and the within-hash keeper window evaluate side by
      // side, then a single global aggregate (partial-agg to one row —
      // nothing document-sized moves).
      val keptCol = qualityKeep
      val keptMin = min(when(col("kept"), col("doc_id")))
        .over(Window.partitionBy(md5(col("text").cast("binary"))))
      Tables(s, dir).documents
        .select(col("doc_id"), col("text"),
          size(toks(col("text"))).cast("long").as("n_tokens"), keptCol.as("kept"))
        .withColumn("final", col("kept") && col("doc_id") === keptMin)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("docs_after_gate"),
          sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("tokens_after_gate"),
          sum(when(col("final"), 1L).otherwise(0L)).as("docs_final"),
          sum(when(col("final"), col("n_tokens")).otherwise(0L)).as("tokens_final"))
    },


    "q106_chunk_windows" -> { (s, dir) =>
      // Context-window chunking with overlap (64-token windows, stride
      // 48): see chunkWindows. The presentation sort is the only
      // exchange in the plan.
      chunkWindows(Tables(s, dir).documents)
        .orderBy(col("doc_id"), col("chunk_id"))
    },


    "q109_mixture_materialize" -> { (s, dir) =>
      // q91 emits WEIGHTS; this materializes the actual training
      // stream: per-language epoch counts (temperature tau = 0.5,
      // normalized so the commonest language runs 1.0 epoch and rare
      // languages repeat — epochs_l = sqrt(n_max / n_l)), each doc
      // repeated floor(epochs) times plus one fractional repeat decided
      // by a doc_id hash (deterministic across re-runs/backfills, q83's
      // argument), then laid out in the global training order every
      // pretraining run needs: ORDER BY a per-(doc, rep) hash — an
      // order KEY, not a row_number, so no single-partition window
      // exists and the final sort is an ordinary range exchange.
      // Masked to 62 bits so signed (Spark) and unsigned (DuckDB)
      // comparisons agree. Plan: tiny per-lang agg broadcast back +
      // per-row explode + the sort — the corpus never hash-shuffles.
      val docs = Tables(s, dir).documents
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val epochs = counts.select(col("lang"),
        sqrt(max(col("n")).over(all).cast("double") / col("n")).as("epochs"))
      val bucket = md5_lower64(concat(lit("epoch:"),
        col("doc_id").cast("string")).cast("binary")).bitwiseAND(lit(4095L))
      docs.join(broadcast(epochs), Seq("lang"))
        .withColumn("n_reps", floor(col("epochs")).cast("long") +
          when(bucket.cast("double") <
            (col("epochs") - floor(col("epochs"))) * 4096.0, 1L).otherwise(0L))
        .filter(col("n_reps") > 0)
        .withColumn("rep", explode(sequence(lit(0L), col("n_reps") - 1)))
        .select(col("doc_id"), col("lang"), col("rep"),
          md5_lower64(concat(lit("ord:"), col("doc_id").cast("string"),
            lit(":"), col("rep").cast("string")).cast("binary"))
            .bitwiseAND(lit(4611686018427387903L)).as("shuffle_key"))
        .orderBy(col("shuffle_key"), col("doc_id"), col("rep"))
    },


    "q101_token_budget_fill" -> { (s, dir) =>
      // Mixture construction's other half (q91 thins by RATE; this
      // fills by BUDGET): admit documents per language, in
      // deterministic id-hash order, while the language's running
      // token total is still under budget — "give me ~5000 tokens per
      // language, the same ones every run". A doc is admitted iff the
      // budget wasn't exhausted before it (q88's bin-start rule), so
      // re-runs and backfills admit the identical set. The hash masks
      // to 63 bits: Spark orders signed longs, DuckDB's
      // md5_number_lower is UBIGINT — the mask makes both orders the
      // nonnegative order. The running token total is the EXACT
      // distributed prefix sum in (h, doc_id) order
      // (operators/Quantile.prefixSum) — a language's docs never
      // serialize into one window partition.
      val h = md5_lower64(concat(lit("fill:"),
        col("doc_id").cast("string")).cast("binary"))
        .bitwiseAND(lit(Long.MaxValue))
      val base = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
          size(toks(col("text"))).cast("long").as("n_tokens"), h.as("h"))
      graft.operators.Quantile.prefixSum(
          base, Seq("lang"), "h", "doc_id", "n_tokens")
        .filter(col("prev_cum") < 5000)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("prev_cum"))
        .orderBy(col("doc_id"))
    },


    "q97_curation_pipeline" -> { (s, dir) =>
      // The end-to-end curation DAG as ONE Spark plan — quality gate ->
      // exact dedup (keep min doc_id per content hash) -> deterministic
      // split assignment -> per-(split, source) sequence packing. This
      // is the composition story: every stage is the same Column logic
      // as its standalone query (q92/q30/q83/q88), fused by Catalyst
      // into a single job with one hash-window shuffle (dedup) and one
      // pack-window shuffle — no materialization between stages. The
      // oracle replays the identical SQL stages over the shared q92
      // CTE block, so gate decisions can't drift between the two.
      val kept = Tables(s, dir).documents.filter(qualityKeep)
      val deduped = kept
        .withColumn("keeper",
          min(col("doc_id")).over(Window.partitionBy(md5(col("text").cast("binary")))))
        .filter(col("doc_id") === col("keeper"))
      val bucket = md5_lower64(concat(lit("split:"),
        col("doc_id").cast("string")).cast("binary")).bitwiseAND(lit(1023L))
      val wPack = Window.partitionBy(col("split"), col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      deduped
        .select(col("doc_id"), col("source"),
          when(bucket < 819, "train").when(bucket < 922, "valid")
            .otherwise("test").as("split"),
          size(toks(col("text"))).cast("long").as("n_tokens"))
        .withColumn("prev_cum", coalesce(sum(col("n_tokens")).over(wPack), lit(0L)))
        .select(col("doc_id"), col("source"), col("split"), col("n_tokens"),
          expr("prev_cum DIV 256").as("bin"))
        .orderBy(col("doc_id"))
    },


    "q96_corpus_report" -> { (s, dir) =>
      // The "what is in my corpus" report every pipeline runs before
      // training: per (lang, source) doc/token/byte totals, each
      // group's token share, and the cumulative share in descending
      // token order (how many groups cover 90% of the corpus). One
      // partial-agg shuffle to ~|langs x sources| rows; the share
      // windows run over that tiny aggregate, not the corpus. The
      // cumulative sum's float order is pinned by the window's total
      // order (n_tokens desc, lang, source), so the oracle accumulates
      // in the identical sequence.
      val g = Tables(s, dir).documents
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(toks(col("text"))).cast("long")).as("n_tokens"),
          sum(octet_length(col("text")).cast("long")).as("n_bytes"))
      val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val ord = Window.orderBy(col("n_tokens").desc, col("lang"), col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("token_share",
          col("n_tokens").cast("double") / sum(col("n_tokens")).over(all))
        // round: DuckDB evaluates window sums with a segment tree, so
        // the running sum associates differently and drifts ~1e-16
        .withColumn("cum_share", round(sum(col("token_share")).over(ord), 12))
        .orderBy(col("n_tokens").desc, col("lang"), col("source"))
    },


    "q40_multimodal_features" -> { (s, dir) =>
      // Binary multimodal plumbing: payload is an opaque binary column
      // + typed metadata; the feature extractor here is the
      // deterministic 16-bin byte histogram
      // (SketchKernel.byteHistogramCounts) — REAL header decode is
      // q127/MediaKernel (PNG/WAV chunk walk + CRC); full pixel decode
      // is out of scope in this container by the brief. The
      // feature vector is emitted as a comma-joined string of exact
      // integer counts so the oracle compare is hashable and float-free.
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"),
          col("text").cast("binary").as("payload"),
          struct(octet_length(col("text")).cast("long").as("n_bytes"),
            lit("text/plain").as("mime"), col("source").as("origin")).as("meta"))
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
          array_join(transform(byte_histogram_counts(col("payload")),
            _.cast("string")), ",").as("features"))
    },


    "q163_equifreq_bins" -> { (s, dir) =>
      // Equal-frequency discretization WITHOUT a global sort — the
      // feature-binning step (quantile bucketing for GBDT-style
      // features, price bands, load-balanced range sharding) that
      // NTILE expresses as a full sort of the corpus. Here: one scan
      // to a 256-cell integer histogram (count/min/max per cell — the
      // only thing that ever shuffles), a cumulative window over those
      // 256 rows, then the closed-form bin id least(15, 16*cum div n)
      // maps cells to 16 bins (cell c lands in bin b iff cum(c) covers
      // the b/16 rank — no cutpoint table needed); per-bin stats roll
      // up from the per-cell partials, so the corpus is read ONCE and
      // never re-joined. Bins are equal-frequency at cell resolution
      // (a cell is never split — the spec pins the balance bound);
      // everything is exact integer arithmetic, bit-equal on both
      // engines at any partitioning.
      val v = Tables(s, dir).lineitem
        .select(floor(col("l_extendedprice") * 100).cast("long").as("v"))
      val b = v.agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(lit(1)).as("n"))
      val hist = v.crossJoin(broadcast(b))
        .withColumn("cell", expr("((v - mn) * 256) div (mx - mn + 1)"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("cnt"), min(col("v")).as("lo"),
          max(col("v")).as("hi"), max(col("n")).as("n"))
      val wc = Window.orderBy(col("cell"))
      hist
        .withColumn("cum", sum(col("cnt")).over(wc))
        .withColumn("bin", least(lit(15L), expr("(cum * 16) div n")))
        .groupBy(col("bin"))
        .agg(sum(col("cnt")).as("n_rows"), min(col("lo")).as("lo_cents"),
          max(col("hi")).as("hi_cents"))
        .orderBy(col("bin"))
    },


    "q164_weighted_sample" -> { (s, dir) =>
      // Length-weighted corpus sample without replacement: P(doc in
      // the first draw) = n_tokens / total_tokens, successive draws
      // renormalize — the sampling design that keeps long documents
      // from being under-represented in token terms. Deterministic and
      // RNG-free: each doc's priority is the MIN over its token
      // positions of a per-(doc, position) hash, so a doc holds the
      // global minimum with probability proportional to its token
      // count (exchangeability of distinct hash values), and bottom-k
      // by that priority IS the without-replacement weighted sample.
      // Every re-run, backfill, or shard-level retry selects the same
      // docs (the q128 stability argument, weighted). Scale shape: one
      // token scan folding to ONE long of partial state per doc
      // (min combines map-side), then a global TakeOrdered top-k —
      // the corpus never sorts and never shuffles beyond the doc
      // rollup; the rank window runs over k rows.
      val kTop = 32
      val pos = Tables(s, dir).documents
        .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "tok")))
      val h = md5_lower64(concat(lit("ws:"), col("doc_id").cast("string"),
        lit(":"), col("pos").cast("string")).cast("binary"))
        .bitwiseAND(lit(Long.MaxValue))
      pos.select(col("doc_id"), h.as("h"))
        .groupBy(col("doc_id"))
        .agg(min(col("h")).as("prio"), count(lit(1)).as("n_tokens"))
        .orderBy(col("prio"), col("doc_id")).limit(kTop)
        .withColumn("rk",
          row_number().over(Window.orderBy(col("prio"), col("doc_id"))).cast("long"))
        .select(col("rk"), col("doc_id"), col("n_tokens"), col("prio"))
        .orderBy(col("rk"))
    },


    "q170_topk_bounded" -> { (s, dir) =>
      // Batch group-wise top-k with BOUNDED aggregation state — the
      // q02 window-rank answer re-expressed the way it must run at
      // 100 TB: top-3 customers per nation via MinKAgg over the
      // (balance desc, custkey) order packed isomorphically into one
      // long (AnnStreams' encoding: cents biased non-negative in the
      // high bits, key in the low 32). The window form sorts every
      // nation's full customer list; this form's partial state is 3
      // longs per nation per task, map-side combined, so the shuffle
      // moves k*|nations|*|tasks| longs regardless of customer count.
      // The rank window then runs over <= k*|nations| unpacked rows
      // and the 25-row nation dim rides a broadcast. Packing bound:
      // custkey < 2^32 and |cents| < 2^21 hold past sf1000.
      val c = Tables(s, dir).customer.select(col("c_custkey"),
        col("c_nationkey").cast("long").as("nk"),
        floor(col("c_acctbal") * 100).cast("long").as("bal_c"))
      val top = graft.operators.TopK.topK(c, "nk", "c_custkey", "bal_c", 3)
        .withColumnRenamed("bal_c", "bal_cents")
      top.join(broadcast(Tables(s, dir).nation
          .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))),
          Seq("nk"))
        .select(col("n_name"), col("rk"), col("c_custkey"), col("bal_cents"))
        .orderBy(col("n_name"), col("rk"))
    },


    "q177_dq_report" -> { (s, dir) =>
      // Data-quality suite — the dq checks a warehouse runs nightly,
      // as ONE report: referential orphans (anti-join counts), key
      // uniqueness, null rates, calendar completeness. Every check is
      // a bounded aggregate over one scan of its table (anti joins
      // shuffle on the key — at production bucketing they co-locate);
      // the report is a fixed-row union, and bad/total ratios are
      // single double divisions over exact integers. Adding a check =
      // adding a row source, not a pipeline.
      val li = Tables(s, dir).lineitem
      val o = Tables(s, dir).orders
      val c = Tables(s, dir).customer
      val ev = Tables(s, dir).events
      def d(x: Column) = x.cast("double")
      def row(name: String, bad: DataFrame, total: DataFrame): DataFrame =
        bad.crossJoin(total).select(lit(name).as("check"),
          col("n_bad"), col("n_total"),
          round(d(col("n_bad")) / d(col("n_total")), 6).as("bad_frac"))
      val orphanLi = row("lineitem_orphan_orderkey",
        li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_bad")),
        li.agg(count(lit(1)).as("n_total")))
      val orphanO = row("orders_orphan_custkey",
        o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_bad")),
        o.agg(count(lit(1)).as("n_total")))
      val dupKeys = row("orders_duplicate_orderkey",
        o.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_bad")),
        o.agg(count(lit(1)).as("n_total")))
      val nullVal = row("events_null_value",
        ev.agg(sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_bad")),
        ev.agg(count(lit(1)).as("n_total")))
      val dayRows = ev.select(Tables.eventMicros(ev).as("tus"))
        .select(expr("tus DIV 86400000000").as("day"))
      val gaps = row("events_missing_days",
        dayRows.agg(
          (max(col("day")) - min(col("day")) + 1 - countDistinct(col("day")))
            .as("n_bad")),
        dayRows.agg(
          (max(col("day")) - min(col("day")) + 1).as("n_total")))
      orphanLi.unionAll(orphanO).unionAll(dupKeys).unionAll(nullVal)
        .unionAll(gaps)
        .orderBy(col("check"))
    },


    "q183_compaction_plan" -> { (s, dir) =>
      // Small-file compaction planning — the lakehouse maintenance
      // operator: q125's 64 id-hash shards, packed into ~16
      // target-sized output files by next-fit-decreasing over the
      // shard-size table. Everything after the one manifest rollup
      // runs on 64 rows: total/target come from a window sum, bins
      // fall out of the closed form floor(exclusive-cumsum / target)
      // (consecutive size-ordered shards group until the target
      // fills — each bin overshoots by at most one shard, spec-pinned)
      // — no driver loop, no iterative packer, deterministic under
      // re-runs because the order key is (bytes desc, shard_id). The
      // actual rewrite would hang off this frame as a
      // partitionBy(bin) write.
      val h = md5_lower64(concat(lit("shard:"), col("doc_id").cast("string"))
        .cast("binary"))
      val shards = Tables(s, dir).documents
        .select(h.bitwiseAND(lit(63L)).as("shard_id"),
          octet_length(col("text")).cast("long").as("b"))
        .groupBy(col("shard_id")).agg(sum(col("b")).as("bytes"))
      val wAll = Window.partitionBy()
      val wOrd = Window.orderBy(col("bytes").desc, col("shard_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      shards
        .withColumn("total", sum(col("bytes")).over(wAll))
        .withColumn("target", expr("(total + 15) div 16"))
        .withColumn("prefix", coalesce(sum(col("bytes")).over(wOrd), lit(0L)))
        .select(col("shard_id"), col("bytes"),
          expr("prefix div target").as("bin"))
        .orderBy(col("bin"), col("bytes").desc, col("shard_id"))
    },


    "q189_kanon_audit" -> { (s, dir) =>
      // k-anonymity audit (Sweeney 2002): equivalence-class sizes over
      // the customer quasi-identifier tuple (nation, market segment,
      // account-balance band) — the privacy gate a dataset release runs
      // before publishing "anonymized" rows. A class with n < 4 means
      // those customers are re-identifiable to within 3 candidates by
      // an adversary who knows the three attributes. Band = floor(
      // acctbal/1000): a FIXED-width per-row bucket (not ntile), so the
      // audit is ONE hash aggregate with map-side partials and nothing
      // global — the shape that holds at any customer count.
      Tables(s, dir).customer
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
        .groupBy(col("nation"), col("segment"), col("bal_band"))
        .agg(count(lit(1)).as("n"))
        .withColumn("at_risk", col("n") < 4)
        .orderBy(col("nation"), col("segment"), col("bal_band"))
    },


    "q251_mp4_triage" -> { (s, dir) =>
      // Per-(source, brand) VIDEO-container health report — q226's
      // triage shape extended to the modality the media family lacked
      // (VERDICT r14 Next #5): an ISO-BMFF box walk (ftyp brand,
      // moov/mvhd timescale+duration, per-trak hdlr handler counts —
      // MediaKernel.mp4Info, no codec work) over planted minimal MP4s
      // parameterized by doc_id (brand table, three real timescales,
      // duration ticks, video/audio track mix), with docs doc_id mod
      // 11 == 5 TRUNCATED to 16 bytes: the ftyp magic still sniffs
      // (brand readable) but the box walk's tiling check fails —
      // valid = false, fields null. duration_ms = duration * 1000 DIV
      // timescale, exact integer arithmetic both engines replay.
      // Plan: map-only kernel parse + ONE bounded (source x brand)
      // agg with map-side partials — q226's 100 TB posture.
      val m = Tables(s, dir).documents
        .select(col("doc_id"), col("source"))
        .withColumn("p0", mp4_encode(
          (col("doc_id") % 4).cast("long"),
          when(col("doc_id") % 3 === 0, 600L)
            .when(col("doc_id") % 3 === 1, 1000L)
            .otherwise(90000L).cast("long"),
          (col("doc_id") % 9000 + 600).cast("long"),
          (col("doc_id") % 3).cast("long"),
          (col("doc_id") % 2).cast("long")))
        .withColumn("payload", when(col("doc_id") % 11 === 5,
          expr("substring(p0, 1, 16)")).otherwise(col("p0")))
        .select(col("source"), mp4_info(col("payload")).as("m"))
      m.select(col("source"), col("m.brand").as("brand"),
          col("m.valid").as("valid"),
          col("m.n_video").as("nv"), col("m.n_audio").as("na"),
          expr("(m.duration * 1000) DIV m.timescale").as("dur_ms"))
        .groupBy(col("source"), col("brand"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"),
          sum(col("dur_ms")).as("sum_dur_ms"),
          sum(col("nv")).as("n_video_tracks"),
          sum(col("na")).as("n_audio_tracks"))
        .orderBy(col("source"), col("brand"))
    },

    "q226_media_triage" -> { (s, dir) =>
      // Per-(source, container) corpus-health report — the triage
      // dashboard a multimodal ingest runs before any expensive decode
      // (q127 finds each payload's fields; this rolls the corpus up to
      // "which source is shipping corrupt media"). Payloads are q127's
      // plant, with docs doc_id mod 11 == 5 TRUNCATED to 20 bytes: the
      // container magic still sniffs (8-byte PNG sig, 12-byte RIFF,
      // 4-byte JPEG SOI), but every chunk/marker walk hits the bounds
      // guard and reports valid = false with null fields — exactly the
      // corrupt-upload shape a crawler produces. Plan: per-row kernel
      // parse + ONE bounded (source x container) agg with map-side
      // partials — nothing global, the map-only triage pass at 100 TB.
      // doc_id mod 12 == 2 (a slice of the jpeg arm: 12k+2 ≡ 2 mod 3)
      // now ships MP4 — the report gains the video container with the
      // same params as q251's plant, and mediaInfo's BMFF branch
      // carries container + structural validity (dimension fields are
      // per-track in BMFF, so they stay null here; q251 reports them)
      val p0 = when(col("doc_id") % 12 === 2, mp4_encode(
        (col("doc_id") % 4).cast("long"),
        when(col("doc_id") % 3 === 0, 600L)
          .when(col("doc_id") % 3 === 1, 1000L)
          .otherwise(90000L).cast("long"),
        (col("doc_id") % 9000 + 600).cast("long"),
        (col("doc_id") % 3).cast("long"),
        (col("doc_id") % 2).cast("long")))
        .when(col("doc_id") % 3 === 0,
        png_encode((col("n_chars") % 1023 + 1).cast("long"),
          (col("doc_id") % 767 + 1).cast("long"), lit(8L),
          when(col("doc_id") % 4 === 0, 6L).otherwise(2L).cast("long")))
        .when(col("doc_id") % 3 === 1, wav_encode(
          when(col("doc_id") % 5 === 0, 8000L)
            .when(col("doc_id") % 5 === 1, 16000L)
            .when(col("doc_id") % 5 === 2, 22050L)
            .when(col("doc_id") % 5 === 3, 44100L).otherwise(48000L).cast("long"),
          when(col("doc_id") % 4 === 1, 1L).otherwise(2L).cast("long"),
          when(col("doc_id") % 8 < 4, 8L).otherwise(16L).cast("long")))
        .otherwise(jpeg_encode((col("n_chars") % 511 + 1).cast("long"),
          (col("doc_id") % 383 + 1).cast("long"),
          when(col("doc_id") % 2 === 0, 3L).otherwise(1L).cast("long")))
      Tables(s, dir).documents
        .select(col("doc_id"), col("n_chars"), col("source"))
        .withColumn("p0", p0)
        .withColumn("payload", when(col("doc_id") % 11 === 5,
          expr("substring(p0, 1, 20)")).otherwise(col("p0")))
        .select(col("source"), media_info(col("payload")).as("m"))
        .select(col("source"), col("m.container").as("container"),
          col("m.valid").as("valid"), col("m.width").as("width"),
          col("m.height").as("height"), col("m.sample_rate").as("sample_rate"))
        .groupBy(col("source"), col("container"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"),
          sum(col("width")).as("sum_width"),
          sum(col("height")).as("sum_height"),
          sum(col("sample_rate")).as("sum_sample_rate"))
        .orderBy(col("source"), col("container"))
    },


    "q227_l_diversity" -> { (s, dir) =>
      // l-diversity audit (Machanavajjhala 2007) — the successor check
      // to q189's k-anonymity: a class can be large (k-anonymous) yet
      // leak everything if all its members SHARE the sensitive value.
      // Quasi-identifiers here are (nation, segment); the sensitive
      // attribute is the account-balance band. Per class: size n,
      // distinct sensitive values l, and entropy l-diversity
      // H = ln(n) - sum(c*ln c)/n over the sensitive distribution
      // (q197's one-ln-per-CELL form — never per row), flagged when
      // l < 3. Scale shape: ONE (quasi x sensitive) hash agg with
      // map-side partials collapses the corpus, then a bounded
      // per-class rollup — no windows, nothing global.
      val cells = Tables(s, dir).customer
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
        .groupBy(col("nation"), col("segment"), col("bal_band"))
        .agg(count(lit(1)).as("c"))
      cells.groupBy(col("nation"), col("segment"))
        .agg(sum(col("c")).as("n"),
          count(lit(1)).as("l_distinct"),
          sum(col("c").cast("double") * log(col("c").cast("double")))
            .as("clnc"))
        .select(col("nation"), col("segment"), col("n"), col("l_distinct"),
          round(log(col("n").cast("double")) - col("clnc") / col("n"), 6)
            .as("entropy"),
          (col("l_distinct") < 3).as("at_risk"))
        .orderBy(col("nation"), col("segment"))
    },


    "q197_source_diversity" -> { (s, dir) =>
      // Per-source lexical diversity — the corpus-mixing readout
      // (diverse sources up-weighted, repetitive ones down-weighted in
      // a data mixture): Shannon entropy in the sum-of-c*ln(c) form
      // H = ln(N) - sum(c*ln(c))/N (one ln per VOCAB CELL, never per
      // token — the q132 trick), Simpson concentration
      // sum(c*(c-1))/(N*(N-1)) from exact integers, and type-token
      // ratio. Scale shape: ONE (source, token) count agg with
      // map-side partials, then a |sources|-row rollup; nothing
      // global, no windows.
      Tables(s, dir).documents
        .select(col("source"), explode(toks(col("text"))).as("token"))
        .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(col("c").cast("double") * log(col("c").cast("double"))).as("clnc"),
          sum(col("c") * (col("c") - 1)).as("cc1"))
        .select(col("source"), col("n_tokens"), col("vocab"),
          round(log(col("n_tokens").cast("double")) -
            col("clnc") / col("n_tokens"), 6).as("shannon"),
          round(col("cc1").cast("double") /
            (col("n_tokens") * (col("n_tokens") - 1)).cast("double"), 6)
            .as("simpson"),
          round(col("vocab").cast("double") / col("n_tokens"), 6).as("ttr"))
        .orderBy(col("source"))
    },


    "q201_neyman_allocation" -> { (s, dir) =>
      // Neyman optimal allocation (Neyman 1934) — how to split a fixed
      // labeling/eval budget across strata: n_h proportional to
      // N_h * sigma_h minimizes the estimator variance (vs q157's
      // count-proportional water-filling, which ignores within-stratum
      // spread). Per event type: N, population sigma of integer cents
      // (exact integer moments, ONE sqrt), weight w = N*sigma, ideal
      // share, and an integer allocation of budget=1000 by LARGEST
      // REMAINDER (floor everything, hand the leftover units to the
      // largest fractional parts, ties by type) — deterministic, sums
      // to the budget exactly on both engines. Scale shape: one
      // moments agg to |types| cells; every window after runs on that
      // tiny table.
      val budget = 1000L
      val m = Tables(s, dir).events
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
          sum(col("c") * col("c")).as("sx2"))
        .withColumn("sigma",
          sqrt((col("sx2").cast("double") - col("sx").cast("double") *
            col("sx") / col("n")) / col("n")))
        .withColumn("w", col("n") * col("sigma"))
      val wAll = Window.partitionBy()
      val wRem = Window.orderBy(col("frac").desc, col("event_type"))
      m.withColumn("wsum", sum(col("w")).over(wAll))
        .withColumn("ideal", col("w") / col("wsum") * budget)
        .withColumn("base", floor(col("ideal")).cast("long"))
        .withColumn("frac", col("ideal") - col("base"))
        .withColumn("left", lit(budget) - sum(col("base")).over(wAll))
        .withColumn("rk", row_number().over(wRem).cast("long"))
        .select(col("event_type"), col("n"), round(col("sigma"), 6).as("sigma"),
          round(col("ideal"), 6).as("ideal"),
          (col("base") + when(col("rk") <= col("left"), 1L).otherwise(0L))
            .as("alloc"))
        .orderBy(col("event_type"))
    },


    "q205_audio_pcm_windows" -> { (s, dir) =>
      // REAL audio sample decode + per-window frame features — the
      // step that finishes what q123's stride sampler stands in for
      // and q127's header triage stops short of: each audio doc
      // (doc_id mod 3 == 1, q127's WAV arm) carries a COMPLETE 16-bit
      // PCM WAV whose samples derive deterministically from doc_id
      // (sample k = ((doc_id+k)*2654435761) mod 65536 - 32768), and
      // wav_pcm_windows DECODES it: generic RIFF chunk walk to the
      // data chunk (docs with doc_id mod 7 == 3 interleave a LIST/INFO
      // chunk, so a fixed byte-44 assumption would misread them —
      // MediaSpec pins that case), then windows of 32 samples reduced
      // to exact integer (n_samples, sum_amp, peak_amp) — the
      // per-window PCM means/peaks a loudness/silence-trim pass needs.
      // sample_rate/channels come from the media_info PARSE of the
      // same payload, and the oracle recomputes every output
      // arithmetically from (doc_id, n_chars) — fully independent of
      // both codec sides, so an encode/decode bug cannot cancel out.
      // Plan: per-row kernel projection + bounded explode (~n/32 rows
      // per doc), zero shuffles beyond the presentation sort — the
      // map-only decode pass of a 100 TB multimodal pipeline.
      val sr = when(col("doc_id") % 5 === 0, 8000L)
        .when(col("doc_id") % 5 === 1, 16000L)
        .when(col("doc_id") % 5 === 2, 22050L)
        .when(col("doc_id") % 5 === 3, 44100L).otherwise(48000L)
      val ch = when(col("doc_id") % 4 === 1, 1L).otherwise(2L)
      val payload = wav_encode_pcm(sr.cast("long"), ch.cast("long"),
        (col("n_chars") % 200 + 17).cast("long"), col("doc_id"))
      // range-sort the NARROW (doc_id, n_chars) rows first; the codec
      // kernels and the explode evaluate above the exchange (q123's
      // shape), and the generator emits windows in window_id order per
      // doc, so (doc_id, window_id) order holds without a wide sort
      Tables(s, dir).documents
        .filter(col("doc_id") % 3 === 1)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), payload.as("payload"))
        .select(col("doc_id"), media_info(col("payload")).as("m"),
          wav_pcm_windows(col("payload"), lit(32L)).as("ws"))
        // explode_outer: the plain explode would INFER size(ws)>0 and
        // push it (kernels and all) below the range exchange — exactly
        // the shape the kernels-above-sort audit bans; every payload
        // here decodes to >=1 window, so the rows are identical
        .select(col("doc_id"), col("m.sample_rate").as("sample_rate"),
          col("m.channels").as("channels"), explode_outer(col("ws")).as("w"))
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("w.window_id").as("window_id"), col("w.n_samples").as("n_samples"),
          col("w.sum_amp").as("sum_amp"), col("w.peak_amp").as("peak_amp"))
    },


    "q235_audio_noisiness" -> { (s, dir) =>
      // Per-doc audio NOISINESS triage over the same real PCM decode
      // as q205: zero-crossing rate (the spectral-free voiced/
      // unvoiced/noise discriminator — white noise crosses ~every
      // other sample, voiced speech far less) + L1 loudness per
      // 32-sample window, rolled up per doc with the exact transition
      // ratio zcr/(n-1) and the count of high-ZCR windows (zcr*32 >=
      // 30*n_samples — the planted stride flips sign on ~95% of
      // steps, so a 30/32 cutoff is the one that actually
      // discriminates between windows on this corpus; a natural-audio
      // deployment would set it near 1/2). The pass a pipeline runs to drop
      // noise-only audio before any expensive codec-specific analysis.
      // The rollup is a HIGHER-ORDER fold over the kernel's window
      // array — no explode, no groupBy: the whole query is ONE
      // map-only codegen'd projection per doc (q205's zero-shuffle
      // posture, the plan audit pins it), and the oracle recomputes
      // every crossing arithmetically from (doc_id, n_chars) via the
      // planted sample formula — independent of both codec sides.
      val sr = when(col("doc_id") % 5 === 0, 8000L)
        .when(col("doc_id") % 5 === 1, 16000L)
        .when(col("doc_id") % 5 === 2, 22050L)
        .when(col("doc_id") % 5 === 3, 44100L).otherwise(48000L)
      val ch = when(col("doc_id") % 4 === 1, 1L).otherwise(2L)
      val payload = wav_encode_pcm(sr.cast("long"), ch.cast("long"),
        (col("n_chars") % 200 + 17).cast("long"), col("doc_id"))
      val ws = col("ws")
      Tables(s, dir).documents
        .filter(col("doc_id") % 3 === 1)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), payload.as("payload"))
        .select(col("doc_id"),
          wav_zcr_windows(col("payload"), lit(32L)).as("ws"))
        .select(col("doc_id"),
          size(ws).cast("long").as("n_windows"),
          aggregate(ws, lit(0L),
            (acc, w) => acc + w.getField("n_samples")).as("n_samples"),
          aggregate(ws, lit(0L),
            (acc, w) => acc + w.getField("zcr")).as("zcr"),
          size(filter(ws, w =>
              w.getField("zcr") * 32 >= w.getField("n_samples") * 30))
            .cast("long").as("high_zcr_windows"),
          array_max(transform(ws, w => w.getField("sum_abs")))
            .as("max_window_l1"))
        .select(col("doc_id"), col("n_windows"), col("n_samples"),
          col("zcr"), col("high_zcr_windows"), col("max_window_l1"),
          when(col("n_samples") > 1,
            round(col("zcr").cast("double") / (col("n_samples") - 1L), 6))
            .as("noisiness"))
    },


    "q222_image_row_stats" -> { (s, dir) =>
      // REAL image pixel decode + per-scanline luminance features —
      // the image twin of q205's audio arm, closing the multimodal
      // asymmetry (images used to stop at header triage): each image
      // doc (doc_id mod 3 == 0, q127's PNG arm) carries a COMPLETE
      // 8-bit grayscale PNG whose pixels derive deterministically from
      // doc_id (pixel (x,y) = ((doc_id + y*w + x) * 2654435761) mod
      // 256), zlib-deflated for real with scanline filter y mod 5 —
      // so png_row_stats must inflate the IDAT and run ALL FIVE spec
      // unfilters to read it (MediaSpec additionally pins the decoder
      // against live ImageIO-encoded PNGs). Output: per scanline the
      // exact integer (n_px, sum_lum, min_lum, max_lum) a
      // brightness/contrast triage pass needs; width/height come from
      // the media_info PARSE of the same payload, and the oracle
      // recomputes every value arithmetically from doc_id — fully
      // independent of both codec sides. Plan: per-row kernel
      // projection + bounded explode (h <= 15 rows per doc), zero
      // shuffles beyond the presentation sort — the map-only decode
      // pass of a 100 TB multimodal pipeline.
      val payload = png_encode_gray(
        (col("doc_id") % 16 + 16).cast("long"),
        (col("doc_id") % 8 + 8).cast("long"), col("doc_id"), lit(0L))
      Tables(s, dir).documents
        .filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), payload.as("payload"))
        .select(col("doc_id"), media_info(col("payload")).as("m"),
          png_row_stats(col("payload")).as("rs"))
        // explode_outer: plain explode would infer size(rs) > 0 and
        // push the kernels below the range exchange (q205's note);
        // every payload here decodes to >= 8 scanlines
        .select(col("doc_id"), col("m.width").as("width"),
          col("m.height").as("height"), explode_outer(col("rs")).as("r"))
        .select(col("doc_id"), col("width"), col("height"),
          col("r.y").as("y"), col("r.n_px").as("n_px"),
          col("r.sum_lum").as("sum_lum"), col("r.min_lum").as("min_lum"),
          col("r.max_lum").as("max_lum"))
    },


    "q242_jpeg_row_stats" -> { (s, dir) =>
      // REAL JPEG pixel decode — the format arm q222 could not cover
      // (PNG inflate is lossless; JPEG needs the full baseline
      // machinery): each doc (doc_id mod 3 == 1, q127's JPEG arm)
      // carries a COMPLETE baseline JPEG — real DHT canonical Huffman
      // stream, DC prediction, byte stuffing — whose 8x8 blocks are
      // FLAT with the MediaKernel.jpegBlockVal quadratic-mix value
      // under an all-ones quant table, so the codec round-trips
      // EXACTLY
      // and the oracle recomputes every decoded pixel arithmetically
      // from doc_id (fully independent of both codec sides).
      // image_row_stats dispatches on magic bytes and must run
      // Huffman decode + dequant + IDCT to produce the same
      // per-scanline (n_px, sum_lum, min_lum, max_lum) contract as
      // q222's PNG arm. Plan shape identical to q222: per-row kernel
      // projection + bounded explode (h <= 15 scanlines per doc),
      // zero data shuffles — and luma-only reconstruction means the
      // chroma IDCT work a color corpus would imply never runs.
      val payload = jpeg_encode_gray_flat(
        (col("doc_id") % 16 + 16).cast("long"),
        (col("doc_id") % 8 + 8).cast("long"), col("doc_id"), lit(0L))
      Tables(s, dir).documents
        .filter(col("doc_id") % 3 === 1)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), payload.as("payload"))
        .select(col("doc_id"), media_info(col("payload")).as("m"),
          image_row_stats(col("payload")).as("rs"))
        .select(col("doc_id"), col("m.width").as("width"),
          col("m.height").as("height"), explode_outer(col("rs")).as("r"))
        .select(col("doc_id"), col("width"), col("height"),
          col("r.y").as("y"), col("r.n_px").as("n_px"),
          col("r.sum_lum").as("sum_lum"), col("r.min_lum").as("min_lum"),
          col("r.max_lum").as("max_lum"))
    },


    "q246_jpeg_quality_triage" -> { (s, dir) =>
      // JPEG ENCODE-QUALITY triage from the DQT alone — the pre-decode
      // curation gate on a crawled image corpus (re-compressed thumbs
      // vs originals, low-quality spam farms): recover each payload's
      // encoder quality setting by inverting libjpeg's public
      // quality->table mapping (jcparam.c; scale = q<50 ? 5000/q :
      // 200-2q over the Annex K luminance table) from the PARSED
      // luminance quant table's sum ratio — no entropy decode, a
      // map-only marker walk reading ~100 header bytes per payload, so
      // the 100 TB plan ships a few ints per image and zero pixels.
      // Payloads are planted by jpeg_encode_gray_q at quality
      // 35 + (doc_id % 12)*5 — inside the clamp-free 35..90 band where
      // the sum-ratio inversion recovers the setting exactly (the
      // planted spec sweeps the band and MediaSpec pins q_est ==
      // quality) — and the oracle rebuilds the scaled table
      // arithmetically from doc_id, so a matching q_est certifies the
      // DQT byte parse end-to-end (q242's oracle pattern). est_err is
      // kept as a column so a future clamp-band payload shows its
      // estimation bias instead of hiding it.
      val sumK = 3688L // sum of the Annex K luminance base table
      Tables(s, dir).documents
        .select(col("doc_id"))
        .orderBy(col("doc_id")) // range-sort THIN ids; kernels above it
        .select(col("doc_id"), expr("doc_id DIV 8").as("gid"),
          (lit(35L) + (col("doc_id") % 12) * 5).as("quality"))
        .select(col("doc_id"), col("quality"),
          jpeg_dqt(jpeg_encode_gray_q(
            ((col("gid") % 4 + 9) * 8).cast("long"),
            ((col("gid") % 4 + 3) * 8).cast("long"),
            col("gid"), (col("doc_id") % 8) * 3, col("quality")))
            .as("dqt"))
        .select(col("doc_id"), col("quality"),
          element_at(col("dqt"), 1).as("dqt_dc"),
          aggregate(col("dqt"), lit(0L), (a, x) => a + x).as("dqt_sum"))
        .withColumn("s_est",
          expr(s"(200 * dqt_sum + $sumK) DIV ${2 * sumK}"))
        .withColumn("q_est",
          when(col("s_est") >= 100, expr("5000 DIV s_est"))
            .otherwise(expr("(200 - s_est) DIV 2")))
        .select(col("doc_id"), col("quality"), col("dqt_dc"),
          col("dqt_sum"), col("q_est"),
          (col("q_est") - col("quality")).as("est_err"))
    },


    "q151_source_divergence" -> { (s, dir) =>
      // Corpus-drift matrix: Jensen-Shannon divergence between every
      // source pair's unigram distribution, estimated over 256 hashed
      // buckets (q132's fixed-feature trick) with Laplace smoothing —
      // the monitoring op behind "did this crawl's language shift".
      // Scale shape: ONE token scan collapses to (source, bucket)
      // cells (<= |sources| x 256); each source densifies to a 256-
      // long vector (map literal -> sequence transform, zeros for
      // empty buckets); the pairwise stage is a broadcast cross of the
      // |sources|-row vector table (q102's matrix posture). Float
      // parity: both engines fold the 256 per-bucket terms IN BUCKET
      // ORDER (array fold here, list comprehension there) over
      // identical integer counts, so the doubles agree bit-for-bit
      // before the 6dp presentation round.
      val cn = Tables(s, dir).documents
        .select(col("source"), explode(toks(col("text"))).as("tok"))
        .select(col("source"),
          md5_lower64(concat(lit("q151:"), col("tok")).cast("binary"))
            .bitwiseAND(lit(255L)).as("b"))
        .groupBy(col("source"), col("b")).agg(count(lit(1)).as("c"))
      val vec = cn.groupBy(col("source"))
        .agg(map_from_entries(collect_list(struct(col("b"), col("c")))).as("m"),
          sum(col("c")).as("n"))
        .select(col("source"),
          transform(sequence(lit(0L), lit(255L)),
            i => coalesce(element_at(col("m"), i), lit(0L))).as("v"),
          col("n"))
      def p(c: Column, n: Column): Column =
        (c.cast("double") + lit(1.0)) / (n.cast("double") + lit(256.0))
      val terms = zip_with(col("a.v"), col("b.v"), (ca, cb) => {
        val pa = p(ca, col("a.n")); val pb = p(cb, col("b.n"))
        lit(0.5) * (pa * log2(lit(2.0) * pa / (pa + pb)) +
          pb * log2(lit(2.0) * pb / (pa + pb)))
      })
      vec.as("a").crossJoin(broadcast(vec.as("b")))
        .filter(col("a.source") < col("b.source"))
        .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
          round(aggregate(terms, lit(0.0), (acc, t) => acc + t), 6)
            .as("js_divergence"))
        .orderBy(col("source_a"), col("source_b"))
    },


    "q157_mixture_waterfill" -> { (s, dir) =>
      // Capped proportional mixture allocation (water-filling): given a
      // token budget B (3/5 of the corpus here), per-source target
      // weights w_s and available tokens a_s, allocate x_s = min(a_s,
      // λ·w_s) with λ chosen so Σx = B — the closed-form answer to
      // "fill my training mixture to target proportions, but a source
      // can't contribute more than it has" (the static core of
      // DoReMi-style mixture balancing; complements q91's sampler and
      // q109's materializer, which take proportions as GIVEN). No
      // driver loop: sort sources by a/w ascending, then the saturated
      // set is a PREFIX (standard water-filling lemma), testable per
      // row with exact integer cross-multiplication a·W_rem ≤ B_rem·w
      // over two prefix/suffix window sums; the λ anchor (B_rem, W_rem
      // of the FIRST unsaturated row) falls out as a conditional max
      // because both decrease monotonically along the sort. Scale
      // shape: ONE token-count shuffle collapses the corpus to
      // |sources| rows; every window after that runs on the tiny
      // single-partition source table (q147's 256-row cumsum posture).
      // All-integer allocations = bit-stable; leftover sub-λ remainder
      // tokens stay unallocated by design (floor division).
      val d = Tables(s, dir).documents
      val avail = d.select(col("source"), explode(toks(col("text"))).as("t"))
        .groupBy(col("source")).agg(count(lit(1)).as("avail"))
        .withColumn("w", md5_lower64(concat(lit("q157:"), col("source"))
          .cast("binary")).bitwiseAND(lit(7L)) + 1L)
      val byRatio = Window.orderBy(col("ratio"), col("source"))
      val all = Window.partitionBy()
      avail.withColumn("ratio", col("avail").cast("double") / col("w"))
        .withColumn("pre_a", coalesce(sum(col("avail")).over(
          byRatio.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("wrem", sum(col("w")).over(
          byRatio.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .withColumn("b", expr("(sum(avail) OVER () * 3) DIV 5"))
        .withColumn("brem", col("b") - col("pre_a"))
        .withColumn("saturated",
          col("avail") * col("wrem") <= col("brem") * col("w"))
        .withColumn("lam_n", max(when(!col("saturated"), col("brem"))).over(all))
        .withColumn("lam_d", max(when(!col("saturated"), col("wrem"))).over(all))
        .select(col("source"), col("avail"), col("w").as("weight"),
          col("saturated"),
          when(col("saturated"), col("avail"))
            .otherwise(expr("(lam_n * weight) DIV lam_d")).as("alloc"))
        .orderBy(col("source"))
    },


    "q128_stratified_sample" -> { (s, dir) =>
      // EXACT-k per-stratum corpus sample (eval-set construction, the
      // complement of q91's Bernoulli mixture sampling): exactly
      // min(k, |stratum|) docs per source, chosen by deterministic
      // hash PRIORITY (lowest md5 of "samp:<id>" wins), so re-runs,
      // backfills, and corpus growth keep already-chosen docs chosen
      // unless a strictly lower-priority doc arrives — the standard
      // bottom-k-by-hash sample, which is also a mergeable sketch
      // (union = re-take bottom k). Plan shape for 100 TB: one
      // bounded-state partial aggregate (MinKAgg, k longs per stratum,
      // map-side combine) computes each stratum's k-th-lowest cutoff;
      // the tiny cutoff table broadcasts back; membership is a pure
      // map-only filter. The corpus never shuffles and no per-stratum
      // sort ever materializes (vs the naive row_number window, which
      // sorts every stratum's full data). The final rank window runs
      // over <= k * |strata| rows.
      val k = 8
      val prio = md5_lower64(concat(lit("samp:"),
        col("doc_id").cast("string")).cast("binary"))
        .bitwiseAND(lit(Long.MaxValue))
      val scored = Tables(s, dir).documents
        .select(col("source"), col("doc_id"), prio.as("prio"))
      val cutoffs = scored.groupBy(col("source"))
        .agg(min_k(col("prio"), k).as("mins"))
        .select(col("source"),
          element_at(col("mins"), size(col("mins"))).as("cutoff"))
      val w = Window.partitionBy(col("source")).orderBy(col("prio"), col("doc_id"))
      scored.join(broadcast(cutoffs), Seq("source"))
        .filter(col("prio") <= col("cutoff"))
        .withColumn("rk", row_number().over(w).cast("long"))
        // a priority tie AT the k-th cutoff (md5 collision) would pass
        // the cutoff filter with k+1 rows; the oracle caps at rk <= k,
        // so cap here too (the window above already exists — free)
        .filter(col("rk") <= k)
        .select(col("source"), col("rk"), col("doc_id"), col("prio"))
        .orderBy(col("source"), col("rk"))
    },


    "q127_media_decode" -> { (s, dir) =>
      // REAL container decode over planted media payloads — closes the
      // round-9 "decode step stubbed" caveat. Each doc carries a
      // spec-valid media header derived from its metadata (doc_id mod
      // 3: PNG — signature, IHDR with real CRC-32, IDAT, IEND; PCM
      // WAV — RIFF/WAVE/fmt, little-endian; JPEG — SOI/APP0-JFIF/SOF0
      // marker stream, ITU T.81), and media_info PARSES it back:
      // magic sniff, generic chunk/marker walk, CRC and structural
      // validation (MediaKernel; MediaSpec pins the parser against a
      // canonical real-world 1x1 PNG, real 44-byte WAV bytes, and a
      // live ImageIO-encoded JPEG, so this is a file parser, not a
      // fixture-only inverse). The oracle recomputes the expected
      // fields ARITHMETICALLY from the source columns — independent of
      // both codec sides — so an encode/decode bug cannot cancel out.
      // Plan: per-row kernel projection, zero shuffles beyond the
      // presentation sort; at 100 TB this is the map-only "header
      // triage" pass (dedupe by dims, route by sample rate, drop
      // corrupt payloads) that runs before any expensive full decode.
      val payload = when(col("doc_id") % 3 === 0,
        png_encode((col("n_chars") % 1023 + 1).cast("long"),
          (col("doc_id") % 767 + 1).cast("long"), lit(8L),
          when(col("doc_id") % 4 === 0, 6L).otherwise(2L).cast("long")))
        .when(col("doc_id") % 3 === 1, wav_encode(
          when(col("doc_id") % 5 === 0, 8000L)
            .when(col("doc_id") % 5 === 1, 16000L)
            .when(col("doc_id") % 5 === 2, 22050L)
            .when(col("doc_id") % 5 === 3, 44100L).otherwise(48000L).cast("long"),
          when(col("doc_id") % 4 === 1, 1L).otherwise(2L).cast("long"),
          when(col("doc_id") % 8 < 4, 8L).otherwise(16L).cast("long")))
        .otherwise(jpeg_encode((col("n_chars") % 511 + 1).cast("long"),
          (col("doc_id") % 383 + 1).cast("long"),
          when(col("doc_id") % 2 === 0, 3L).otherwise(1L).cast("long")))
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"), payload.as("payload"))
        .select(col("doc_id"), media_info(col("payload")).as("m"),
          octet_length(col("payload")).cast("long").as("payload_bytes"))
        .select(col("doc_id"), col("m.container").as("container"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.bit_depth").as("bit_depth"), col("m.color_type").as("color_type"),
          col("m.sample_rate").as("sample_rate"), col("m.channels").as("channels"),
          col("m.bits_per_sample").as("bits_per_sample"),
          col("m.valid").as("valid"), col("payload_bytes"))
    },


    "q126_curation_v2" -> { (s, dir) =>
      // The round-9 operators composed end-to-end in ONE fused plan —
      // the successor to q97's curation DAG using the newer stages:
      // q116's classifier gates the corpus (score >= 0), survivors go
      // through q117's block-dedup REWRITE (16-token blocks, global
      // keep-first among survivors), cleaned docs that still have
      // tokens take q83's deterministic split, and the output is
      // q125-style per-split manifest rows (docs, tokens, order-free
      // content digest of the CLEANED text). No inter-stage
      // materialization: Catalyst sees one tree — the gate reaches the
      // scan as a filter under the block explode, and the whole DAG is
      // three shuffles (block key, doc rollup, split agg). The oracle
      // chains the same four stages as CTEs.
      val t = toks(col("text"))
      val gated = Tables(s, dir).documents
        .select(col("doc_id"), col("text"), size(t).cast("long").as("n_tokens"),
          aggregate(transform(t, tok =>
            (md5_lower64(concat(lit("qc:"), tok).cast("binary"))
              .bitwiseAND(lit(1023L)) * lit(2654435761L)) % lit(2048L) - lit(1024L)),
            lit(0L), (a, x) => a + x).as("score_raw"))
        .filter(col("score_raw") >= 0L)
      val w = Window.partitionBy(col("blk")).orderBy(col("doc_id"), col("idx"))
      val cleaned = docBlocks(gated)
        .withColumn("rn", row_number().over(w))
        .groupBy(col("doc_id"))
        .agg(array_join(transform(array_sort(collect_list(
          when(col("rn") === 1, struct(col("idx"), col("blk"))))),
          _.getField("blk")), " ").as("clean_text"))
        .filter(length(col("clean_text")) > 0)
      val bucket = md5_lower64(concat(lit("split:"),
        col("doc_id").cast("string")).cast("binary")).bitwiseAND(lit(1023L))
      cleaned
        .select(col("doc_id"), col("clean_text"),
          when(bucket < 819, "train").when(bucket < 922, "valid")
            .otherwise("test").as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(toks(col("clean_text"))).cast("long")).as("n_tokens"),
          sum(md5_lower64(col("clean_text").cast("binary"))
            .bitwiseAND(lit(2147483647L))).as("content_sum"))
        .orderBy(col("split"))
    },


    "q125_shard_manifest" -> { (s, dir) =>
      // The export step: deterministic doc -> shard assignment (64
      // shards by id hash — stable under re-runs and backfills, like
      // q83's splits) plus the per-shard MANIFEST a downstream trainer
      // checks before reading: doc count, token sum, and an
      // order-independent content digest (sum of per-doc 31-bit
      // hashes — exact integer, so partitioning and arrival order can
      // never change it; a shard rewritten with different row order
      // still matches). One partial-aggregated shuffle to 64 rows; the
      // actual parquet write would hang off this same frame via
      // partitionBy("shard_id") without changing the plan shape.
      val h = md5_lower64(concat(lit("shard:"), col("doc_id").cast("string"))
        .cast("binary"))
      Tables(s, dir).documents
        .select(col("doc_id"), h.bitwiseAND(lit(63L)).as("shard_id"),
          size(toks(col("text"))).cast("long").as("n_tokens"),
          md5_lower64(col("text").cast("binary"))
            .bitwiseAND(lit(2147483647L)).as("dh"))
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
          sum(col("dh")).as("content_sum"))
        .orderBy(col("shard_id"))
    },


    "q123_multimodal_frames" -> { (s, dir) =>
      // Frame sampling with the decode made REAL (the round-9 stride
      // sampler computed byte histograms over raw payload slices as a
      // stand-in; q205 made audio real, this closes the image side):
      // each doc carries a complete deflated grayscale PNG (pixels
      // planted from doc_id — see q222), png_row_stats DECODES it
      // (IDAT inflate + all-five-filter unfilter), and the query keeps
      // every SECOND scanline — the stride decimation a real pipeline
      // does before expensive per-frame featurization — emitting the
      // exact integer luminance stats per sampled frame. Plan
      // unchanged from the stand-in: narrow range sort, per-row kernel
      // projection above it, bounded explode (<= 16 sampled rows per
      // doc), zero data shuffles.
      val payload = png_encode_gray(
        (col("doc_id") % 32 + 32).cast("long"),
        (col("doc_id") % 16 + 16).cast("long"), col("doc_id"), lit(0L))
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"))
        .select(col("doc_id"), png_row_stats(payload).as("rs"))
        .select(col("doc_id"), explode_outer(col("rs")).as("r"))
        .filter(col("r.y") % 2 === 0)
        .select(col("doc_id"), expr("r.y DIV 2").as("frame_id"),
          col("r.y").as("y"), col("r.n_px").as("n_px"),
          col("r.sum_lum").as("sum_lum"), col("r.min_lum").as("min_lum"),
          col("r.max_lum").as("max_lum"))
    },


    "q119_corpus_diff" -> { (s, dir) =>
      // Snapshot diff — the audit between two corpus versions (what a
      // re-crawl / re-ingest changed): per doc_id, added / removed /
      // changed / unchanged by content hash. The two versions derive
      // deterministically from the fixture (old drops doc_id%10==0 and
      // carries a draft suffix on doc_id%7==3; new drops doc_id%10==1),
      // standing in for two real snapshot directories. Plan: hash
      // per-row on each side, then ONE full-outer hash join on doc_id —
      // the only shuffle. At 100 TB both snapshots would be bucketed by
      // doc_id so the join plans shuffle-free; the hash compare ships
      // 16 bytes per doc, never the text.
      val base = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val old = base.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 7 === 3, concat(col("text"), lit(" [draft]")))
            .otherwise(col("text")).cast("binary")).as("old_hash"))
      val nw = base.filter(col("doc_id") % 10 =!= 1)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("new_hash"))
      old.join(nw, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("old_hash"), col("new_hash"),
          when(col("old_hash").isNull, "added")
            .when(col("new_hash").isNull, "removed")
            .when(col("old_hash") =!= col("new_hash"), "changed")
            .otherwise("unchanged").as("status"))
        .orderBy(col("doc_id"))
    },
  )

  def oracle: Map[String, String] = Map(
    // every column recomputed arithmetically from (doc_id, n_chars):
    // the planted sample formula, window cuts at 32 samples, and the
    // mod-derived format fields — independent of both codec sides
    "q205_audio_pcm_windows" ->
      """WITH a AS (SELECT doc_id, n_chars % 200 + 17 AS ns FROM documents
               WHERE doc_id % 3 = 1),
          s AS (SELECT doc_id, unnest(range(0, ns)) AS k FROM a),
          v AS (SELECT doc_id, k // 32 AS window_id,
                 ((doc_id + k) * 2654435761) % 65536 - 32768 AS v FROM s),
          w AS (SELECT doc_id, CAST(window_id AS BIGINT) AS window_id,
                 CAST(count(*) AS BIGINT) AS n_samples,
                 CAST(sum(v) AS BIGINT) AS sum_amp,
                 CAST(max(abs(v)) AS BIGINT) AS peak_amp
                FROM v GROUP BY doc_id, window_id)
          SELECT doc_id,
            CAST(CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
              WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END
              AS BIGINT) AS sample_rate,
            CAST(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 2 END AS BIGINT)
              AS channels,
            window_id, n_samples, sum_amp, peak_amp
          FROM w ORDER BY doc_id, window_id""",

    // Noisiness rebuilt sample-by-sample: the same planted PCM stream,
    // a lag window for the sign crossings (owned by the window holding
    // the RIGHT sample, first sample never a crossing), window rollup,
    // doc rollup, identical transition-ratio spelling.
    "q235_audio_noisiness" ->
      """WITH a AS (SELECT doc_id, n_chars % 200 + 17 AS ns FROM documents
               WHERE doc_id % 3 = 1),
          s AS (SELECT doc_id, unnest(range(0, ns)) AS k FROM a),
          v AS (SELECT doc_id, k, k // 32 AS window_id,
                 ((doc_id + k) * 2654435761) % 65536 - 32768 AS v FROM s),
          x AS (SELECT doc_id, window_id, v,
                 lag(v) OVER (PARTITION BY doc_id ORDER BY k) AS pv FROM v),
          w AS (SELECT doc_id, window_id,
                 CAST(count(*) AS BIGINT) AS n_samples,
                 CAST(sum(CASE WHEN pv IS NOT NULL
                     AND ((v >= 0) <> (pv >= 0)) THEN 1 ELSE 0 END)
                   AS BIGINT) AS zcr,
                 CAST(sum(abs(v)) AS BIGINT) AS l1
                FROM x GROUP BY doc_id, window_id),
          d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
                 CAST(sum(n_samples) AS BIGINT) AS n_samples,
                 CAST(sum(zcr) AS BIGINT) AS zcr,
                 CAST(sum(CASE WHEN zcr * 32 >= n_samples * 30
                   THEN 1 ELSE 0 END) AS BIGINT) AS high_zcr_windows,
                 CAST(max(l1) AS BIGINT) AS max_window_l1
                FROM w GROUP BY doc_id)
          SELECT doc_id, n_windows, n_samples, zcr, high_zcr_windows,
            max_window_l1,
            CASE WHEN n_samples > 1
              THEN round(CAST(zcr AS DOUBLE) / (n_samples - 1), 6) END
              AS noisiness
          FROM d ORDER BY doc_id""",

    "q201_neyman_allocation" ->
      """WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS sx, CAST(sum(c * c) AS BIGINT) AS sx2
             FROM (SELECT event_type,
                     CAST(floor(value * 100) AS BIGINT) AS c FROM events)
             GROUP BY 1),
          s AS (SELECT *, sqrt((CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                   / n) AS sigma FROM m),
          w AS (SELECT *, n * sigma AS w, sum(n * sigma) OVER () AS wsum FROM s),
          i AS (SELECT *, w / wsum * 1000 AS ideal,
                 CAST(floor(w / wsum * 1000) AS BIGINT) AS base FROM w),
          f AS (SELECT *, ideal - base AS frac,
                 CAST(1000 - sum(base) OVER () AS BIGINT) AS leftover,
                 CAST(row_number() OVER (ORDER BY ideal - base DESC, event_type)
                   AS BIGINT) AS rk
                FROM i)
          SELECT event_type, n, round(sigma, 6) AS sigma,
                 round(ideal, 6) AS ideal,
                 base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc
          FROM f ORDER BY event_type""",

    "q197_source_diversity" ->
      s"""WITH c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
              FROM (SELECT source, unnest($tokSql) AS token FROM documents)
              GROUP BY 1, 2),
          a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS vocab,
                 sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc,
                 CAST(sum(c * (c - 1)) AS BIGINT) AS cc1
                FROM c GROUP BY 1)
          SELECT source, n_tokens, vocab,
                 round(ln(CAST(n_tokens AS DOUBLE)) - clnc / n_tokens, 6)
                   AS shannon,
                 round(CAST(cc1 AS DOUBLE)
                   / CAST(n_tokens * (n_tokens - 1) AS DOUBLE), 6) AS simpson,
                 round(CAST(vocab AS DOUBLE) / n_tokens, 6) AS ttr
          FROM a ORDER BY source""",

    "q189_kanon_audit" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
                c_mktsegment AS segment,
                CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
                CAST(count(*) AS BIGINT) AS n,
                count(*) < 4 AS at_risk
         FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q183_compaction_plan" ->
      """WITH sh AS (SELECT
               CAST(md5_number_lower('shard:' || doc_id) & 63 AS BIGINT) AS shard_id,
               CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS bytes
             FROM documents GROUP BY 1),
          w AS (SELECT shard_id, bytes,
                 CAST(sum(bytes) OVER () AS BIGINT) AS total,
                 CAST(coalesce(sum(bytes) OVER (ORDER BY bytes DESC, shard_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS prefix
                FROM sh)
          SELECT shard_id, bytes, prefix // ((total + 15) // 16) AS bin
          FROM w ORDER BY bin, bytes DESC, shard_id""",

    "q177_dq_report" ->
      """WITH rows AS (
            SELECT 'lineitem_orphan_orderkey' AS check,
              (SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey)) AS n_bad,
              (SELECT count(*) FROM lineitem) AS n_total
            UNION ALL
            SELECT 'orders_orphan_custkey',
              (SELECT count(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey)),
              (SELECT count(*) FROM orders)
            UNION ALL
            SELECT 'orders_duplicate_orderkey',
              (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders),
              (SELECT count(*) FROM orders)
            UNION ALL
            SELECT 'events_null_value',
              (SELECT CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               FROM events),
              (SELECT count(*) FROM events)
            UNION ALL
            SELECT 'events_missing_days',
              (SELECT max(day) - min(day) + 1 - count(DISTINCT day) FROM
                (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
                 FROM events)),
              (SELECT max(day) - min(day) + 1 FROM
                (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
                 FROM events)))
          SELECT "check", n_bad, n_total,
            round(CAST(n_bad AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS bad_frac
          FROM rows ORDER BY "check" """,

    "q170_topk_bounded" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer),
          r AS (SELECT *, row_number() OVER (PARTITION BY c_nationkey
                  ORDER BY bal_cents DESC, c_custkey) AS rk FROM c)
          SELECT n_name, CAST(rk AS BIGINT) AS rk, c_custkey, bal_cents
          FROM r JOIN nation ON n_nationkey = c_nationkey
          WHERE rk <= 3 ORDER BY n_name, rk""",

    "q163_equifreq_bins" ->
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
                    FROM lineitem),
          b AS (SELECT min(v) AS mn, max(v) AS mx, count(*) AS n FROM v),
          h AS (SELECT ((v - mn) * 256) // (mx - mn + 1) AS cell,
                  count(*) AS cnt, min(v) AS lo, max(v) AS hi, max(n) AS n
                FROM v, b GROUP BY 1),
          c AS (SELECT *, sum(cnt) OVER (ORDER BY cell) AS cum FROM h)
          SELECT CAST(least(15, (cum * 16) // n) AS BIGINT) AS bin,
            CAST(sum(cnt) AS BIGINT) AS n_rows,
            min(lo) AS lo_cents, max(hi) AS hi_cents
          FROM c GROUP BY 1 ORDER BY bin""",

    "q164_weighted_sample" ->
      s"""WITH tk AS (SELECT doc_id,
                 generate_subscripts(lst, 1) - 1 AS pos, unnest(lst) AS tok
               FROM (SELECT doc_id, $tokSql AS lst FROM documents)),
          p AS (SELECT doc_id,
                 min(CAST(md5_number_lower('ws:' || doc_id || ':' || pos)
                     & 9223372036854775807 AS BIGINT)) AS prio,
                 count(*) AS n_tokens
                FROM tk GROUP BY doc_id),
          t AS (SELECT *, row_number() OVER (ORDER BY prio, doc_id) AS rk
                FROM p)
          SELECT rk, doc_id, n_tokens, prio FROM t
          WHERE rk <= 32 ORDER BY rk""",

    "q157_mixture_waterfill" ->
      s"""WITH av AS (SELECT source, count(*) AS avail
               FROM (SELECT source, unnest($tokSql) AS tok FROM documents)
               GROUP BY source),
          t AS (SELECT source, avail,
                  CAST((md5_number_lower('q157:' || source) & 7) + 1 AS BIGINT) AS w
                FROM av),
          t2 AS (SELECT *, CAST(avail AS DOUBLE) / w AS ratio FROM t),
          t3 AS (SELECT *,
                   coalesce(sum(avail) OVER (ORDER BY ratio, source
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre_a,
                   sum(w) OVER (ORDER BY ratio, source
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS wrem,
                   (sum(avail) OVER () * 3) // 5 AS b
                 FROM t2),
          t4 AS (SELECT *, b - pre_a AS brem,
                   avail * wrem <= (b - pre_a) * w AS sat
                 FROM t3),
          t5 AS (SELECT *,
                   max(CASE WHEN NOT sat THEN brem END) OVER () AS lam_n,
                   max(CASE WHEN NOT sat THEN wrem END) OVER () AS lam_d
                 FROM t4)
          SELECT source, avail, w AS weight, sat AS saturated,
                 CAST(CASE WHEN sat THEN avail
                      ELSE (lam_n * w) // lam_d END AS BIGINT) AS alloc
          FROM t5 ORDER BY source""",

    "q83_stratified_split" ->
      """WITH t AS (SELECT doc_id, source,
             CAST(md5_number_lower('split:' || doc_id) & 1023 AS BIGINT) AS bucket
           FROM documents)
         SELECT doc_id, source, bucket,
           CASE WHEN bucket < 819 THEN 'train'
                WHEN bucket < 922 THEN 'valid'
                ELSE 'test' END AS split
         FROM t ORDER BY doc_id""",

    // The oracle recomputes the edge set brute-force (q31's SQL) and
    // takes the transitive closure with a recursive CTE — component
    // label = min reachable doc_id, independently of Spark's
    // propagation algorithm.
    // Morton spread unrolled as chained CTE columns; DuckDB's `//` is
    // exact integer division (the Spark side's double-div + cast is
    // exact here: quotient <= 65535 and the rounding error 2^-37 is
    // smaller than the 2^-32 minimum distance to an integer boundary).
    "q144_zorder_layout" ->
      """WITH b AS (SELECT min(l_partkey) AS pmin,
                greatest(max(l_partkey) - min(l_partkey), 1) AS pspan,
                min(l_suppkey) AS smin,
                greatest(max(l_suppkey) - min(l_suppkey), 1) AS sspan
              FROM lineitem),
          n AS (SELECT l_partkey, l_suppkey,
                ((l_partkey - pmin) * 65535) // pspan AS xs,
                ((l_suppkey - smin) * 65535) // sspan AS ys
              FROM lineitem, b),
          s1 AS (SELECT *, (xs | (xs << 8)) & 16711935 AS x1,
                           (ys | (ys << 8)) & 16711935 AS y1 FROM n),
          s2 AS (SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2,
                           (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
          s3 AS (SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3,
                           (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
          s4 AS (SELECT *, (x3 | (x3 << 1)) & 1431655765 AS x4,
                           (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3),
          z AS (SELECT l_partkey, l_suppkey, x4 | (y4 << 1) AS zval FROM s4)
          SELECT zval >> 24 AS shard_id, CAST(count(*) AS BIGINT) AS n_rows,
                 min(l_partkey) AS p_min, max(l_partkey) AS p_max,
                 min(l_suppkey) AS s_min, max(l_suppkey) AS s_max,
                 min(zval) AS z_min, max(zval) AS z_max
          FROM z GROUP BY shard_id ORDER BY shard_id""",


    "q147_balanced_shards" ->
      """WITH b AS (SELECT min(l_partkey) AS pmin,
                greatest(max(l_partkey) - min(l_partkey), 1) AS pspan,
                min(l_suppkey) AS smin,
                greatest(max(l_suppkey) - min(l_suppkey), 1) AS sspan
              FROM lineitem),
          n AS (SELECT ((l_partkey - pmin) * 65535) // pspan AS xs,
                       ((l_suppkey - smin) * 65535) // sspan AS ys
              FROM lineitem, b),
          s1 AS (SELECT (xs | (xs << 8)) & 16711935 AS x1,
                        (ys | (ys << 8)) & 16711935 AS y1 FROM n),
          s2 AS (SELECT (x1 | (x1 << 4)) & 252645135 AS x2,
                        (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
          s3 AS (SELECT (x2 | (x2 << 2)) & 858993459 AS x3,
                        (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
          s4 AS (SELECT (x3 | (x3 << 1)) & 1431655765 AS x4,
                        (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3),
          z AS (SELECT x4 | (y4 << 1) AS zval FROM s4),
          c AS (SELECT zval >> 24 AS cell, count(*) AS cnt FROM z GROUP BY 1),
          a AS (SELECT cell,
                coalesce(sum(cnt) OVER (ORDER BY cell
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
                sum(cnt) OVER () AS tot FROM c),
          m AS (SELECT cell, CAST((cum * 16) // tot AS BIGINT) AS bin FROM a)
          SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
                 min(zval) AS z_min, max(zval) AS z_max
          FROM z JOIN m ON (zval >> 24) = m.cell
          GROUP BY bin ORDER BY bin""",

    "q88_sequence_pack" ->
      s"""WITH t AS (SELECT doc_id, source,
                CAST(len($tokSql) AS BIGINT) AS n_tokens FROM documents),
          c AS (SELECT doc_id, source, n_tokens,
                coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
                FROM t)
          SELECT doc_id, source, n_tokens,
            CAST(prev_cum // 256 AS BIGINT) AS bin,
            CAST(prev_cum % 256 AS BIGINT) AS bin_offset
          FROM c ORDER BY doc_id""",

    "q90_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $shSql AS sh
                     FROM (SELECT doc_id, $tokSql AS lst FROM documents) WHERE len(lst) >= 3),
          e AS (SELECT DISTINCT unnest(sh) AS g FROM t WHERE doc_id % 20 = 0),
          d AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM t
                WHERE doc_id % 20 <> 0)
          SELECT doc_id, count(*) AS n_shared,
            CAST(count(*) AS DOUBLE) / max(n_sh) AS contam_frac
          FROM d JOIN e USING (g)
          GROUP BY doc_id ORDER BY doc_id""",

    "q91_mixture_sample" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         m AS (SELECT min(n) AS nmin FROM c),
         r AS (SELECT lang, sqrt(CAST(nmin AS DOUBLE) / n) AS rate FROM c, m),
         t AS (SELECT doc_id, documents.lang, rate,
                 CAST(md5_number_lower('mix:' || doc_id) & 4095 AS BIGINT) AS bucket
               FROM documents JOIN r USING (lang))
         SELECT doc_id, lang, 1.0 / rate AS weight FROM t
         WHERE CAST(bucket AS DOUBLE) < rate * 4096.0
         ORDER BY doc_id""",

    "q104_curation_funnel" ->
      s"""WITH $qualityCteSql,
          d AS (SELECT doc.doc_id, doc.text,
                  CAST(len($tokSql) AS BIGINT) AS n_tokens, fk.keep AS kept
                FROM documents doc JOIN fk ON doc.doc_id = fk.doc_id),
          w AS (SELECT doc_id, n_tokens, kept,
                  kept AND doc_id = min(CASE WHEN kept THEN doc_id END)
                    OVER (PARTITION BY md5(text)) AS final
                FROM d)
          SELECT count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
            CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS docs_after_gate,
            CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_after_gate,
            CAST(sum(CASE WHEN final THEN 1 ELSE 0 END) AS BIGINT) AS docs_final,
            CAST(sum(CASE WHEN final THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_final
          FROM w""",

    "q106_chunk_windows" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS tok FROM documents),
          n AS (SELECT doc_id, tok, CAST(len(tok) AS BIGINT) AS n_tokens FROM t),
          k AS (SELECT doc_id, tok, n_tokens,
                  CASE WHEN n_tokens > 64 THEN (n_tokens - 64 + 47) // 48
                       ELSE 0 END AS kmax FROM n),
          e AS (SELECT doc_id, tok, n_tokens,
                  unnest(generate_series(0, kmax)) AS chunk_id FROM k)
          SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
            CAST(chunk_id * 48 AS BIGINT) AS start_tok,
            CAST(least(64, n_tokens - chunk_id * 48) AS BIGINT) AS chunk_len,
            array_to_string(list_slice(tok, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ')
              AS chunk_text
          FROM e ORDER BY doc_id, chunk_id""",

    "q109_mixture_materialize" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         m AS (SELECT max(n) AS nmax FROM c),
         e AS (SELECT lang, sqrt(CAST(nmax AS DOUBLE) / n) AS epochs FROM c, m),
         t AS (SELECT doc_id, documents.lang, epochs,
                 CAST(md5_number_lower('epoch:' || doc_id) & 4095 AS BIGINT) AS bucket
               FROM documents JOIN e USING (lang)),
         r AS (SELECT doc_id, lang,
                 CAST(floor(epochs) AS BIGINT) +
                   CASE WHEN CAST(bucket AS DOUBLE)
                          < (epochs - floor(epochs)) * 4096.0
                        THEN 1 ELSE 0 END AS n_reps FROM t),
         x AS (SELECT doc_id, lang,
                 unnest(generate_series(0, n_reps - 1)) AS rep
               FROM r WHERE n_reps > 0)
         SELECT doc_id, lang, CAST(rep AS BIGINT) AS rep,
           CAST(md5_number_lower('ord:' || doc_id || ':' || rep)
             & 4611686018427387903 AS BIGINT) AS shuffle_key
         FROM x ORDER BY shuffle_key, doc_id, rep""",

    "q101_token_budget_fill" ->
      s"""WITH t AS (SELECT doc_id, lang, CAST(len($tokSql) AS BIGINT) AS n_tokens,
                 CAST(md5_number_lower('fill:' || doc_id) & 9223372036854775807 AS BIGINT) AS h
               FROM documents),
          c AS (SELECT doc_id, lang, n_tokens,
                  coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
                FROM t)
          SELECT doc_id, lang, n_tokens, CAST(prev_cum AS BIGINT) AS prev_cum
          FROM c WHERE prev_cum < 5000 ORDER BY doc_id""",

    "q97_curation_pipeline" ->
      s"""WITH $qualityCteSql,
          kept AS (SELECT d.doc_id, d.text, d.source
                   FROM documents d JOIN fk USING (doc_id) WHERE fk.keep),
          ded AS (SELECT doc_id, text, source FROM (
                    SELECT doc_id, text, source,
                      min(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM kept)
                  WHERE doc_id = keeper),
          sp AS (SELECT doc_id, source,
                   CASE WHEN CAST(md5_number_lower('split:' || doc_id) & 1023 AS BIGINT) < 819 THEN 'train'
                        WHEN CAST(md5_number_lower('split:' || doc_id) & 1023 AS BIGINT) < 922 THEN 'valid'
                        ELSE 'test' END AS split,
                   CAST(len($tokSql) AS BIGINT) AS n_tokens
                 FROM ded),
          pc AS (SELECT doc_id, source, split, n_tokens,
                   coalesce(sum(n_tokens) OVER (PARTITION BY split, source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
                 FROM sp)
          SELECT doc_id, source, split, n_tokens,
            CAST(prev_cum // 256 AS BIGINT) AS bin
          FROM pc ORDER BY doc_id""",

    "q96_corpus_report" ->
      s"""WITH g AS (SELECT lang, source, count(*) AS n_docs,
                 CAST(sum(len($tokSql)) AS BIGINT) AS n_tokens,
                 CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
               FROM documents GROUP BY lang, source),
          s AS (SELECT lang, source, n_docs, n_tokens, n_bytes,
                  CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS token_share
                FROM g)
          SELECT lang, source, n_docs, n_tokens, n_bytes, token_share,
            round(sum(token_share) OVER (ORDER BY n_tokens DESC, lang, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 12) AS cum_share
          FROM s ORDER BY n_tokens DESC, lang, source""",

    // High-nibble histogram via hex expansion: keep char 1 of each hex
    // byte pair, count each hex digit — integer-exact, no float compare.
    "q40_multimodal_features" ->
      """WITH h AS (SELECT doc_id,
               regexp_replace(hex(encode(text)), '(.)(.)', '\1', 'g') AS hn,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
             FROM documents)
         SELECT doc_id, n_bytes,
           array_to_string(list_transform(range(0, 16), b ->
             length(hn) - length(replace(hn, substr('0123456789ABCDEF', CAST(b AS INT) + 1, 1), ''))), ',') AS features
         FROM h ORDER BY doc_id""",


    "q153_skew_report" -> {
      def block(table: String, key: String) =
        s"""SELECT 'def_name' AS key_name,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(cnt) AS BIGINT) AS max_cnt,
             (SELECT max(k) FROM c_$key WHERE cnt =
               (SELECT max(cnt) FROM c_$key)) AS hot_key,
             round((max(cnt) * count(*)) / sum(cnt), 6) AS skew_multiple
           FROM c_$key""".replace("def_name", s"$table.$key")
      s"""WITH c_user_id AS (SELECT user_id AS k, count(*) AS cnt
              FROM events GROUP BY 1),
          c_l_partkey AS (SELECT l_partkey AS k, count(*) AS cnt
              FROM lineitem GROUP BY 1),
          c_l_suppkey AS (SELECT l_suppkey AS k, count(*) AS cnt
              FROM lineitem GROUP BY 1)
          SELECT * FROM (
            ${block("events", "user_id")}
            UNION ALL ${block("lineitem", "l_partkey")}
            UNION ALL ${block("lineitem", "l_suppkey")})
          ORDER BY key_name"""
    },


    // the components CTE is the shared q86/q143 oracle verbatim; the
    // split rule is q83's
    "q154_split_leakage" ->
      s"""WITH comp AS ($dupComponentsSql),
          sp AS (SELECT doc_id,
              CASE WHEN (md5_number_lower('split:' || doc_id) & 1023) < 819 THEN 'train'
                   WHEN (md5_number_lower('split:' || doc_id) & 1023) < 922 THEN 'valid'
                   ELSE 'test' END AS split
            FROM documents),
          g AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
              CAST(sum(CASE WHEN split = 'valid' THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
              CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
            FROM comp JOIN sp USING (doc_id) GROUP BY cluster_id)
          SELECT * FROM g
          WHERE (CASE WHEN n_train > 0 THEN 1 ELSE 0 END
               + CASE WHEN n_valid > 0 THEN 1 ELSE 0 END
               + CASE WHEN n_test > 0 THEN 1 ELSE 0 END) > 1
          ORDER BY cluster_id""",


    "q152_negative_sampling" ->
      """WITH n AS (SELECT count(*) AS n FROM documents),
          x AS (SELECT doc_id, t.range AS k FROM documents, range(0, 4) t),
          h AS (SELECT doc_id, k,
                CAST((md5_number_lower('neg:' || doc_id || ':' || k)
                      & 9223372036854775807) % (SELECT n FROM n) AS BIGINT) AS cand
              FROM x),
          g AS (SELECT doc_id, CAST(k AS BIGINT) AS k,
                CASE WHEN cand = doc_id
                     THEN CAST((cand + 1) % (SELECT n FROM n) AS BIGINT)
                     ELSE cand END AS neg_id
              FROM h)
          SELECT g.doc_id, g.k, g.neg_id, d.source AS neg_source
          FROM g JOIN documents d ON d.doc_id = g.neg_id
          ORDER BY g.doc_id, g.k""",


    "q151_source_divergence" -> {
      def pa(v: String, n: String) = s"(($v[i] + 1.0) / ($n + 256.0))"
      val (a, b) = (pa("va", "na"), pa("vb", "nb"))
      s"""WITH tk AS (SELECT source,
               CAST(md5_number_lower('q151:' || tok) & 255 AS BIGINT) AS b
             FROM (SELECT source, unnest($tokSql) AS tok FROM documents)),
          cn AS (SELECT source, b, count(*) AS c FROM tk GROUP BY 1, 2),
          sp AS (SELECT s.source, r.range AS b
                 FROM (SELECT DISTINCT source FROM documents) s, range(0, 256) r),
          f AS (SELECT sp.source, sp.b, coalesce(cn.c, 0) AS c
                FROM sp LEFT JOIN cn USING (source, b)),
          vec AS (SELECT source, list(c ORDER BY b) AS v,
                   CAST(sum(c) AS BIGINT) AS n FROM f GROUP BY source)
          SELECT a.source AS source_a, b.source AS source_b,
            round(list_sum([0.5 * ($a * log2(2.0 * $a / ($a + $b))
                                 + $b * log2(2.0 * $b / ($a + $b)))
                            for i in range(1, 257)]), 6) AS js_divergence
          FROM (SELECT source, v AS va, n AS na FROM vec) a
          JOIN (SELECT source, v AS vb, n AS nb FROM vec) b
            ON a.source < b.source
          ORDER BY source_a, source_b"""
    },


    // Bottom-k-by-hash stratified sample rebuilt as the rank form the
    // engine deliberately avoids at scale: row_number over priority.
    "q128_stratified_sample" ->
      """WITH p AS (SELECT source, doc_id,
             CAST(md5_number_lower('samp:' || doc_id::VARCHAR)
               & 9223372036854775807 AS BIGINT) AS prio
           FROM documents),
         r AS (SELECT source, doc_id, prio,
               row_number() OVER (PARTITION BY source ORDER BY prio, doc_id) AS rk
               FROM p)
         SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, prio
         FROM r WHERE rk <= 8 ORDER BY source, rk""",


    // Expected media-header fields recomputed ARITHMETICALLY from the
    // source columns — independent of MediaKernel's encoder AND parser,
    // so a shared endianness/layout bug on the Spark side cannot cancel.
    // payload_bytes pins the encoder's structural layout (PNG: 8 sig +
    // 25 IHDR + 12 IDAT + 12 IEND = 57; WAV: canonical 44).
    // the mod-derived field formulas are q127's; truncated docs
    // (doc_id mod 11 = 5) keep their sniffed container but lose all
    // fields and validity — recomputed arithmetically, the parser
    // never consulted
    // MP4 triage re-derived arithmetically from the plant parameters
    // (the q127/q226 posture: an encode/walk bug cannot cancel out
    // because the oracle never touches the bytes). Truncated docs
    // (doc_id % 11 = 5) count rows but contribute NULL fields.
    "q251_mp4_triage" ->
      """WITH m AS (SELECT source,
           CASE doc_id % 4 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
                WHEN 2 THEN 'avc1' ELSE 'qt' END AS brand,
           (doc_id % 11 <> 5) AS ok,
           CASE WHEN doc_id % 3 = 0 THEN 600
                WHEN doc_id % 3 = 1 THEN 1000 ELSE 90000 END AS ts,
           doc_id % 9000 + 600 AS dur,
           doc_id % 3 AS nv, doc_id % 2 AS na
          FROM documents)
         SELECT source, brand, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(sum(CASE WHEN ok THEN dur * 1000 // ts END) AS BIGINT)
             AS sum_dur_ms,
           CAST(sum(CASE WHEN ok THEN nv END) AS BIGINT) AS n_video_tracks,
           CAST(sum(CASE WHEN ok THEN na END) AS BIGINT) AS n_audio_tracks
         FROM m GROUP BY source, brand ORDER BY source, brand""",

    "q226_media_triage" ->
      """WITH m AS (SELECT source,
           CASE WHEN doc_id % 12 = 2 THEN 'mp4'
                WHEN doc_id % 3 = 0 THEN 'png'
                WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'jpeg' END AS container,
           (doc_id % 11 <> 5) AS ok,
           CASE WHEN doc_id % 11 <> 5 AND doc_id % 3 = 0 THEN n_chars % 1023 + 1
                WHEN doc_id % 11 <> 5 AND doc_id % 3 = 2 AND doc_id % 12 <> 2
                  THEN n_chars % 511 + 1
             END AS width,
           CASE WHEN doc_id % 11 <> 5 AND doc_id % 3 = 0 THEN doc_id % 767 + 1
                WHEN doc_id % 11 <> 5 AND doc_id % 3 = 2 AND doc_id % 12 <> 2
                  THEN doc_id % 383 + 1
             END AS height,
           CASE WHEN doc_id % 11 <> 5 AND doc_id % 3 = 1 THEN
             CASE WHEN doc_id % 5 = 0 THEN 8000 WHEN doc_id % 5 = 1 THEN 16000
                  WHEN doc_id % 5 = 2 THEN 22050 WHEN doc_id % 5 = 3 THEN 44100
                  ELSE 48000 END END AS sample_rate
          FROM documents)
         SELECT source, container, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(sum(width) AS BIGINT) AS sum_width,
           CAST(sum(height) AS BIGINT) AS sum_height,
           CAST(sum(sample_rate) AS BIGINT) AS sum_sample_rate
         FROM m GROUP BY source, container ORDER BY source, container""",

    "q227_l_diversity" ->
      """WITH cells AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
               c_mktsegment AS segment,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               CAST(count(*) AS BIGINT) AS c
             FROM customer GROUP BY 1, 2, 3)
         SELECT nation, segment, CAST(sum(c) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS l_distinct,
           round(ln(CAST(sum(c) AS DOUBLE)) -
             sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / sum(c), 6)
             AS entropy,
           (count(*) < 3) AS at_risk
         FROM cells GROUP BY nation, segment ORDER BY nation, segment""",

    "q127_media_decode" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'png'
                WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'jpeg' END AS container,
           CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars % 1023 + 1 AS BIGINT)
                WHEN doc_id % 3 = 2 THEN CAST(n_chars % 511 + 1 AS BIGINT) END AS width,
           CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 767 + 1 AS BIGINT)
                WHEN doc_id % 3 = 2 THEN CAST(doc_id % 383 + 1 AS BIGINT) END AS height,
           CASE WHEN doc_id % 3 IN (0, 2) THEN CAST(8 AS BIGINT) END AS bit_depth,
           CASE WHEN doc_id % 3 = 0 THEN
             CAST(CASE WHEN doc_id % 4 = 0 THEN 6 ELSE 2 END AS BIGINT)
                WHEN doc_id % 3 = 2 THEN
             CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS BIGINT) END AS color_type,
           CASE WHEN doc_id % 3 = 1 THEN
             CAST(CASE WHEN doc_id % 5 = 0 THEN 8000
                       WHEN doc_id % 5 = 1 THEN 16000
                       WHEN doc_id % 5 = 2 THEN 22050
                       WHEN doc_id % 5 = 3 THEN 44100
                       ELSE 48000 END AS BIGINT) END AS sample_rate,
           CASE WHEN doc_id % 3 = 1 THEN
             CAST(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 2 END AS BIGINT) END AS channels,
           CASE WHEN doc_id % 3 = 1 THEN
             CAST(CASE WHEN doc_id % 8 < 4 THEN 8 ELSE 16 END AS BIGINT) END AS bits_per_sample,
           true AS valid,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 57
                     WHEN doc_id % 3 = 1 THEN 44
                     WHEN doc_id % 2 = 0 THEN 41 ELSE 35 END AS BIGINT) AS payload_bytes
         FROM documents ORDER BY doc_id""",


    // classifier gate, block keep-first rewrite, split, manifest.
    "q126_curation_v2" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
          g AS (SELECT doc_id, toks FROM t WHERE
                coalesce(list_sum(list_transform(toks, tok ->
                  CAST(md5_number_lower('qc:' || tok) & 1023 AS BIGINT)
                    * 2654435761 % 2048 - 1024)), 0) >= 0),
          b0 AS (SELECT doc_id, toks,
                  unnest(range(0, CAST(ceil(len(toks) / 16.0) AS BIGINT))) AS idx
                 FROM g WHERE len(toks) > 0),
          b AS (SELECT doc_id, idx,
                  array_to_string(list_slice(toks,
                    CAST(idx AS INT) * 16 + 1, CAST(idx AS INT) * 16 + 16), ' ') AS blk
                FROM b0),
          k AS (SELECT doc_id, idx, blk,
                row_number() OVER (PARTITION BY blk ORDER BY doc_id, idx) AS rn FROM b),
          cl AS (SELECT doc_id,
                 coalesce(string_agg(CASE WHEN rn = 1 THEN blk END, ' ' ORDER BY idx), '') AS clean_text
                 FROM k GROUP BY doc_id),
          sp AS (SELECT doc_id, clean_text,
                 CASE WHEN CAST(md5_number_lower('split:' || doc_id) & 1023 AS BIGINT) < 819 THEN 'train'
                      WHEN CAST(md5_number_lower('split:' || doc_id) & 1023 AS BIGINT) < 922 THEN 'valid'
                      ELSE 'test' END AS split
                 FROM cl WHERE length(clean_text) > 0)
          SELECT split, count(*) AS n_docs,
            CAST(sum(len(string_split_regex(trim(clean_text), '\\s+'))) AS BIGINT) AS n_tokens,
            CAST(sum(CAST(md5_number_lower(clean_text) & 2147483647 AS BIGINT)) AS BIGINT) AS content_sum
          FROM sp GROUP BY split ORDER BY split""",


    // Shard manifest rebuilt: same id-hash sharding, token sizes, and
    // order-free 31-bit content digest sum.
    "q125_shard_manifest" ->
      s"""WITH d AS (SELECT doc_id,
               CAST(md5_number_lower('shard:' || doc_id::VARCHAR) & 63 AS BIGINT) AS shard_id,
               len($tokSql) AS n_tokens,
               CAST(md5_number_lower(text) & 2147483647 AS BIGINT) AS dh
             FROM documents)
          SELECT shard_id, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
            CAST(sum(dh) AS BIGINT) AS content_sum
          FROM d GROUP BY shard_id ORDER BY shard_id""",


    // Frame sampling with the decode real: the oracle recomputes every
    // sampled scanline's stats arithmetically from the planted pixel
    // formula — never touching PNG bytes — so a deflate/inflate or
    // filter/unfilter bug on either codec side cannot cancel out.
    "q123_multimodal_frames" ->
      """WITH a AS (SELECT doc_id, 32 + doc_id % 32 AS w,
               16 + doc_id % 16 AS h FROM documents),
          px AS (SELECT doc_id, w, unnest(range(0, w * h)) AS i FROM a),
          v AS (SELECT doc_id, i // w AS y,
                 ((doc_id + i) * 2654435761) % 256 AS lum FROM px
                WHERE (i // w) % 2 = 0)
          SELECT doc_id, CAST(y // 2 AS BIGINT) AS frame_id,
            CAST(y AS BIGINT) AS y, CAST(count(*) AS BIGINT) AS n_px,
            CAST(sum(lum) AS BIGINT) AS sum_lum,
            CAST(min(lum) AS BIGINT) AS min_lum,
            CAST(max(lum) AS BIGINT) AS max_lum
          FROM v GROUP BY doc_id, y ORDER BY doc_id, y""",

    // every column recomputed arithmetically from doc_id: the planted
    // pixel formula, per-scanline cuts, and the mod-derived dims —
    // independent of both PNG codec sides (q205's posture)
    "q222_image_row_stats" ->
      """WITH a AS (SELECT doc_id, 16 + doc_id % 16 AS w,
               8 + doc_id % 8 AS h FROM documents WHERE doc_id % 3 = 0),
          px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM a),
          v AS (SELECT doc_id, w, h, i // w AS y,
                 ((doc_id + i) * 2654435761) % 256 AS lum FROM px)
          SELECT doc_id, CAST(max(w) AS BIGINT) AS width,
            CAST(max(h) AS BIGINT) AS height,
            CAST(y AS BIGINT) AS y, CAST(count(*) AS BIGINT) AS n_px,
            CAST(sum(lum) AS BIGINT) AS sum_lum,
            CAST(min(lum) AS BIGINT) AS min_lum,
            CAST(max(lum) AS BIGINT) AS max_lum
          FROM v GROUP BY doc_id, y ORDER BY doc_id, y""",

    // JPEG arm: the decoded pixel field is the flat-block formula —
    // block (x//8, y//8) of the ceil(w/8)-wide block grid — which the
    // all-ones quant table preserves exactly through the lossy codec
    "q242_jpeg_row_stats" ->
      """WITH a AS (SELECT doc_id, 16 + doc_id % 16 AS w,
               8 + doc_id % 8 AS h FROM documents WHERE doc_id % 3 = 1),
          px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM a),
          bx AS (SELECT doc_id, w, h, i,
                 (doc_id + ((i // w) // 8) * ((w + 7) // 8)
                   + (i % w) // 8) % 32768 AS x FROM px),
          v AS (SELECT doc_id, w, h, i // w AS y,
                 (((x * x + x) * 2654435761) // 65536) % 256 AS lum
                FROM bx)
          SELECT doc_id, CAST(max(w) AS BIGINT) AS width,
            CAST(max(h) AS BIGINT) AS height,
            CAST(y AS BIGINT) AS y, CAST(count(*) AS BIGINT) AS n_px,
            CAST(sum(lum) AS BIGINT) AS sum_lum,
            CAST(min(lum) AS BIGINT) AS min_lum,
            CAST(max(lum) AS BIGINT) AS max_lum
          FROM v GROUP BY doc_id, y ORDER BY doc_id, y""",


    "q246_jpeg_quality_triage" ->
      """WITH k AS (SELECT unnest([16,11,10,16,24,40,51,61,
               12,12,14,19,26,58,60,55, 14,13,16,24,40,57,69,56,
               14,17,22,29,51,87,80,62, 18,22,37,56,68,109,103,77,
               24,35,55,64,81,104,113,92, 49,64,78,87,103,121,120,101,
               72,92,95,98,112,100,103,99]) AS kv),
          d AS (SELECT doc_id, CAST(35 + (doc_id % 12) * 5 AS BIGINT)
                 AS quality FROM documents),
          sc AS (SELECT doc_id, quality,
                  CASE WHEN quality < 50 THEN 5000 // quality
                       ELSE 200 - 2 * quality END AS s
                 FROM d),
          g AS (SELECT doc_id, quality,
                 CAST(greatest(1, least(255, (16 * s + 50) // 100))
                   AS BIGINT) AS dqt_dc,
                 CAST(sum(greatest(1, least(255, (kv * s + 50) // 100)))
                   AS BIGINT) AS dqt_sum
                FROM sc, k GROUP BY doc_id, quality, s),
          e AS (SELECT doc_id, quality, dqt_dc, dqt_sum,
                 (200 * dqt_sum + 3688) // 7376 AS s_est
                FROM g),
          f AS (SELECT doc_id, quality, dqt_dc, dqt_sum,
                 CAST(CASE WHEN s_est >= 100 THEN 5000 // s_est
                      ELSE (200 - s_est) // 2 END AS BIGINT) AS q_est
                FROM e)
          SELECT doc_id, quality, dqt_dc, dqt_sum, q_est,
            q_est - quality AS est_err
          FROM f ORDER BY doc_id""",

    // Snapshot diff by content hash: the same derived old/new versions,
    // one full-outer join, status from hash presence/equality.
    "q119_corpus_diff" ->
      """WITH o AS (SELECT doc_id,
               md5(CASE WHEN doc_id % 7 = 3 THEN text || ' [draft]' ELSE text END) AS old_hash
             FROM documents WHERE doc_id % 10 <> 0),
          n AS (SELECT doc_id, md5(text) AS new_hash
                FROM documents WHERE doc_id % 10 <> 1)
          SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_hash, new_hash,
            CASE WHEN old_hash IS NULL THEN 'added'
                 WHEN new_hash IS NULL THEN 'removed'
                 WHEN old_hash <> new_hash THEN 'changed'
                 ELSE 'unchanged' END AS status
          FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
          ORDER BY doc_id""",
  )
}
