package graft.queries

import graft.Tables
import graft.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over the documents/embeddings
  * tables: deduplication (exact, canonical-fingerprint, MinHash+LSH,
  * SimHash, exact n-gram-Jaccard via df-ordered prefix filtering),
  * similarity search (brute-force cosine top-k + LSH-banded
  * near-dup), text analysis (lang-id, quality, token counts), corpus
  * curation (deterministic stratified splits, vocabulary top-k,
  * gap sessionization), multimodal plumbing.
  *
  * Scale design (100 TB):
  *   - MinHash-LSH: the only shuffle of document payloads is the final
  *     shingle re-join; the band self-join shuffles just
  *     (band_id, band_hash, doc_id) triples. Candidate pairs are tiny
  *     relative to the corpus; exact-Jaccard verification touches only
  *     candidates (never O(n^2)).
  *   - SimHash: signatures are 8 bytes/doc; the 4x16-bit band join is a
  *     shuffle of (band, key, id, sig) only.
  *   - Brute-force cosine is the correctness baseline; at scale the
  *     banded/LSH variants bound the join fan-out. The query-side table
  *     is broadcast.
  *   - All thresholded filters compare numbers computed identically in
  *     the DuckDB oracle (integer-exact set sizes; double arithmetic
  *     with fixed evaluation order, rounded before compare).
  */
object Pipeline {

  /** Cache key for the per-dataset memos below: dir plus a cheap
    * content fingerprint (sorted name:size:mtime of the dir's files),
    * so an in-place rewrite of a dataset under the same path
    * invalidates memoized derived state (ADVICE r9 — a plain dir key
    * silently served stale centroids/codebooks after a rewrite). Stale
    * entries for old fingerprints are simply abandoned; growth is
    * bounded by rewrites-per-JVM, which is ~0 outside tests. */
  private def dirKey(dir: String): String = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File]).sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
    dir + "|" + files.mkString(",").hashCode
  }

  /** Fingerprint-keyed memoization that runs `compute` OUTSIDE the
    * ConcurrentHashMap bin lock: the memoized builds are multi-pass
    * Spark jobs, and computeIfAbsent would hold the lock across them
    * (blocking unrelated keys that hash to the same bin). Two racing
    * first calls may both compute; putIfAbsent keeps the winner — every
    * build here is deterministic, so the duplicate work is identical
    * and harmless. */
  private def memo[V <: AnyRef](cache: java.util.concurrent.ConcurrentHashMap[String, V],
      dir: String)(compute: => V): V = {
    val k = dirKey(dir)
    val cached = cache.get(k)
    if (cached != null) cached
    else {
      val v = compute
      val prev = cache.putIfAbsent(k, v)
      if (prev != null) prev else v
    }
  }

  /** q37's O(n^2) guard count, one scan per dataset fingerprint per
    * JVM (see [[dirKey]]). */
  private val embCount = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val docCount = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** q98's corpus token total, memoized per dataset dir (same
    * immutability assumption as embCount above). */
  private val tokCount = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** q136's train-split trigram-position total, memoized per dataset
    * dir. */
  private val triCount = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** q112's corpus stats (doc count N, average token-length avgdl),
    * memoized per dataset dir (same immutability assumption as
    * embCount) — one tiny global aggregate whose two scalars attach to
    * the scoring expression as plan literals. */
  private val bm25Stats = new java.util.concurrent.ConcurrentHashMap[String, (Long, Double)]()

  /** q105's eval-split Bloom bitmap (m = 2^20 bits = 128 KiB), memoized
    * per dataset dir (same immutability assumption as embCount). The
    * classic two-job sketch build: job 1 reduces the eval split to a
    * constant-size bitmap on the driver — the sketch analogue of
    * collecting a broadcast-join side — and job 2 ships it to every
    * task as a plan literal. */
  private val bloomBits = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  private val bloomJoinBits = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  /** q114's converged fixed-point centroids, memoized per dataset dir
    * (same immutability assumption as embCount). Lloyd's iterations are
    * a DRIVER-side control loop like q86's label propagation: each
    * round is one distributed assignment pass + one k*d-row partial
    * aggregate; only the k*d centroid cells (k=8, d=64 -> 512 longs)
    * ever reach the driver, never data rows. */
  private val kmeansCents =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, Array[Long])]]()

  /** q118's TRAINED product-quantization codebook, memoized per dataset
    * dir (same immutability assumption as embCount): per subspace, a
    * fixed-point Lloyd's k-means over the corpus subvectors — q114's
    * reproducibility guarantee (integer sums, floor-mean updates,
    * lowest-id ties) applied per subspace. Keyed (subspace -> (cluster
    * id -> 8 quantized longs)). Training is the q114 control loop: the
    * k*m*d = 1024 centroid cells come to the driver, never data rows. */
  private val pqCodebook = new java.util.concurrent.ConcurrentHashMap[
    String, IndexedSeq[Seq[(Long, Array[Long])]]]()

  /** q155's (mean, top-component) pair, memoized per dataset dir (same
    * immutability assumption as embCount). The power iteration is a
    * driver control loop on the 64x64 INTEGER covariance matrix — only
    * the 2080-cell Gramian triangle and the 64-cell mean ever reach the
    * driver, never data rows. */
  private val pcaComponent = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Long], Array[Long])]()

  private def toks(c: Column) = tokens(c)

  /** Shared "this doc has at least one token" predicate for the
    * trained-model ops (q132/q133): null or whitespace-only text
    * produces no usable features, and the two engines disagree on how
    * such rows fall out of their respective plans (Spark keeps a
    * null/zero row; DuckDB's unnest join drops it). Both sides filter
    * on this same predicate so featureless docs are out by
    * construction. SQL twin: [[hasTokensSql]]. */
  private val hasTokens: Column =
    col("text").isNotNull && length(trim(col("text"))) > 0
  private val hasTokensSql = "text IS NOT NULL AND trim(text) <> ''"

  /** documents + distinct 3-gram shingles (docs shorter than 3 tokens keep
    * an empty shingle set and can never pair). */
  private def shingled(t: Tables) =
    t.documents.select(col("doc_id"),
      shingles(toks(col("text")), 3).as("sh"))

  /** q130's trained merge table, memoized per dataset fingerprint (same
    * contract as kmeansCents/pqCodebook): T rounds, each one
    * distributed pair-count pass + a 1-row argmax to the driver. */
  private val bpeMerges =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[(String, String, Long)]]()

  /** The q130 training loop over any (text) frame: word-type counts
    * once, then per round apply the merges learned so far (bpe_apply
    * kernel, plan literal), count adjacent symbol pairs weighted by
    * word frequency, and take the (count desc, lhs, rhs) argmax. The
    * driver receives ONE row per round; everything else is a map-only
    * projection over the word-TYPE table plus one pair-shuffle — at
    * 100 TB word types are millions of rows (not corpus-sized), and
    * the occurrence->type rollup is the classic first aggregation. */
  private[graft] def bpeTrain(docs: DataFrame, rounds: Int): Vector[(String, String, Long)] = {
    // persist the word-TYPE table: without it every round re-executes
    // the corpus explode+rollup lineage (measured cold at sf1:
    // 11.1 s = 6 corpus scans -> 1.8 s with types cached once;
    // sf10: 75.4 s -> 5.6 s)
    val words = docs.select(explode(toks(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq")).persist()
    try {
      var acc = Vector.empty[(String, String, Long)]
      var exhausted = false
      for (_ <- 1 to rounds if !exhausted) {
        val sy = bpe_apply(col("w"),
          typedlit(acc.map(_._1)), typedlit(acc.map(_._2)))
        val top = words
          .select(col("freq"), sy.as("sy"))
          .filter(size(col("sy")) >= 2)
          .select(col("freq"), explode(zip_with(
            slice(col("sy"), lit(1), size(col("sy")) - 1),
            slice(col("sy"), lit(2), size(col("sy")) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("pr"))
          .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1).collect()
        // a tiny corpus can run out of adjacent pairs before `rounds`
        // merges: stop, matching the oracle (empty m_r -> no rank-r row)
        if (top.isEmpty) exhausted = true
        else acc :+= ((top(0).getString(0), top(0).getString(1), top(0).getLong(2)))
      }
      acc
    } finally words.unpersist()
  }

  /** q131's superseded per-occurrence form, kept for the bench pair
    * (x131_bpe_apply_per_occ): bpe_apply runs once per token
    * OCCURRENCE with zero pre-shuffle — the right shape when the
    * output is per-doc token ids, measured 4.2x slower than the
    * word-type rollup at sf10 when the output is per-source stats. */
  private[graft] def bpeTokenizeOcc(s: SparkSession, dir: String): DataFrame = {
    val merges = memo(bpeMerges, dir)(bpeTrain(Tables(s, dir).documents, 6))
    val sy = bpe_apply(col("w"),
      typedlit(merges.map(_._1)), typedlit(merges.map(_._2)))
    Tables(s, dir).documents
      .select(col("source"), explode(toks(col("text"))).as("w"))
      .select(col("source"), length(col("w")).cast("long").as("nc"),
        size(sy).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"), sum(col("nc")).as("n_chars"),
        sum(col("nt")).as("n_bpe_tokens"),
        round(sum(col("nc")).cast("double") / sum(col("nt")), 6).as("compression"))
      .orderBy(col("source"))
  }

  /** q130's training loop WITHOUT the memo, for the bench shape that
    * times cold training (the inventory q130 medians a memo hit). */
  private[graft] def bpeTrainCold(s: SparkSession, dir: String): Vector[(String, String, Long)] =
    bpeTrain(Tables(s, dir).documents, 6)

  /** q133's training curve, memoized per dataset fingerprint. */
  private val perceptronRuns =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[(Long, Long)]]()

  /** Batch-perceptron training of the q116-shaped hashed linear
    * classifier (Rosenblatt's update in its batch form: w += sum of
    * y*x over currently-misclassified docs). Everything is INTEGER —
    * features are hashed token counts, weights stay in Z^64 — so each
    * round's gradient is an order-free exact sum and the trained
    * trajectory is bit-reproducible at any partitioning (q114's
    * fixed-point contract, applied to model training). Per round: one
    * map-only feature pass (weights as a 64-long plan literal) and one
    * 65-column partial agg to a SINGLE row — the driver moves 65 cells
    * per round, the corpus never shuffles. Features are computed by a
    * one-pass kernel (SketchKernel.hashCounts) and persisted across
    * rounds so the text is tokenized once, not T times. */
  private[graft] def perceptronTrain(docs: DataFrame, rounds: Int): Vector[(Long, Long)] = {
    val tgt = docs.agg(min(col("source"))).head.getString(0)
    // featureless docs (null/whitespace-only text) are excluded from
    // training on BOTH engines (the oracle's tk CTE carries the same
    // WHERE): otherwise a doc with no tokens sits at margin 0 forever
    // on this side while the oracle's mg join silently drops it.
    val feats = docs.filter(hasTokens).select(
      when(col("source") === tgt, 1L).otherwise(-1L).as("y"),
      hash_counts(tokens(col("text")), "qc133:", 64).as("x")).persist()
    try {
      var w = Vector.fill(64)(0L)
      var out = Vector.empty[(Long, Long)]
      for (_ <- 1 to rounds) {
        val margin = aggregate(
          zip_with(typedlit(w), col("x"), (a, b) => a * b), lit(0L), (a, v) => a + v)
        val aggs = count(lit(1)).as("n") +: (0 until 64).map(b =>
          sum(col("y") * element_at(col("x"), b + 1)).as(s"g$b"))
        val row = feats.filter(col("y") * margin <= lit(0L))
          .agg(aggs.head, aggs.tail: _*).head()
        val nMis = row.getLong(0)
        w = Vector.tabulate(64)(b => w(b) + (if (nMis == 0) 0L else row.getLong(b + 1)))
        out :+= ((nMis, w.map(math.abs).sum))
      }
      out
    } finally feats.unpersist()
  }

  /** q132's per-bucket log-likelihood-ratio table, memoized per dataset
    * fingerprint. */
  private val dsirTables =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Double]]()

  /** q139/q142's shared funnel chain: per user, the earliest
    * qualifying (view, click-after-view, purchase-after-click)
    * timestamps — three stacked conditional-min windows over ONE
    * hash(user_id) exchange, one output row per user. */
  private[graft] def funnelTimes(e: org.apache.spark.sql.Dataset[_]): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
    e.select(col("user_id"), col("event_type"), Tables.eventMicros(e).as("tus"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("tus"))).over(wu))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("tus") > col("t1"), col("tus"))).over(wu))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("tus") > col("t2"), col("tus"))).over(wu))
      .groupBy(col("user_id"))
      .agg(first(col("t1")).as("t1"), first(col("t2")).as("t2"),
        first(col("t3")).as("t3"))
  }

  /** q134/q137's 16x64 Achlioptas sign matrix, flattened row-major —
    * md5-derived so the oracle recomputes it cell by cell. */
  private lazy val jlSigns: Array[Long] = Array.tabulate(16 * 64) { k =>
    val (j, i) = (k / 64, k % 64)
    if ((graft.expressions.SketchKernel.md5Lower64(
      s"jl:$j:$i".getBytes("UTF-8")) & 1L) == 0L) 1L else -1L
  }

  /** Memoized llr build (shared by q132 and the bench pair, so the
    * x-shape times scoring, not re-training). */
  private[graft] def dsirLlrCached(s: SparkSession, dir: String): Array[Double] =
    memo(dsirTables, dir)(dsirLlr(Tables(s, dir).documents))

  /** q132's scoring half over a trained llr table: pure per-row
    * Columns (tokenize, hash, look up, average), so the identical code
    * plans over readStream — the streaming twin scores arriving docs
    * against the same plan-literal model, append-safe, no state. */
  private[graft] def dsirScore(docs: DataFrame, llr: Array[Double]): DataFrame = {
    val t = toks(col("text"))
    docs.filter(hasTokens).select(col("doc_id"), size(t).cast("long").as("n_tokens"),
      round(dsir_sum(t, typedlit(llr.toSeq)) / size(t), 6).as("llr_avg"))
  }

  /** dsirScore's superseded HOF form (transform + element_at +
    * aggregate, one md5 Column tree per token), kept for the bench
    * pair (x132) and the spec pinning the kernel bit-identical:
    * both fold the same doubles in token order. */
  private[graft] def dsirScoreHof(docs: DataFrame, llr: Array[Double]): DataFrame = {
    val llrLit = typedlit(llr.toSeq)
    val t = toks(col("text"))
    val perTok = transform(t, tok => element_at(llrLit,
      (md5_lower64(concat(lit("dsir:"), tok).cast("binary"))
        .bitwiseAND(lit(255L)) + lit(1L)).cast("int")))
    docs.filter(hasTokens).select(col("doc_id"), size(t).cast("long").as("n_tokens"),
      round(aggregate(perTok, lit(0.0d), (a, x) => a + x) / size(t), 6)
        .as("llr_avg"))
  }

  /** DSIR feature-distribution build (Xie et al. 2023 §3): hashed
    * unigram counts over 256 buckets for the TARGET domain (the
    * lexicographically-first source, the fixture's stand-in for a
    * curated in-domain corpus) and the RAW corpus, estimated in ONE
    * token scan — the raw count and the conditional target count ride
    * the same partial agg, so the corpus is read once and the shuffle
    * carries at most 256 rows. Laplace-smoothed llr[b] =
    * ln((ct+1)/(Nt+B)) - ln((cr+1)/(Nr+B)) computed on the driver from
    * the integer counts; the oracle recomputes the identical expression
    * from its own counts, so the only FP step (ln) happens once per
    * BUCKET on both sides, never per token. */
  private[graft] def dsirLlr(docs: DataFrame): Array[Double] = {
    val tgt = docs.agg(min(col("source"))).head.getString(0)
    val counts = docs.filter(hasTokens)
      .select(col("source"), explode(toks(col("text"))).as("tok"))
      .select(col("source"),
        md5_lower64(concat(lit("dsir:"), col("tok")).cast("binary"))
          .bitwiseAND(lit(255L)).as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("source") === tgt, 1L).otherwise(0L)).as("ct"))
      .collect() // bounded control plane: <= 256 rows
    val cr = new Array[Long](256)
    val ct = new Array[Long](256)
    counts.foreach { r =>
      cr(r.getLong(0).toInt) = r.getLong(1); ct(r.getLong(0).toInt) = r.getLong(2)
    }
    val nr = cr.sum.toDouble; val nt = ct.sum.toDouble
    Array.tabulate(256)(b =>
      math.log((ct(b) + 1.0) / (nt + 256.0)) - math.log((cr(b) + 1.0) / (nr + 256.0)))
  }

  /** q129's deployable half: pairwise matching-component counts from
    * the signatures alone (the 20x64 table self-joins; no shingle sets
    * ever meet). Benched as x129_minhash_sketch_only beside the full
    * query, whose cost is dominated by the exact-Jaccard audit join. */
  def minhashMatches(docs: DataFrame): DataFrame = {
    val sig = minhashSig(docs)
    sig.as("a").join(sig.as("b"),
        col("a.p") === col("b.p") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(sum(when(col("a.mn") === col("b.mn"), 1L).otherwise(0L)).as("matches"))
  }

  /** q121 WITHOUT its exact count(DISTINCT) audit — the deployable
    * sketch path alone (register partial agg, 256 cells/source, then
    * the two-branch estimator). Benched as x121_hll_sketch_only so the
    * sf10 slope of the sketch itself is separable from the audit's
    * (source, shingle) shuffle, which exists only to validate it
    * (VERDICT r9 item 6). */
  def hllSketchOnly(s: SparkSession, dir: String): DataFrame = {
    val regs = hllRegisters(Tables(s, dir).documents)
      .groupBy(col("source"), col("idx"))
      .agg(max(col("rho")).as("m"))
      .groupBy(col("source"))
      .agg((sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - m AS INT))")) +
        (lit(256L) - count(lit(1))) * lit(562949953421312L)).as("s"),
        count(lit(1)).as("nr"))
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0) * lit(562949953421312.0) / col("s")
    regs.select(col("source"),
      round(when(col("nr") < 256 && raw <= 640.0,
        lit(256.0) * log(lit(256.0) / (lit(256L) - col("nr"))))
        .otherwise(raw), 3).as("hll_est"))
  }

  /** q122's sketch BUILD alone (the 4-row x 1024-column cell grid count
    * agg, which is also exactly the streaming twin's shape) without the
    * exact top-50 audit — benched as x122_cms_sketch_only. */
  def cmsSketchOnly(s: SparkSession, dir: String): DataFrame =
    cmsGrid(Tables(s, dir).documents)
      .groupBy(col("d"), col("idx")).agg(count(lit(1)).as("cell"))

  /** q129's 64-permutation MinHash signature over any (source, text)
    * frame: one (source, p, mn) row per source and permutation.
    * Permutation p is the universal-hash family (a_p*h + b_p) mod
    * (2^31-1): ONE md5 per shingle for h, the 64 (a, b) constant pairs
    * derived plan-side (md5 of "mha:<p>"/"mhb:<p>", a forced nonzero
    * mod the Mersenne prime) — q122's one-md5 lesson WITHOUT its
    * additive h1+p*h2 form, which is not a permutation family: without
    * a modulus the p*h2 term dominates for large p, every component's
    * argmin collapses onto the smallest-h2 shingle, and unrelated
    * sources match on ~60/64 components (measured before this form).
    * 31-bit range keeps a_p*h inside a long in BOTH engines; shingle
    * collisions at 2^31 are ~1e-5-probable per pair and only perturb a
    * min, far under the sketch's own 1/16 std error. Mergeable by
    * element-wise min — the partial agg is the sketch union, so the
    * same expression streams in complete mode and unions across corpus
    * shards (PipelineSpec pins shard-merge == whole-corpus). */
  private[graft] def minhashSig(docs: DataFrame): DataFrame = {
    val P = 2147483647L
    // Per-DOC partial signature first: the md5 materializes ONCE per
    // shingle in its own projection (the q122 CSE rule), then ONE
    // kernel loop folds all 64 components over the in-row hash array —
    // so the shuffle sees 64 rows per DOCUMENT, not 64 per shingle
    // occurrence. Measured at sf0.1: per-occurrence explode 10.9 s ->
    // per-doc fold via 64 aggregate() HOF lambdas 4.6 s -> this kernel
    // form (same arithmetic at loop speed) — lambda dispatch was ~2 s
    // of the remainder.
    docs
      .select(col("source"), shingles(toks(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("hs", transform(col("sh"),
        g => md5_lower64(concat(lit("mh:"), g).cast("binary")).bitwiseAND(lit(P))))
      .select(col("source"),
        posexplode(minhash_components(col("hs"))).as(Seq("p", "v")))
      .groupBy(col("source"), col("p")).agg(min(col("v")).as("mn"))
  }

  /** q121's HLL register projection over any frame with (source, text):
    * one (source, idx, rho) row per shingle occurrence. Pure per-row
    * Columns — the register BUILD is then an ordinary
    * groupBy(source, idx).max(rho), which is also exactly the streaming
    * form: a streaming max aggregate in complete mode IS the continuous
    * sketch union (EventStreamsSpec pins the parity). */
  def hllRegisters(docs: DataFrame): DataFrame = {
    // h and each smear step materialize as their own projection. The
    // inlined fold textually copies the md5 subtree 2^6 times; in THIS
    // plain-projection context codegen's subexpression elimination
    // deduplicates it (measured neutral at sf10), but the explicit form
    // doesn't rely on that — cmsGrid documents the generator context
    // (array constructor + explode) where the same inlining really does
    // re-evaluate the hash per copy, 2x at 100x scale.
    val sh = explode(shingles(toks(col("text")), 3)).as("tok")
    val d0 = docs.select(col("source"), sh)
      .select(col("source"),
        md5_lower64(concat(lit("hll:"), col("tok")).cast("binary")).as("h"))
      .select(col("source"), col("h").bitwiseAND(lit(255L)).as("idx"),
        shiftrightunsigned(col("h"), 8).bitwiseAND(lit(281474976710655L)).as("w"))
    Seq(1, 2, 4, 8, 16, 32)
      .foldLeft(d0)((df, k) =>
        df.withColumn("w", col("w").bitwiseOR(shiftrightunsigned(col("w"), k))))
      .select(col("source"), col("idx"), (lit(49) - bit_count(col("w"))).as("rho"))
  }

  /** q122's Kirsch-Mitzenmacher row indexes for one token: ONE md5 per
    * occurrence, the 4 row hashes derived as (h1 + d*h2) & 1023 from
    * its two 32-bit halves (h2 forced odd) — the standard CMS double
    * hashing, which cut the 100x-scale sketch build 4x (the md5 is the
    * whole cost at corpus scale; see PERF_NOTES). */
  private[graft] def cmsIdx(tok: Column, d: Int): Column = {
    val h = md5_lower64(concat(lit("cms:"), tok).cast("binary"))
    val h1 = h.bitwiseAND(lit(4294967295L))
    val h2 = shiftrightunsigned(h, 32).bitwiseOR(lit(1L))
    (h1 + lit(d.toLong) * h2).bitwiseAND(lit(1023L))
  }

  /** q122's CMS cell grid over any frame with (text): one (d, idx) row
    * per token occurrence x depth. The cell BUILD is then an ordinary
    * groupBy(d, idx).count() — in streaming, the same count aggregate
    * in complete mode is the continuously-maintained sketch
    * (EventStreamsSpec pins the parity). The md5 is materialized as its
    * own projection so the 4 derived indexes share ONE hash — inlining
    * cmsIdx here would re-evaluate the md5 per array element (no CSE
    * across array constructors; measured 2x worse at 100x scale). */
  def cmsGrid(docs: DataFrame): DataFrame =
    docs.select(explode(toks(col("text"))).as("tok"))
      .select(md5_lower64(concat(lit("cms:"), col("tok")).cast("binary")).as("h"))
      .select(col("h").bitwiseAND(lit(4294967295L)).as("h1"),
        shiftrightunsigned(col("h"), 32).bitwiseOR(lit(1L)).as("h2"))
      .select(explode(array((0 until 4).map(d =>
        struct(lit(d).as("d"), (col("h1") + lit(d.toLong) * col("h2"))
          .bitwiseAND(lit(1023L)).as("idx"))): _*)).as("c"))
      .select(col("c.d").as("d"), col("c.idx").as("idx"))

  /** q124's bucket projection with FIXED bounds (production pins
    * histogram bounds up front — from config or a prior snapshot — so
    * sketches stay mergeable across days): one (event_type, bucket) row
    * per event. The cell build is then an ordinary count aggregate; in
    * streaming, the same count in complete mode is the continuously-
    * maintained quantile sketch (EventStreamsSpec pins the parity),
    * completing the set — Bloom (q105), HLL (q121), CMS (q122) and the
    * histogram all stream through their partial-agg form. */
  def quantileBins(events: DataFrame, vmin: Double, vmax: Double): DataFrame =
    events.select(col("event_type"),
      // degenerate range (single-valued distribution): everything in
      // bucket 0, matching q124's oracle CASE — an unguarded divide
      // yields NaN buckets and engine-dependent null/error behavior
      (if (vmax == vmin) lit(0)
       else least(lit(255), floor((col("value") - lit(vmin)) / (lit(vmax) - lit(vmin)) * 256)
        .cast("int"))).as("bucket"))

  /** q92's gate as a reusable projection over any frame with (doc_id,
    * text) — pure per-row Columns, so the SAME code runs over a batch
    * scan and a readStream (EventStreamsSpec pins the parity). Callers
    * sort first if presentation order matters (kernels must stay above
    * the range sort). */
  def qualityFlags(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t)
    docs
      .select(col("doc_id"), nTok.cast("long").as("n_tokens"),
        (stopword_hits(t, "en").cast("double") / nTok).as("stop_ratio"),
        (length(array_join(t, "")).cast("double") / nTok).as("mean_word_len"),
        when(nTok >= 2,
          ngram_run_stats(t, 2).getItem(0).cast("double") / (nTok - 1))
          .otherwise(0.0).as("top2_frac"),
        lang_id(t).as("lang_guess"))
      .select(col("doc_id"), col("n_tokens"), col("stop_ratio"),
        col("mean_word_len"), col("top2_frac"), col("lang_guess"),
        (col("n_tokens") < 25).as("f_short"),
        (col("stop_ratio") < 0.04).as("f_stop"),
        (col("mean_word_len") < 3.0 || col("mean_word_len") > 10.0).as("f_wordlen"),
        (col("top2_frac") >= 0.08).as("f_rep"),
        (col("lang_guess") =!= "en").as("f_lang"))
      .withColumn("keep", !col("f_short") && !col("f_stop")
        && !col("f_wordlen") && !col("f_rep") && !col("f_lang"))
  }

  /** q106's operator form: split each document's token sequence into
    * fixed-size context windows with overlap (window `win`, stride
    * `stride` <= win, so consecutive chunks share win - stride tokens)
    * — the chunking step every pretraining / RAG ingestion pipeline
    * runs between curation and tokenization. Chunk k covers tokens
    * [k*stride, k*stride + win); the last chunk is the first one whose
    * window reaches the end (it may be short), and every doc — even an
    * empty one — yields at least one chunk, so chunking never silently
    * drops documents. Pure per-row explode: fan-out is output-bound
    * (ceil(n/stride) chunks per doc), no shuffle, and the chunk stream
    * inherits the corpus partitioning — map-only at 100 TB. The same
    * Columns plan over readStream (stateless), like qualityFlags. */
  /** q117's segmentation, shared with the streaming twin
    * (DedupStreams.blockDedup): non-overlapping fixed-width token
    * blocks, one row per (doc_id, idx, blk). Pure per-row explode —
    * the same Columns plan runs over a batch scan and a readStream. */
  def docBlocks(docs: DataFrame, blockTokens: Int = 16): DataFrame = {
    val t = toks(col("text"))
    docs
      .select(col("doc_id"), t.as("tok"))
      .filter(size(col("tok")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), floor((size(col("tok")) - 1) / lit(blockTokens)).cast("int")),
          i => array_join(slice(col("tok"), i * blockTokens + 1, lit(blockTokens)), " ")))
          .as(Seq("idx", "blk")))
  }

  def chunkWindows(docs: DataFrame, win: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && stride <= win, "need 0 < stride <= win")
    val n = col("n_tokens")
    docs
      .select(col("doc_id"), toks(col("text")).as("tok"))
      .withColumn("n_tokens", size(col("tok")).cast("long"))
      .withColumn("kmax",
        when(n > win, expr(s"(n_tokens - $win + $stride - 1) DIV $stride"))
          .otherwise(0L))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("kmax"))))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(lit(win.toLong), n - col("chunk_id") * stride).as("chunk_len"),
        array_join(slice(col("tok"),
          (col("chunk_id") * stride + 1).cast("int"), lit(win)), " ")
          .as("chunk_text"))
  }

  /** q92's keep decision as ONE boolean Column — the composed pipeline
    * (q97) filters on it without materializing per-rule flags. Kept as
    * the rule-by-rule positive form; must stay the exact negation of
    * qualityFlags' failure flags. */
  private def qualityKeep: Column = {
    val t = toks(col("text"))
    val nTok = size(t)
    val stopRatio = stopword_hits(t, "en").cast("double") / nTok
    val mwl = length(array_join(t, "")).cast("double") / nTok
    val top2 = when(nTok >= 2,
      ngram_run_stats(t, 2).getItem(0).cast("double") / (nTok - 1)).otherwise(0.0)
    nTok >= 25 && stopRatio >= 0.04 && mwl >= 3.0 && mwl <= 10.0 &&
      top2 < 0.08 && lang_id(t) === "en"
  }

  /** Capped posting-list bucket join, shared by every banded/prefix
    * candidate generator (q31/q38/q41/q82): group `rows` by `bucket`,
    * keep each bucket's 64 lowest-id members (`member` is a struct whose
    * FIRST field is the id, so the array_sort realizes id order — the
    * exact semantics of the previous row_number-over-bucket <= 64
    * window), and emit intra-bucket member pairs with a.id < b.id.
    * Equivalent output to the windowed self-join it replaces, but the
    * posting lists are derived and shuffled ONCE — the self-join's b-side
    * re-derived the entire upstream lineage unless AQE happened to reuse
    * the exchange. Fan-out stays bounded at 64*63/2 pairs per bucket.
    * Returns columns (a, b): the paired member structs. */
  private def cappedBucketPairs(
      rows: DataFrame, bucket: Column, member: Column, idField: String): DataFrame =
    rows.groupBy(bucket.as("bk"))
      .agg(slice(array_sort(collect_list(member)), 1, 64).as("m"))
      .filter(size(col("m")) > 1)
      .select(explode(col("m")).as("a"), col("m").as("m"))
      .select(col("a"), explode(filter(col("m"),
        b => b(idField) > col("a")(idField))).as("b"))
      .select(col("a"), col("b"))

  /** q31's verified near-dup pairs (doc_a < doc_b, exact Jaccard >= 0.9),
    * also the edge set for q86's cluster assignment.
    *
    * No full-corpus cache: shingles are a cheap per-row kernel pass and
    * caching every shingle set would not fit memory at 100 TB — the
    * scan recomputes instead (columnar parquet read + one kernel call).
    * Skew protection: a degenerate band_hash (boilerplate-heavy corpora)
    * would make the bucket pairing quadratic in that bucket. The shared
    * capped generator keeps the first 64 members (ordered by doc_id)
    * rather than discarding oversized buckets outright: exact
    * duplicates share ALL 16 band hashes, so a whole-bucket drop would
    * silently lose every pair of a 65+-copy group. With representatives
    * the kept members still pair (and identical docs keep the same 64
    * reps in every band), bounding fan-out at 64^2 per bucket. */
  /** The exploded LSH band column over a bound `sig` column: 16 bands
    * x 4 of the 64 minhash rows each. Shared so the batch and
    * streaming forms band identically. */
  private[graft] def bandCol: Column =
    explode(transform(sequence(lit(0), lit(15)),
      b => struct(b.as("band_id"),
        xxhash64(slice(col("sig"), b * 4 + 1, lit(4)), b).as("band_hash"))))

  /** (doc_id, sh) -> exploded (doc_id, bd) LSH band rows: 64 minhashes
    * in one kernel pass, 16 bands x 4 rows each. Shared by the q31
    * self-join and the q108 build/probe form. */
  private[graft] def minhashBands(docs: DataFrame): DataFrame =
    docs.withColumn("sig", minhash_sig(col("sh")))
      .select(col("doc_id"), bandCol.as("bd"))

  private def minhashDupPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = shingled(Tables(s, dir))
    val bands = minhashBands(docs)
    val cand = cappedBucketPairs(bands, col("bd"),
        struct(col("doc_id")), "doc_id")
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact-Jaccard verification on candidates only
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** q110's vocabulary (top-1024 by tf, token tie-break, ids = 0-based
    * rank), memoized per dataset dir (same immutability assumption as
    * embCount). The same two-job pattern as q105's bitmap: job 1
    * reduces the corpus to a BOUNDED dictionary on the driver, job 2
    * ships it to every task as a plan literal — the shape every real
    * tokenizer (BPE/WordPiece vocab) applies at corpus scale. */
  private val vocabCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** q110's map-only pass: apply a vocabulary (id = position) to any
    * (doc_id, text) frame — one dictionary-literal lookup per token,
    * -1 for OOV, no join, no shuffle. Stateless, so the same Columns
    * plan runs over readStream. */
  def applyVocab(docs: DataFrame, vocab: Seq[String]): DataFrame = {
    val dict = map_from_arrays(
      typedLit(vocab), typedLit(vocab.indices.map(_.toLong)))
    val tok = toks(col("text"))
    docs.select(col("doc_id"),
      array_join(transform(tok,
        t => coalesce(element_at(dict, t), lit(-1L)).cast("string")), ",")
        .as("ids"),
      size(tok).cast("long").as("n_tokens"),
      size(filter(tok, t => element_at(dict, t).isNull)).cast("long")
        .as("n_oov"))
  }

  /** q108's operator form: dedup an incoming batch against an EXISTING
    * corpus index — the production ingest shape, where the corpus is
    * indexed once (at scale: a persisted/bucketed band table maintained
    * across ingests; here the same plan builds it from the existing
    * split) and only the NEW batch probes it. Unlike q31's self-join,
    * fan-out is per new doc, not per corpus pair, and the existing
    * corpus is never paired with itself. Index postings are capped at
    * 64 per bucket (keep-first by doc_id, q31's skew rule): any
    * near-dup clique keeps representatives in every band, so the ADMIT
    * decision is exact under the cap; n_dups degrades to a >=64-capped
    * count only for cliques past the cap. Both inputs are (doc_id, sh)
    * frames; returns one decision row per new doc. */
  /** The capped band index of the existing corpus: (bd, idx_doc) with
    * at most 64 postings per bucket, keep-first by doc_id. */
  private[graft] def bandIndex(existing: DataFrame): DataFrame =
    minhashBands(existing)
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("bd")).orderBy(col("doc_id"))))
      .filter(col("rn") <= 64)
      .select(col("bd"), col("doc_id").as("idx_doc"))

  /** Verified (new_doc, idx_doc, jaccard) pairs of the q108 probe —
    * the relation both the batch rollup and the streaming twin's
    * parity spec consume. */
  private[graft] def incrementalDupPairs(newDocs: DataFrame,
      existing: DataFrame): DataFrame = {
    val cand = minhashBands(newDocs)
      .select(col("bd"), col("doc_id").as("new_doc"))
      .join(bandIndex(existing), "bd")
      .select(col("new_doc"), col("idx_doc")).distinct()
    cand
      .join(newDocs.select(col("doc_id").as("new_doc"), col("sh").as("sh_n")), "new_doc")
      .join(existing.select(col("doc_id").as("idx_doc"), col("sh").as("sh_i")), "idx_doc")
      .withColumn("jaccard",
        size(array_intersect(col("sh_n"), col("sh_i"))).cast("double") /
          size(array_union(col("sh_n"), col("sh_i"))))
      .filter(col("jaccard") >= 0.9)
      .select(col("new_doc"), col("idx_doc"), col("jaccard"))
  }

  def incrementalDedup(newDocs: DataFrame, existing: DataFrame): DataFrame = {
    val ranked = incrementalDupPairs(newDocs, existing)
      .withColumn("rn", row_number().over(Window.partitionBy(col("new_doc"))
        .orderBy(col("jaccard").desc, col("idx_doc").desc)))
      .withColumn("n_dups", count(lit(1)).over(Window.partitionBy(col("new_doc"))))
      .filter(col("rn") === 1)
      .select(col("new_doc"), col("n_dups"),
        col("idx_doc").as("best_match"), col("jaccard").as("best_jaccard"))
    newDocs.select(col("doc_id").as("new_doc"))
      .join(ranked, Seq("new_doc"), "left")
      .select(col("new_doc"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("best_match"), col("best_jaccard"),
        col("best_match").isNull.as("admit"))
  }

  /** q118's PQ build + ADC search. `useCells = true` is the shipped
    * IVFADC composite (coarse cell routing, candidate-bounded);
    * `useCells = false` is the flat full-corpus ADC scan kept for the
    * scale comparison and the recall-floor spec — at equal codes the
    * flat scan is exhaustive, so IVFADC's hits are a subset ranked
    * identically. */
  private[graft] def pqAnn(s: SparkSession, dir: String, useCells: Boolean,
      nQueries: Int = 10): DataFrame = {
      // The fourth ANN variant, completing brute (q36) / LSH (q41) /
      // IVF (q57): TRAINED product quantization (Jegou et al. 2011).
      // Vectors compress to 8 four-bit codes (4 bytes vs 256 bytes of
      // floats — the memory-bound regime where 100 TB of embeddings
      // fits a cluster's RAM as codes). The codebook is a per-subspace
      // fixed-point k-means (q114's machinery: integer arithmetic,
      // floor-mean updates -> bit-reproducible at any partitioning);
      // training moves only the 8x16x8 centroid cells to the driver.
      // Encoding is MAP-ONLY strict argmin per subspace against the
      // codebook plan literal; search is asymmetric distance (ADC):
      // the query keeps full precision (its quantized longs), the
      // corpus side reconstructs from codes, and the distance is an
      // exact INTEGER — no floating-point ordering ambiguity at all.
      // Top-k via one row_number window per query, query side broadcast
      // (q36's shape); exact cosine reported on the survivors.
      def sqL(x: Column): Column = x * x
      val qdf = Tables(s, dir).embeddings
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("emb"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 10000d + 0.5).cast("long")).as("qv"))
        .withColumn("ss", dot_product(col("emb"), col("emb")))
      // strict argmin codes for one subspace against a centroid set
      def codesCol(cents: IndexedSeq[Seq[(Long, Array[Long])]]): Column =
        array((0 until 8).map { st =>
          val sub = slice(col("qv"), st * 8 + 1, 8)
          least(cents(st).map { case (cl, v) =>
            struct(aggregate(zip_with(sub, lit(v), (a, b) => sqL(a - b)),
              lit(0L), (acc, x) => acc + x).as("d"), lit(cl).as("c"))
          }: _*).getField("c")
        }: _*)
      val cents = memo(pqCodebook, dir) {
        var cs: IndexedSeq[Seq[(Long, Array[Long])]] = {
          val seeds = qdf.filter(col("vec_id") < 16).orderBy(col("vec_id"))
            .select(col("vec_id"), col("qv")).collect()
            .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
          IndexedSeq.tabulate(8)(st =>
            seeds.map { case (id, v) => (id, v.slice(st * 8, st * 8 + 8)) }.toSeq)
        }
        for (_ <- 0 until 2) {
          val sums = qdf.withColumn("codes", codesCol(cs))
            .select(col("codes"), posexplode(col("qv")).as(Seq("pos", "v")))
            .withColumn("s", (col("pos") - pmod(col("pos"), lit(8))) / 8)
            .select(col("s").cast("int").as("s"),
              element_at(col("codes"), col("s").cast("int") + 1).as("cl"),
              col("pos"), col("v"))
            .groupBy(col("s"), col("cl"), col("pos"))
            .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
            .collect()
          cs = IndexedSeq.tabulate(8) { st =>
            sums.filter(_.getInt(0) == st).groupBy(_.getLong(1)).toSeq
              .sortBy(_._1).map { case (cl, rows) =>
                (cl, rows.map(r => (r.getInt(2),
                  math.floor(r.getLong(3).toDouble / r.getLong(4) + 0.5).toLong))
                  .sortBy(_._1).map(_._2).toArray)
              }
          }
        }
        cs
      }
      // centroid lookup maps for reconstruction: subspace -> (code -> vals)
      val recon = flatten(array((0 until 8).map { st =>
        element_at(typedlit(cents(st).map { case (cl, v) => cl -> v.toSeq }.toMap),
          element_at(col("codes"), st + 1))
      }: _*))
      // IVFADC (Jegou et al. 2011 §IV, the composite the paper
      // recommends over a flat PQ scan): q57's coarse Rademacher
      // quantizer routes every corpus vector into ONE of 16 cells and
      // each query probes its nprobe=4 closest cells, so the ADC scan
      // touches ~nprobe/K of the codes instead of all of them — at a
      // 100 TB corpus (where K grows to thousands of cells) this is
      // the difference between a full-corpus scan per query batch and
      // a candidate list that stays ~constant per query. The join is
      // broadcast-of-queries into the cell-partitioned corpus (never a
      // corpus shuffle); recall loss vs the flat scan is the standard
      // IVF trade, and the oracle routes through the IDENTICAL cells.
      // The flat full-scan ADC is kept below as pqAdcFlat for the
      // scale comparison (BENCH_sf1) and recall-floor spec.
      val coded = qdf.withColumn("codes", codesCol(cents)).withColumn("recon", recon)
      val qBase = qdf.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("emb").as("qe"),
          col("qv").as("qqv"), col("ss").as("qss"))
      val w = Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))
      val paired =
        if (useCells)
          coded.withColumn("cell", ivf_cell(col("emb"), 16))
            .join(broadcast(qBase.withColumn("cell",
              explode(ivf_probes(col("qe"), 16, 4)))), "cell")
        else coded.crossJoin(broadcast(qBase))
      paired
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("adc", aggregate(
          zip_with(col("qqv"), col("recon"), (a, b) => sqL(a - b)),
          lit(0L), (acc, x) => acc + x))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .withColumn("cos", round(dot_product(col("qe"), col("emb")) /
          (sqrt(col("qss")) * sqrt(col("ss"))), 6))
        .select(col("qid"), col("rnk"), col("vec_id"), col("adc"), col("cos"))
        .orderBy(col("qid"), col("rnk"))
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- deduplication -------------------------------------------------
    "q30_exact_dedup" -> { (s, dir) =>
      Tables(s, dir).documents
        .groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy(col("content_hash"))
    },

    "q31_minhash_lsh_dedup" -> { (s, dir) =>
      minhashDupPairs(s, dir).orderBy(col("doc_a"), col("doc_b"))
    },

    "q82_ngram_jaccard_join" -> { (s, dir) =>
      // Exact n-gram Jaccard similarity join via df-ordered PREFIX
      // FILTERING (the classic set-similarity-join family: sort each
      // set by a global token order, index only each set's first
      // |x| - ceil(t*|x|) + 1 tokens). q31 answers the same question
      // approximately with fixed-size MinHash signatures; this
      // operator is EXACT at threshold t with a lossless candidate
      // filter: J(x,y) >= t implies |intersect| >= ceil(t*|x|), so
      // two qualifying sets must share a token inside those prefixes.
      // 100 TB shape: per-row ordering and prefix extraction (no
      // corpus-wide shuffle before the index), ONE shuffle of the
      // ~20%-of-tokens prefix index by token, a capped self-join on
      // postings, and exact verification on candidates only (never
      // O(n^2)); AQE broadcasts the small candidate side of the
      // verify joins.
      // t = 4/5; the filter thresholds below use ceil(a/b) =
      // floor((a+b-1)/b) on small integers — a correctly-rounded double
      // quotient of ints < 2^49 floors exactly, so no rounding can make
      // a lossless filter lossy.
      val docs = shingled(Tables(s, dir)).filter(size(col("sh")) > 0)
      // Global token order: (xxhash64(token), token) — computed PER
      // ROW, no df pass, no shuffle, no broadcast. Correctness does
      // not depend on the choice of order (any consistent total order
      // keeps the prefix filter lossless); order only tunes candidate
      // counts. The classic df-ascending order was measured against
      // this on the test corpus and pruned candidates by just ~6%
      // (70.8k vs 75.2k at sf0.1) while costing an extra corpus-wide
      // frequency pass — the 64-representative cap below already
      // bounds per-token fan-out under boilerplate skew, which is the
      // job df-ordering classically does. A corpus whose near-dup
      // signal hides behind globally-frequent shingles can swap in a
      // rank join here without touching any filter math.
      val ordered = docs.select(col("doc_id"), size(col("sh")).as("len"),
        transform(array_sort(transform(col("sh"),
          g => struct(xxhash64(g).as("k2"), g.as("g")))),
          _.getField("g")).as("og"))
      // J(x,y) >= t implies |intersect| >= ceil(t*|x|), so the first
      // |x| - ceil(t*|x|) + 1 tokens of each side must share one.
      val prefixLen =
        (col("len") - floor((col("len") * 4 + 4) / 5) + 1).cast("int")
      val prefix = ordered.select(col("doc_id"), col("len"),
        posexplode(slice(col("og"), lit(1), prefixLen)).as(Seq("p", "g")))
      // Posting lists via the shared capped generator (single shuffle of
      // the prefix index; 64-representative degenerate-corpus guard as in
      // q31 — a corpus of 64+ identical docs would make every posting
      // list the corpus; identical docs share identical prefixes, so kept
      // members still pair; run q30 first to strip exact copies beyond
      // the cap's design point). Two more lossless pre-verification
      // filters on the generated pairs:
      //  - length: J >= 4/5 forces 5*min(|x|,|y|) >= 4*max(|x|,|y|);
      //  - positional: a pair matched at (0-based) prefix positions
      //    (pa, pb) can overlap at most
      //    min(pa, pb) + 1 + min(|x|-pa-1, |y|-pb-1), which must reach
      //    alpha = ceil(t/(1+t)*(|x|+|y|)) = ceil(4*(|x|+|y|)/9).
      val alpha = floor(((col("a.len") + col("b.len")) * 4 + 8) / 9)
      val cand = cappedBucketPairs(prefix, col("g"),
          struct(col("doc_id"), col("len"), col("p")), "doc_id")
        .filter(col("a.len") * 4 <= col("b.len") * 5
          && col("b.len") * 4 <= col("a.len") * 5
          && least(col("a.p"), col("b.p")) + 1 +
               least(col("a.len") - col("a.p") - 1,
                 col("b.len") - col("b.p") - 1) >= alpha)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      // Verification computes the oracle's exact double: sets are
      // distinct, so |union| = |x| + |y| - |intersect| without
      // materializing array_union.
      cand
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    "q32_canonical_fingerprint" -> { (s, dir) =>
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"),
          md5(array_join(array_sort(array_distinct(toks(col("text")))), " ")
            .cast("binary")).as("fingerprint"))
    },

    // --- text analysis -------------------------------------------------
    "q33_quality_score" -> { (s, dir) =>
      val t = toks(col("text"))
      val nTok = size(t).cast("long")
      val stopHits = stopword_hits(t, "en")
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"),
          nTok.as("n_tokens"),
          size(regexp_extract_all(col("text"), lit("[,.!?;:]"), lit(0))).cast("long").as("n_punct"),
          stopHits.as("stop_hits"),
          (stopHits.cast("double") / nTok * 0.5 +
            least(nTok.cast("double") / 100.0, lit(1.0)) * 0.5).as("quality"))
    },

    "q34_lang_id" -> { (s, dir) =>
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"), lang_id(toks(col("text"))).as("lang_guess"))
    },

    "q35_token_count" -> { (s, dir) =>
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"),
          size(toks(col("text"))).cast("long").as("n_ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("n_bpe_tokens"))
    },

    // --- similarity search --------------------------------------------
    "q36_ann_topk" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("emb").as("qe"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", round(cosine(col("qe"), col("emb")), 6))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("vec_id"), col("cos"))
        .orderBy(col("qid"), col("rnk"))
    },

    "q37_embedding_neardup" -> { (s, dir) =>
      // SMALL-DATA VALIDATION HARNESS, not a scale path: the exact
      // all-pairs cosine is the ground truth that q41's banded LSH is
      // validated against. The row-count guard makes the O(n^2) bound
      // explicit — at corpus scale use q41 (bucketed candidates only).
      // memoized per dataset dir: the guard is a footer-count scan and
      // shouldn't rerun on every invocation of the harness
      val guardN: Long = Pipeline.memo(Pipeline.embCount, dir)(
        Tables(s, dir).embeddings.count())
      require(guardN <= 100000,
        s"q37 is an all-pairs validation harness (got $guardN vectors); " +
          "use q41_ann_lsh for corpus-scale near-dup search")
      // Norms are precomputed per vector (identical arithmetic to the
      // per-pair form, so the oracle's dot/(sqrt(qq)*sqrt(ee)) value is
      // bit-equal) — the pair loop then does ONE dot product per pair.
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
        .withColumn("ss", dot_product(col("emb"), col("emb")))
      val dot = dot_product(col("a.emb"), col("b.emb"))
      e.as("a").crossJoin(e.as("b"))
        .filter(col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos", round(dot / (sqrt(col("a.ss")) * sqrt(col("b.ss"))), 6))
        .filter(col("cos") >= 0.45)
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos"))
        .orderBy(col("vec_a"), col("vec_b"))
    },

    // --- sketch families (md5-derived so the DuckDB oracle recomputes
    // --- the identical signatures; see SketchKernel.md5Lower64) --------
    "q38_simhash_neardup" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), simhash64(toks(col("text"))).as("sig"))
      val bands = docs.select(col("doc_id"), col("sig"),
        explode(expr(
          """transform(sequence(0, 3), b -> struct(b AS band_id,
            shiftrightunsigned(sig, cast(b * 16 AS int)) & 65535 AS key))""")).as("bd"))
      // Same skew protection as q31: near-dup clusters share all four
      // band keys, so an uncapped bucket pairing is quadratic in cluster
      // size (measured 16.3x at a 10x scale-up with 10-copy clusters —
      // BENCH_sf1.json). The shared capped generator keeps the first 64
      // members per (band, key) bucket; identical sigs keep the same
      // representatives in every band, so intra-cluster pairs survive
      // while fan-out is <= 64^2.
      cappedBucketPairs(bands, col("bd"),
          struct(col("doc_id"), col("sig")), "doc_id")
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          hamming64(col("a.sig"), col("b.sig")).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 6)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    "q39_rolling_fingerprint" -> { (s, dir) =>
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"), rolling_fingerprint(toks(col("text"))).as("fp"))
    },

    "q41_ann_lsh" -> { (s, dir) =>
      // Scale path for similarity search: random-hyperplane sign bits,
      // banded 4x8; candidates = bucket collisions; exact cosine verify
      // on candidates only. At 100 TB the bucket join shuffles just
      // (band, key, id) and never materializes O(n^2) pairs.
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
        .withColumn("ss", dot_product(col("emb"), col("emb")))
        .withColumn("bits", embed_sign_bits(col("emb"), 32))
      val bands = e.select(col("vec_id"),
        explode(expr(
          """transform(sequence(0, 3), b -> struct(b AS band_id,
            shiftrightunsigned(bits, cast(b * 8 AS int)) & 255 AS key))""")).as("bd"))
      // 8-bit band keys give 256 buckets per band, so occupancy — and
      // with it candidate-pair count — grows linearly with corpus size
      // and the join quadratically (measured 8.6x at a 10x scale-up —
      // BENCH_sf1.json). Cap each (band, key) bucket at its 64
      // lowest-id members, the q31/q38 representative scheme: bounded
      // fan-out per bucket; at real corpus scale you additionally grow
      // the signature width so bucket count tracks n (more sign bits),
      // which this static 4x8 layout keeps small deliberately to stay
      // oracle-replicable.
      val cand = cappedBucketPairs(bands, col("bd"),
          struct(col("vec_id")), "vec_id")
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .distinct()
      val ea = e.select(col("vec_id").as("vec_a"), col("emb").as("emb_a"), col("ss").as("ss_a"))
      val eb = e.select(col("vec_id").as("vec_b"), col("emb").as("emb_b"), col("ss").as("ss_b"))
      cand.join(ea, "vec_a").join(eb, "vec_b")
        .withColumn("cos", round(dot_product(col("emb_a"), col("emb_b")) /
          (sqrt(col("ss_a")) * sqrt(col("ss_b"))), 6))
        .filter(col("cos") >= 0.4)
        .select(col("vec_a"), col("vec_b"), col("cos"))
        .orderBy(col("vec_a"), col("vec_b"))
    },

    "q57_ann_ivf" -> { (s, dir) =>
      // IVF-style ANN: a fixed md5-derived Rademacher codebook quantizes
      // vectors into cells (no training pass); queries probe their
      // nprobe closest cells and verify exactly inside them. At corpus
      // scale K grows with the data (thousands of cells) so the
      // cell join shuffles each vector once into a small bucket —
      // candidates per query ~ nprobe/K of the corpus, never all of it.
      val K = 16
      val nprobe = 4
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
        .withColumn("ss", dot_product(col("emb"), col("emb")))
        .withColumn("cell", ivf_cell(col("emb"), K))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("emb").as("qe"), col("ss").as("qss"),
          explode(ivf_probes(col("emb"), K, nprobe)).as("cell"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      e.join(broadcast(q), "cell")
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", round(dot_product(col("qe"), col("emb")) /
          (sqrt(col("qss")) * sqrt(col("ss"))), 6))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("vec_id"), col("cos"))
        .orderBy(col("qid"), col("rnk"))
    },

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

    "q84_vocab_topk" -> { (s, dir) =>
      // Corpus vocabulary: term frequency + document frequency per
      // token, top 100 by tf (token tie-break makes the order total).
      // One hash shuffle on token with map-side partial aggregation; df
      // rides the standard two-phase distinct rewrite on the same key;
      // the top-k is TakeOrderedAndProject (per-partition heads + driver
      // merge of 100 rows), never a corpus-wide sort shuffle.
      Tables(s, dir).documents
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("token"))
        .limit(100)
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

    "q86_dup_clusters" -> { (s, dir) =>
      // The pairs -> clusters -> keeper step every dedup pipeline needs:
      // connected components over the verified near-dup pairs (q31's
      // edge set), each doc labeled with its component's minimum doc_id
      // (the canonical keeper). Iterative min-label propagation — each
      // round is one shuffle join on the (tiny relative to the corpus)
      // dup graph, labels converge in O(diameter) rounds, and near-dup
      // components are cliquish (diameter ~2-3; identical docs are full
      // cliques). The driver-side loop is iteration CONTROL, not data
      // (GraphX/Pregel does the same); localCheckpoint truncates the
      // per-round lineage so the plan doesn't grow exponentially. At
      // 100 TB the edge set is the near-dup graph only — propagation
      // shuffles (doc_id, label) pairs, never documents.
      val edges = minhashDupPairs(s, dir).select(col("doc_a"), col("doc_b"))
        .localCheckpoint(true)
      val und = edges.union(
        edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      var labels = und.select(col("doc_a").as("doc_id")).distinct()
        .withColumn("label", col("doc_id")).localCheckpoint(true)
      var converged = false
      var iter = 0
      while (!converged && iter < 20) {
        val nbrMin = und
          .join(labels.withColumnRenamed("doc_id", "doc_a"), "doc_a")
          .groupBy(col("doc_b").as("doc_id")).agg(min(col("label")).as("nbr"))
        val next = labels.withColumnRenamed("label", "old")
          .join(nbrMin, Seq("doc_id"), "left")
          .select(col("doc_id"), col("old"),
            least(col("old"), coalesce(col("nbr"), col("old"))).as("label"))
          .localCheckpoint(true)
        converged = next.filter(col("label") =!= col("old")).isEmpty
        labels = next.select(col("doc_id"), col("label"))
        iter += 1
      }
      require(converged, s"q86 label propagation did not converge in $iter rounds")
      labels
        .select(col("doc_id"), col("label").as("cluster_id"),
          (col("doc_id") === col("label")).as("is_keeper"))
        .orderBy(col("doc_id"))
    },

    "q143_components_star" -> { (s, dir) =>
      // q86's contract (near-dup pairs -> components -> canonical
      // keeper) computed by ALTERNATING LARGE-STAR/SMALL-STAR
      // (Kiveris et al. 2014) instead of min-label propagation. Same
      // edge set, same output, different convergence guarantee:
      // label prop needs O(diameter) rounds (and q86 caps at 20 — a
      // 40-link chain component would fail it), star contracts any
      // component in O(log^2 n) rounds regardless of shape. Components
      // emerge rooted at their minimum doc_id, so the keeper falls out
      // of the star root with no extra pass. PipelineSpec pins exact
      // agreement with q86 on the fixture AND convergence on a planted
      // 64-link chain that label prop's cap cannot absorb.
      val edges = minhashDupPairs(s, dir)
        .select(col("doc_a").as("u"), col("doc_b").as("v"))
      graft.operators.Components.components(edges)
        .select(col("node").as("doc_id"), col("component").as("cluster_id"),
          (col("node") === col("component")).as("is_keeper"))
        .orderBy(col("doc_id"))
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

    "q146_textrank" -> { (s, dir) =>
      // TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
      // PageRank (d = 0.85, 10 iterations) over the word co-occurrence
      // graph — nodes are the top-128 content words (length >= 4, the
      // deterministic stand-in for the paper's POS filter), edges are
      // adjacent-pair co-occurrences weighted by count. Scale shape:
      // the corpus contributes exactly two token scans (vocab count +
      // bigram count, q132's read-twice posture); the vocab ships back
      // as a 128-string isin literal (q110's dictionary pattern, no
      // join), and the graph itself is BOUNDED by construction
      // (<= 128 nodes / 8128 edges), so the 10 PageRank rounds are
      // driver control-plane like q114's centroids — at 100 TB the
      // iteration cost is unchanged because the graph size is fixed by
      // the vocab cap, not the corpus. Scores are fixed-point integers
      // (1e6 = 1.0) with per-term floor division, so the trajectory is
      // bit-reproducible and the oracle replays it exactly (integer //
      // in unrolled CTEs).
      import s.implicits._
      val docs = Tables(s, dir).documents
      val vs = docs.select(explode(toks(col("text"))).as("w"))
        .filter(length(col("w")) >= 4)
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(128)
        .collect().map(_.getString(0)) // bounded: vocab cap
      val ed = docs.select(toks(col("text")).as("t"))
        .select(explode(arrays_zip(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1))).as("bg"))
        .select(col("bg.0").as("a"), col("bg.1").as("b"))
        .filter(col("a") =!= col("b") &&
          col("a").isin(vs.toSeq: _*) && col("b").isin(vs.toSeq: _*))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
        .collect() // bounded: <= 128*127/2 edges
      val und = ed.toSeq.flatMap { r =>
        val (u, v, w) = (r.getString(0), r.getString(1), r.getLong(2))
        Seq((u, v, w), (v, u, w))
      }
      val deg = und.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      var sc = deg.keys.map(_ -> 1000000L).toMap
      for (_ <- 1 to 10) {
        val contrib = und.groupBy(_._2).map { case (v, es) =>
          v -> es.map { case (u, _, w) => w * sc(u) / deg(u) }.sum
        }
        sc = deg.keys.map(v =>
          v -> (150000L + 850000L * contrib.getOrElse(v, 0L) / 1000000L)).toMap
      }
      sc.toSeq.sortBy { case (w0, s0) => (-s0, w0) }.take(20).zipWithIndex
        .map { case ((w0, s0), i) => ((i + 1).toLong, w0, s0) }
        .toDF("rank", "word", "score")
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

    "q87_pii_redact" -> { (s, dir) =>
      // PII scrubbing: redact emails, long digit runs (phone-like), and
      // IPv4 addresses with typed placeholders, and count each kind for
      // the audit trail. Email first so its digits can't half-match the
      // phone pattern; both engines apply the same order. Pure per-row
      // regex work (codegen'd regexp_replace/extract_all) — no shuffle
      // beyond the presentation sort; the patterns are RE2-compatible so
      // the DuckDB oracle replays them verbatim.
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phone = "\\+?\\d[\\d -]{7,}\\d"
      val t = col("text")
      Tables(s, dir).documents
        .orderBy(col("doc_id"))
        .select(col("doc_id"),
          size(regexp_extract_all(t, lit(email), lit(0))).cast("long").as("n_emails"),
          size(regexp_extract_all(t, lit(ip), lit(0))).cast("long").as("n_ips"),
          size(regexp_extract_all(t, lit(phone), lit(0))).cast("long").as("n_phones"),
          regexp_replace(regexp_replace(regexp_replace(t,
            email, "<EMAIL>"), ip, "<IP>"), phone, "<PHONE>").as("redacted"))
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

    "q89_repetition_stats" -> { (s, dir) =>
      // Gopher-style repetition filters (Rae et al. 2021 §A1.1): the
      // top-n-gram fraction (how much of the doc is one repeated
      // phrase) and the duplicate-n-gram fraction (how much of the doc
      // is ANY repeated phrase) for word 2- and 3-grams. The corpus has
      // no newlines, so the line/paragraph halves of the rule family
      // don't apply; n-gram repetition is the half that does. Pure
      // per-row work: one build-sort-scan kernel pass per n (codegen'd
      // StaticInvoke), no shuffle beyond the presentation sort,
      // O(L log L) per doc at any corpus size.
      val t = toks(col("text"))
      Tables(s, dir).documents
        .orderBy(col("doc_id"))
        .select(col("doc_id"), size(t).cast("long").as("n_tokens"),
          ngram_run_stats(t, 2).as("r2"),
          ngram_run_stats(t, 3).as("r3"))
        .select(col("doc_id"), col("n_tokens"),
          col("r2").getItem(0).as("top2_count"),
          when(col("n_tokens") >= 2,
            col("r2").getItem(0).cast("double") / (col("n_tokens") - 1))
            .otherwise(0.0).as("top2_frac"),
          when(col("n_tokens") >= 2,
            col("r2").getItem(1).cast("double") / (col("n_tokens") - 1))
            .otherwise(0.0).as("dup2_frac"),
          col("r3").getItem(0).as("top3_count"),
          when(col("n_tokens") >= 3,
            col("r3").getItem(1).cast("double") / (col("n_tokens") - 2))
            .otherwise(0.0).as("dup3_frac"))
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

    "q105_bloom_decontaminate" -> { (s, dir) =>
      // q90's decontamination at the scale where even the eval-suite
      // shingle SET is too big to broadcast: a Bloom filter (m = 2^20
      // bits, k = 3) replaces it with a CONSTANT 128 KiB bitmap,
      // whatever the benchmark suite grows to. Two-job sketch pattern:
      // job 1 reduces the eval split's distinct gram positions to the
      // bitmap (driver-side materialization, memoized per dir — the
      // sketch analogue of a broadcast build side); job 2 is the 100 TB
      // corpus side and is MAP-ONLY — one bloomHits kernel pass per
      // document against the bitmap literal, no join, no shuffle of
      // unflagged rows. Bloom guarantees no false negatives, so the
      // exact audit join (vs the true eval gram set) touches FLAGGED
      // grams only — candidates, never the corpus — and reports the
      // false-positive count the fpr math predicts (~(1-e^{-kn/m})^k).
      // The audit is a SHUFFLE_HASH join: the probe side is flagged
      // grams only (candidate-scale), and broadcasting the eval gram
      // set would re-import exactly the assumption this query exists
      // to drop — at its design point that set doesn't fit in one
      // executor, so the hint pins the strategy Catalyst would pick
      // at real stats instead of the local-SF size estimate.
      val m = 1 << 20
      val bits = memo(bloomBits, dir) {
        val pos = shingled(Tables(s, dir)).filter(col("doc_id") % 20 === 0)
          .select(explode(col("sh")).as("g")).distinct()
          .select(explode(array((0 until 3).map(j =>
            md5_lower64(concat(lit(s"bf$j:"), col("g")).cast("binary"))
              .bitwiseAND(lit((m - 1).toLong))): _*)).as("p"))
          .distinct().collect()
        val arr = new Array[Byte](m >>> 3)
        pos.foreach { r =>
          val p = r.getLong(0)
          arr((p >>> 3).toInt) = (arr((p >>> 3).toInt) | (1 << (p & 7L).toInt)).toByte
        }
        arr
      }
      val sh = shingled(Tables(s, dir))
      val evalGrams = sh.filter(col("doc_id") % 20 === 0)
        .select(explode(col("sh")).as("g")).distinct()
      sh.filter(col("doc_id") % 20 =!= 0)
        .select(col("doc_id"), explode(bloom_hits(lit(bits), col("sh"))).as("g"))
        .join(evalGrams.withColumn("hit", lit(1)).hint("shuffle_hash"),
          Seq("g"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_flagged"),
          sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_true"))
        .select(col("doc_id"), col("n_flagged"), col("n_true"),
          (col("n_flagged") - col("n_true")).as("n_fp"))
        .orderBy(col("doc_id"))
    },

    "q106_chunk_windows" -> { (s, dir) =>
      // Context-window chunking with overlap (64-token windows, stride
      // 48): see chunkWindows. The presentation sort is the only
      // exchange in the plan.
      chunkWindows(Tables(s, dir).documents)
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    "q110_tokenize_ids" -> { (s, dir) =>
      // The corpus -> token-ids step between curation and training:
      // apply the q84-style vocabulary (top 1024 by tf, token
      // tie-break; id = 0-based rank) to every document, emitting the
      // id sequence plus OOV accounting (-1 = out-of-vocabulary, the
      // unk id decision left to the consumer). Two jobs: the vocab
      // build is one token shuffle with a BOUNDED (|V|) result,
      // memoized per dir; the corpus pass is MAP-ONLY — each task
      // looks tokens up in the dictionary literal, no join, no shuffle
      // of the token stream (the explode+join form would shuffle every
      // token of the corpus). ids emit as CSV so the oracle compare is
      // positional and type-exact.
      val vocab = memo(vocabCache, dir)(
        Tables(s, dir).documents
          .select(explode(toks(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("tf"))
          .orderBy(col("tf").desc, col("token")).limit(1024)
          .collect().map(_.getString(0)))
      applyVocab(Tables(s, dir).documents.orderBy(col("doc_id")), vocab)
    },

    "q111_inverted_index" -> { (s, dir) =>
      // The retrieval-side complement of q84's vocabulary: a full
      // inverted index — per token its corpus term frequency, document
      // frequency, and a CAPPED posting list (the 16 smallest doc_ids,
      // CSV so the compare is positional). The cap is the scale story:
      // postings aggregate through MinKAgg, the bounded-state top-k
      // TypedImperativeAggregate (expressions/MinKAgg.scala), so the
      // map-side partial state for a stopword token is 16 longs flat —
      // `slice(sort_array(collect_set))` would carry the full
      // corpus-sized posting set into the shuffle before slicing. Two
      // bounded-state shuffles: (token, doc_id) pair counts, then the
      // per-token rollup (tf rides sum-of-counts, df is a plain count
      // because pairs are distinct by construction).
      val pairs = Tables(s, dir).documents
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy(col("token"), col("doc_id")).agg(count(lit(1)).as("c"))
      pairs.groupBy(col("token"))
        .agg(sum(col("c")).as("tf"), count(lit(1)).as("df"),
          min_k(col("doc_id"), 16).as("p"))
        .select(col("token"), col("tf"), col("df"),
          array_join(transform(col("p"), _.cast("string")), ",").as("postings"))
        .orderBy(col("token"))
    },

    "q112_bm25_topk" -> { (s, dir) =>
      // Lexical retrieval: BM25 top-20 for a fixed conjunctive-ish
      // query (k1 = 1.2, b = 0.75, idf = ln((N-df+0.5)/(df+0.5)+1) —
      // the Robertson/Sparck-Jones always-positive form). Plan shape at
      // 100 TB: the corpus scan filters the exploded token stream to
      // the QUERY TERMS before anything shuffles, so the (doc, term)
      // aggregation and the df window both move match-volume, never
      // corpus-volume; N and avgdl are one memoized global aggregate
      // attached as plan literals; the final top-20 is
      // TakeOrderedAndProject (per-partition heads + driver merge), not
      // a global sort. Constants appear as identical decimal literals
      // here and in the oracle; the per-doc score sums <= 4 terms and
      // rounds to 6dp before the compare and the rank (q98's
      // determinism argument).
      val terms = Seq("dup", "vector", "hash", "merge")
      val stats = memo(bm25Stats, dir) {
        val r = Tables(s, dir).documents
          .agg(count(lit(1)),
            avg(size(toks(col("text"))).cast("double"))).head
        (r.getLong(0), r.getDouble(1))
      }
      val (nDocs, avgdl) = stats
      val matched = Tables(s, dir).documents
        .select(col("doc_id"), size(toks(col("text"))).cast("double").as("dl"),
          explode(toks(col("text"))).as("token"))
        .filter(col("token").isin(terms: _*))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).cast("double").as("tf"), max(col("dl")).as("dl"))
        .withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("token"))).cast("double"))
      val idf = log((lit(nDocs.toDouble) - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0))
      val contrib = idf * col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl)))
      matched.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"), round(sum(contrib), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
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

    "q108_incremental_dedup" -> { (s, dir) =>
      // Incremental ingest dedup: the new batch (doc_id % 10 == 0 as
      // the arriving split) probes the existing corpus's band index —
      // see incrementalDedup. The oracle is the brute-force
      // new x existing exact-Jaccard join, so this also re-certifies
      // LSH completeness at J >= 0.9 on the probe shape.
      val docs = shingled(Tables(s, dir))
      incrementalDedup(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0))
        .orderBy(col("new_doc"))
    },

    "q103_embed_quantize" -> { (s, dir) =>
      // Symmetric int8 embedding quantization with its audit trail:
      // per-vector scale = 127/max|x|, q_i = round(x*scale), plus the
      // max absolute reconstruction error — the standard 4x storage /
      // bandwidth compression before ANN serving at corpus scale. Pure
      // per-row arithmetic on the bound array attribute (zero
      // shuffles); the quantized vector is emitted as a CSV string of
      // exact ints so the oracle compare is float-free, and the error
      // rounds to 6dp (identical operands both engines).
      val e = Tables(s, dir).embeddings
        .orderBy(col("vec_id"))
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
        .withColumn("maxabs", array_max(transform(col("emb"), x => abs(x))))
      val scale = when(col("maxabs") > 0.0, lit(127.0) / col("maxabs")).otherwise(0.0)
      e.withColumn("scale", scale)
        .select(col("vec_id"),
          array_join(transform(col("emb"),
            x => round(x * col("scale")).cast("int").cast("string")), ",").as("qvec"),
          round(when(col("maxabs") > 0.0,
            array_max(transform(col("emb"),
              x => abs(x - round(x * col("scale")) / col("scale")))))
            .otherwise(0.0), 6).as("max_abs_err"))
    },

    "q102_dup_source_matrix" -> { (s, dir) =>
      // Corpus forensics: the near-dup pair graph projected onto
      // SOURCES — how many verified near-dup pairs live inside each
      // source and span each source pair (which feeds copy from each
      // other, which scraper double-ingests). Reuses q31's verified
      // edge set; the (doc -> source) joins broadcast the tiny
      // projection, the matrix group-by is at |sources|^2 cardinality.
      // The unordered source pair is canonicalized (least, greatest)
      // so A->B and B->A collapse into one cell.
      val pairs = minhashDupPairs(s, dir)
      val src = Tables(s, dir).documents.select(col("doc_id"), col("source"))
      pairs
        .join(broadcast(src.select(col("doc_id").as("doc_a"),
          col("source").as("src_a"))), Seq("doc_a"))
        .join(broadcast(src.select(col("doc_id").as("doc_b"),
          col("source").as("src_b"))), Seq("doc_b"))
        .groupBy(least(col("src_a"), col("src_b")).as("source_a"),
          greatest(col("src_a"), col("src_b")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(col("jaccard")), 6).as("avg_jaccard"))
        .withColumn("cross_source", col("source_a") =!= col("source_b"))
        .orderBy(col("source_a"), col("source_b"))
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

    "q100_winnow_overlap" -> { (s, dir) =>
      // q94's cross-doc span detection at index scale: winnowing
      // (Schleimer et al. 2003) selects each w-window's minimal k-gram
      // hash, a deterministic ~2/(w+1) subsample that still guarantees
      // any shared run of >= w+k-1 tokens contributes a common
      // fingerprint — the index shuffles a fraction of the grams for
      // the same detection guarantee. Same plan shape as q94: per-gram
      // doc counts via one window over the fingerprint shuffle, then
      // the per-doc rollup; never a pair join.
      val fp = Tables(s, dir).documents
        .select(col("doc_id"),
          explode(winnow_fingerprints(toks(col("text")), 4, 4)).as("fp"))
        .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("fp"))))
      fp.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_fp"),
          sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared_fp"))
        .select(col("doc_id"), col("n_fp"), col("n_shared_fp"),
          (col("n_shared_fp").cast("double") / col("n_fp")).as("shared_frac"))
        .orderBy(col("doc_id"))
    },

    "q99_bigram_surprisal" -> { (s, dir) =>
      // Bigram-LM quality scoring: mean conditional surprisal
      // -log2 p(w|prev) with p estimated from the corpus itself,
      // p(w|prev) = c(prev,w) / c(prev·) — one step up from q98's
      // unigram model (catches wrong-order fluency that unigram
      // frequencies can't). Per-row bigram build, then two partitioned
      // count windows that share ONE exchange (hash(prev) co-locates
      // (prev,cur) too) and the per-doc rollup — token payloads
      // shuffle, never documents, and every window key is
      // high-cardinality. Rounds to 6dp: both engines average float
      // logs in their own order. The bigram build binds the token
      // array to an attribute FIRST and zips two slices — an earlier
      // form used element_at(toks(text), i) inside a transform lambda,
      // which re-evaluates the tokenizer subtree per element
      // (O(tokens^2) regex splits per doc; 8.2 s vs ~1 s at sf0.1).
      Tables(s, dir).documents
        .select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"), explode(arrays_zip(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1))).as("bg"))
        .select(col("doc_id"), col("bg.0").as("prev"), col("bg.1").as("cur"))
        .withColumn("c_bg",
          count(lit(1)).over(Window.partitionBy(col("prev"), col("cur"))))
        .withColumn("c_prev", count(lit(1)).over(Window.partitionBy(col("prev"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(log2(col("c_prev").cast("double"))
            - log2(col("c_bg").cast("double"))), 6).as("avg_surprisal_bits"))
        .orderBy(col("doc_id"))
    },

    "q98_unigram_surprisal" -> { (s, dir) =>
      // Cheap language-model quality scoring: each doc's mean per-token
      // surprisal under the corpus's own unigram distribution (the
      // poor-man's perplexity filter — fluent text is low-surprisal,
      // rare-token soup is high). avg(-log2(tf/N)) decomposes as
      // log2(N) - avg(log2(tf)), so N attaches as a plan-time constant
      // (one memoized corpus count) and tf rides a window PARTITIONED
      // by token — one token shuffle, no join back, no single-partition
      // vocab pass, no broadcast of a corpus-sized vocabulary. Rounds
      // to 6dp: both engines average float logs in their own order.
      val toksDf = Tables(s, dir).documents
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      val total: Long = Pipeline.memo(Pipeline.tokCount, dir)(
        Tables(s, dir).documents
          .agg(coalesce(sum(size(toks(col("text"))).cast("long")), lit(0L)))
          .head.getLong(0))
      toksDf
        .withColumn("tf", count(lit(1)).over(Window.partitionBy(col("token"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          round(log2(lit(total.toDouble)) - avg(log2(col("tf").cast("double"))), 6)
            .as("avg_surprisal_bits"))
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

    "q95_char_entropy" -> { (s, dir) =>
      // Character-level Shannon entropy — the classic gibberish /
      // binary-leak / encoding-corruption signal (natural text sits in
      // a narrow bits-per-char band; base64 blobs and key dumps sit
      // high, repeated-char junk sits low). One codepoint-pass kernel
      // per row; entropy rounds to 6dp before compare because the
      // oracle's group-by accumulates float terms in its own order.
      Tables(s, dir).documents
        .orderBy(col("doc_id"))
        .select(col("doc_id"), char_stats(col("text")).as("cs"))
        .select(col("doc_id"),
          col("cs").getItem(0).cast("long").as("n_chars"),
          col("cs").getItem(1).cast("long").as("n_distinct_chars"),
          round(col("cs").getItem(2), 6).as("entropy_bits"))
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

    "q94_span_dedup" -> { (s, dir) =>
      // Cross-document repeated-span detection (the scalable form of
      // exact-substring dedup, Lee et al. 2022): count, per doc, how
      // many of its distinct 8-token windows also occur in another
      // document. Unlike q31/q82 (whole-doc similarity) this finds
      // shared SPANS between otherwise-unrelated docs (boilerplate,
      // license headers, quoted passages). Plan shape: per-gram doc
      // counts via a window over ONE gram shuffle (no groupBy+join-back
      // second shuffle), then the per-doc rollup — never a pair join,
      // which is what keeps exact span dedup tractable at corpus scale.
      val sh8 = Tables(s, dir).documents
        .select(col("doc_id"), explode(shingles(toks(col("text")), 8)).as("g"))
        .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("g"))))
      sh8.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared"))
        .select(col("doc_id"), col("n_windows"), col("n_shared"),
          (col("n_shared").cast("double") / col("n_windows")).as("shared_frac"))
        .orderBy(col("doc_id"))
    },

    "q93_semantic_dedup" -> { (s, dir) =>
      // SemDeDup (Abbas et al. 2023): semantic deduplication by
      // embedding similarity INSIDE clusters — the cluster bound is
      // what makes the quadratic pair check tractable. Cells come from
      // q57's trainingless IVF codebook; within a cell, keep-first: a
      // vector is dropped when any lower-id cell-mate has cosine >= t.
      // (Pairwise, not transitive — q86 is the transitive-closure
      // operator.) 100 TB shape: one shuffle on cell, pairs bounded by
      // cell size, and K GROWS with the corpus (~125 vectors/cell, from
      // a cheap parquet footer count, memoized like q37's guard) so the
      // within-cell quadratic stays linear overall — at fixed K=16 the
      // sf1 ratio measured 16x for 10x data; adaptive K returns it to
      // ~linear. The oracle computes the identical K from its own
      // count(*). Cosines round to 6dp before the threshold compare so
      // the oracle makes the identical keep decision.
      val n: Long = Pipeline.memo(Pipeline.embCount, dir)(
        Tables(s, dir).embeddings.count())
      val k = math.max(16L, n / 125L).toInt
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
        .withColumn("ss", dot_product(col("emb"), col("emb")))
        .withColumn("cell", ivf_cell(col("emb"), k))
      val dups = e.as("a").join(e.as("b"), col("a.cell") === col("b.cell")
          && col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos", round(dot_product(col("a.emb"), col("b.emb")) /
          (sqrt(col("a.ss")) * sqrt(col("b.ss"))), 6))
        .filter(col("cos") >= 0.45)
        .groupBy(col("b.vec_id").as("vec_id"))
        .agg(count(lit(1)).as("n_dups"))
      e.select(col("vec_id"), col("cell"))
        .join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          (coalesce(col("n_dups"), lit(0L)) === 0L).as("kept"))
        .orderBy(col("vec_id"))
    },

    "q92_quality_filter" -> { (s, dir) =>
      // The composite curation gate: C4/Gopher-style rules evaluated
      // per document, each failure exposed as its own flag so the
      // pipeline can report WHY a doc dropped (rule ablation needs the
      // per-rule counts, not just the survivor set). Rules: too short
      // (< 25 tokens), too few stopwords (< 4%), mean word length
      // outside [3, 10], dominant-bigram repetition (>= 8%), and
      // non-English (an en-only pipeline). Every signal is one of the
      // existing per-row kernels (stopword_hits, lang_id,
      // ngram_run_stats) — one codegen'd projection, no shuffle beyond
      // the presentation sort, embarrassingly parallel at any scale.
      qualityFlags(Tables(s, dir).documents.orderBy(col("doc_id")))
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

    "q114_kmeans_cluster" -> { (s, dir) =>
      // Topic clustering over embeddings: Lloyd's k-means, the
      // canonical ITERATIVE workload (MLlib KMeans has the same plan
      // shape: broadcast centroids, map-only assignment, k*d-cell
      // partial aggregate). Everything runs in FIXED-POINT arithmetic —
      // vectors quantize to 1e-4-resolution longs up front — so sums
      // are exact integers whatever the partitioning, and the clustering
      // is bit-reproducible across cluster sizes / AQE decisions /
      // stragglers (floating-point k-means is not: FP sum order changes
      // with partition count). Deterministic init: centroids = the k
      // lowest vec_ids. Per iteration: one assignment pass with the
      // centroid matrix as a PLAN LITERAL (the broadcast analogue; 8x64
      // longs), then a groupBy(cluster, dim) partial agg whose k*d=512
      // result rows come to the driver — the control loop moves
      // centroids only, never data. Fixed T=2 updates + final assign;
      // at 100 TB you'd cache the quantized projection across the T
      // scans. Tie-break: lowest cluster id (struct least on
      // (dist, cl)). The oracle unrolls the same three assignment
      // rounds as CTEs over the same quantized values.
      val k = 8
      val q = Tables(s, dir).embeddings
        .select(col("vec_id"), transform(col("embedding"),
          x => floor(x.cast("double") * 10000d + 0.5).cast("long")).as("qv"))
      def best(cents: Seq[(Long, Array[Long])]): Column =
        least(cents.map { case (cl, v) =>
          struct(
            aggregate(zip_with(col("qv"), lit(v), (a, b) => (a - b) * (a - b)),
              lit(0L), (acc, x) => acc + x).as("dist"),
            lit(cl).as("cl"))
        }: _*)
      val cents = memo(kmeansCents, dir) {
        var cs: Seq[(Long, Array[Long])] = q.filter(col("vec_id") < k)
          .orderBy(col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
        for (_ <- 0 until 2) {
          val sums = q.withColumn("b", best(cs))
            .select(col("b.cl").as("cl"), posexplode(col("qv")).as(Seq("pos", "v")))
            .groupBy(col("cl"), col("pos"))
            .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
            .collect()
          cs = sums.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (cl, rows) =>
            (cl, rows.map(r => (r.getInt(1),
              math.floor(r.getLong(2).toDouble / r.getLong(3) + 0.5).toLong))
              .sortBy(_._1).map(_._2).toArray)
          }
        }
        cs
      }
      q.withColumn("b", best(cents))
        .select(col("vec_id"), col("b.cl").as("cluster"), col("b.dist").as("dist"))
        .orderBy(col("vec_id"))
    },

    "q115_semantic_decontaminate" -> { (s, dir) =>
      // The third leg of the decontamination trio: q90 (lexical,
      // broadcast shingle set), q105 (lexical, Bloom sketch), and this —
      // SEMANTIC contamination: a corpus vector is flagged when its
      // embedding cosine against ANY eval-split vector reaches the
      // threshold (paraphrased benchmark answers that share no n-gram).
      // Plan shape is q57's IVF cells turned cross-set: the corpus side
      // shuffles ONCE on its cell id, the eval side explodes to its
      // nprobe=4 closest cells, and the join is cell-bucketed — no
      // broadcast of the eval set (at scale eval suites are small but
      // the probe fan-out is what bounds the work: candidates per
      // corpus vector ~ nprobe/K of eval, never all of it). K grows
      // with the corpus (~125 vec/cell) like q93, so cells stay
      // constant-size. Approximation is one-sided and explicit: probes
      // can miss a contaminated pair (recall < 1, the SemDeDup trade),
      // never false-flag one (exact cosine verifies every candidate).
      val n: Long = memo(embCount, dir)(
        Tables(s, dir).embeddings.count())
      val k = math.max(16L, n / 125L).toInt
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
        .withColumn("ss", dot_product(col("emb"), col("emb")))
      val corpus = e.filter(col("vec_id") % 20 =!= 0)
        .withColumn("cell", ivf_cell(col("emb"), k))
      val evalSide = e.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("eid"), col("emb").as("ee"), col("ss").as("ess"),
          explode(ivf_probes(col("emb"), k, 4)).as("cell"))
      val hits = corpus.join(evalSide, Seq("cell"))
        .withColumn("cos", round(dot_product(col("emb"), col("ee")) /
          (sqrt(col("ss")) * sqrt(col("ess"))), 6))
        .filter(col("cos") >= 0.45)
        .groupBy(col("vec_id"))
        .agg(count(lit(1)).as("n_hits"), max(col("cos")).as("max_cos"))
      corpus.select(col("vec_id"))
        .join(hits, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          coalesce(col("max_cos"), lit(0.0)).as("max_cos"),
          (coalesce(col("n_hits"), lit(0L)) > 0L).as("contaminated"))
        .orderBy(col("vec_id"))
    },

    "q116_quality_classifier" -> { (s, dir) =>
      // Model-based quality scoring, fasttext-shaped: a linear
      // classifier over HASHED bag-of-words features whose weight
      // vector ships as part of the plan (here a deterministic
      // hash-derived stand-in for trained weights — the lookup
      // w[md5(tok) & 1023] has exactly the shape of a real quantized
      // model). Weights are INTEGER (int16-ish quantization, like
      // shipped fasttext/CLD3 models), so the per-doc sum is exact
      // whatever the evaluation order and the score is bit-stable at
      // any scale — no FP drift between a laptop run and a
      // 1000-executor run. One codegen'd per-row projection: tokenize,
      // hash, look up, sum, normalize by length. No shuffle beyond the
      // presentation sort; embarrassingly parallel.
      val t = toks(col("text"))
      val ws = transform(t, tok =>
        (md5_lower64(concat(lit("qc:"), tok).cast("binary"))
          .bitwiseAND(lit(1023L)) * lit(2654435761L)) % lit(2048L) - lit(1024L))
      // orderBy FIRST: the kernel projection must stay above the range
      // exchange or the sort-sampling pass evaluates every hash twice
      // (PlanAuditSpec pins this shape for the whole per-row family).
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"), size(t).cast("long").as("n_tokens"),
          aggregate(ws, lit(0L), (a, x) => a + x).as("score_raw"))
        .withColumn("score",
          round(col("score_raw").cast("double") / col("n_tokens"), 6))
        // accept gates on the exact INTEGER score, not the rounded
        // double: round(-1/1e7, 6) = -0.0 and -0.0 >= 0.0 is true, so a
        // double gate would admit slightly-negative docs that q126's
        // fused integer gate (score_raw >= 0) rejects — the two stages
        // are contract-pinned to agree on all inputs (ADVICE r9).
        .withColumn("accept", col("score_raw") >= 0L)
    },

    "q118_pq_ann" -> { (s, dir) => pqAnn(s, dir, useCells = true) },

    "q121_hll_distinct" -> { (s, dir) =>
      // Per-source distinct-SHINGLE cardinality via HyperLogLog — the
      // sketch that replaces count(DISTINCT) when the key space doesn't
      // fit anywhere: state is 256 registers (one byte each) per group
      // whatever the corpus. (Shingles, not tokens: the fixture's token
      // vocabulary is ~31 words, far below raw HLL's validity floor of
      // 2.5m; its 3-gram space is ~1200/source, squarely in the sketch
      // regime — and distinct-ngram counts per slice are a real corpus
      // diversity metric.) Registers are md5-derived (deterministic,
      // mergeable across partitions by MAX — the partial agg IS the
      // sketch union). The estimator is kept in INTEGER form as long as
      // possible: sum_j 2^(-M_j) scales to sum_j 2^(49-M_j), an exact
      // long, so accumulation order never matters; the only FP ops are
      // the final alpha*m^2*2^49/S — one identical expression in both
      // engines. The exact count(DISTINCT) rides along as the audit
      // column (feasible at sf, the thing the sketch replaces at
      // 100 TB). Full Flajolet et al. estimator including the
      // SMALL-RANGE linear-counting correction (raw <= 2.5m with empty
      // registers -> m*ln(m/V)): the fixture's per-source shingle space
      // (~1200) keeps the raw branch live here, the correction branch
      // is exercised by PipelineSpec's planted low-cardinality corpus,
      // and the oracle computes the identical two-branch expression.
      val tok = Tables(s, dir).documents
        .select(col("source"), explode(shingles(toks(col("text")), 3)).as("tok"))
      val regs = hllRegisters(Tables(s, dir).documents)
        .groupBy(col("source"), col("idx"))
        .agg(max(col("rho")).as("m"))
        .groupBy(col("source"))
        .agg((sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - m AS INT))")) +
          (lit(256L) - count(lit(1))) * lit(562949953421312L)).as("s"),
          count(lit(1)).as("nr"))
      val exact = tok.groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("distinct_exact"))
      val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
        lit(65536.0) * lit(562949953421312.0) / col("s")
      exact.join(regs, Seq("source"))
        .select(col("source"), col("n_tokens"), col("distinct_exact"),
          round(when(col("nr") < 256 && raw <= 640.0,
            lit(256.0) * log(lit(256.0) / (lit(256L) - col("nr"))))
            .otherwise(raw), 3).as("hll_est"))
        .orderBy(col("source"))
    },

    "q160_sketch_rollup" -> { (s, dir) =>
      // Sketch ALGEBRA in action — the property that makes sketches
      // the 100 TB answer: per-source HLL register tables MERGE into a
      // corpus-wide estimate by elementwise max, no rescan (the same
      // algebra that rolls hourly sketches into daily into monthly in
      // a reporting stack — compute once at the finest grain, derive
      // every coarser level for free). One register build (q121's
      // kernel), then both the per-source estimates and the
      // merged-corpus estimate derive from the SAME (source, idx, m)
      // table; the spec pins merge == direct-on-corpus register
      // equality (max associativity made observable). Exact distincts
      // ride along as the audit at both levels. Scale shape: registers
      // are 256 cells/source; the merge is a 256-row aggregate —
      // everything after the one token-scan shuffle is sketch-sized.
      val docs = Tables(s, dir).documents
      val tok = docs.select(col("source"),
        explode(shingles(toks(col("text")), 3)).as("tok"))
      val regs = hllRegisters(docs)
        .groupBy(col("source"), col("idx")).agg(max(col("rho")).as("m"))
      def est(g: DataFrame): DataFrame = {
        val t = g.groupBy(col("scope"))
          .agg((sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - m AS INT))")) +
            (lit(256L) - count(lit(1))) * lit(562949953421312L)).as("s"),
            count(lit(1)).as("nr"))
        val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
          lit(65536.0) * lit(562949953421312.0) / col("s")
        t.select(col("scope"), round(when(col("nr") < 256 && raw <= 640.0,
            lit(256.0) * log(lit(256.0) / (lit(256L) - col("nr"))))
            .otherwise(raw), 3).as("hll_est"))
      }
      val perSource = est(regs.select(col("source").as("scope"),
        col("idx"), col("m")))
      val corpus = est(regs.groupBy(col("idx")).agg(max(col("m")).as("m"))
        .select(lit("__corpus__").as("scope"), col("idx"), col("m")))
      val exSource = tok.groupBy(col("source").as("scope"))
        .agg(countDistinct(col("tok")).as("distinct_exact"))
      val exCorpus = tok.agg(countDistinct(col("tok")).as("distinct_exact"))
        .select(lit("__corpus__").as("scope"), col("distinct_exact"))
      perSource.unionAll(corpus)
        .join(exSource.unionAll(exCorpus), Seq("scope"))
        .select(col("scope"), col("distinct_exact"), col("hll_est"))
        .orderBy(col("scope"))
    },

    "q161_kmv_overlap" -> { (s, dir) =>
      // Pairwise source vocabulary OVERLAP via k-minimum-values
      // sketches (Bar-Yossef et al. 2002 / the theta-sketch family) —
      // the set operation HLL can't give: intersections. q121/q160's
      // registers union by max but cannot intersect; a KMV sketch (the
      // k smallest distinct 48-bit hashes, i.e. exactly MinKAgg's
      // bounded buffer) supports union (bottom-k of concatenated
      // sketches), |U| estimation ((k-1)*2^48/tau_k), and Jaccard
      // (matching fraction within the union sketch), so pairwise
      // intersection = J_est * U_est without ever joining token
      // streams. Scale shape: ONE token scan -> 128 longs of mergeable
      // partial state per source; everything pairwise runs on the
      // |sources|^2-bounded sketch table with <=128-element arrays.
      // When a union sketch is UNSATURATED (ku < k) it holds the whole
      // set and every estimate is exact — the spec pins that, plus the
      // 1/sqrt(k-2) error envelope when saturated. The exact
      // inter/union audit joins at token-TYPE level (vocab-bounded,
      // never corpus-bounded) and exists only to validate the sketch.
      val k = 128
      val docs = Tables(s, dir).documents
      val d = docs.select(col("source"), explode(toks(col("text"))).as("tok"))
        .distinct()
      val h = md5_lower64(concat(lit("kmv:"), col("tok")).cast("binary"))
        .bitwiseAND(lit(281474976710655L))
      val sk = d.select(col("source"), h.as("h"))
        .groupBy(col("source")).agg(min_k(col("h"), k).as("sk"))
      val nd = d.groupBy(col("source")).agg(count(lit(1)).as("nd"))
      val a = sk.join(nd, Seq("source"))
        .select(col("source").as("src_a"), col("sk").as("ska"), col("nd").as("nda"))
      val b = sk.join(nd, Seq("source"))
        .select(col("source").as("src_b"), col("sk").as("skb"), col("nd").as("ndb"))
      val inter = d.as("x")
        .join(d.as("y"), col("x.tok") === col("y.tok") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("exact_inter"))
      val un = slice(array_sort(array_union(col("ska"), col("skb"))), 1, k)
      val pairs = a.join(broadcast(b), col("src_a") < col("src_b"))
        .withColumn("un", un)
        .withColumn("ku", size(col("un")).cast("long"))
        .withColumn("tau", element_at(col("un"), size(col("un"))))
        .withColumn("m", size(filter(col("un"),
          x => array_contains(col("ska"), x) && array_contains(col("skb"), x))).cast("long"))
      val uEst = when(col("ku") < k, col("ku").cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0) / col("tau"))
      val jEst = col("m").cast("double") / col("ku")
      pairs
        .join(inter.hint("broadcast"), Seq("src_a", "src_b"), "left")
        .na.fill(0L, Seq("exact_inter"))
        .select(col("src_a"), col("src_b"), col("exact_inter"),
          (col("nda") + col("ndb") - col("exact_inter")).as("exact_union"),
          round(uEst, 3).as("union_est"),
          round(jEst, 6).as("jacc_est"),
          round(jEst * uEst).cast("long").as("inter_est"))
        .orderBy(col("src_a"), col("src_b"))
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

    "q167_fuzzy_join" -> { (s, dir) =>
      // Fuzzy string self-join (edit distance <= 1) via DELETION-
      // NEIGHBORHOOD blocking (the SymSpell candidate scheme) — the
      // typo/variant detector behind vocab normalization and OCR
      // cleanup, and the join family (similarity join on strings)
      // Spark has no operator for. All-pairs levenshtein is |V|^2;
      // instead each vocab word explodes to itself + its length
      // single-deletion variants, and two words are candidates iff
      // they share a variant — which covers every distance<=1 pair
      // (substitution: both drop the differing char; indel: the short
      // word IS a variant of the long one). The blocking is provably
      // bounded: the words mapping to a variant v are v itself plus
      // single-char insertions into v, so a bucket can never exceed
      // |alphabet|*(len+1)+1 rows regardless of corpus size — the
      // self-join fan-out is capped by CONSTRUCTION, not by a heuristic
      // cap. Exact levenshtein then verifies candidates (distance-2
      // del+ins pairs also collide; the verify drops them). Scale:
      // everything runs at vocabulary TYPE level — one token-count
      // shuffle, one variant shuffle, never a corpus-sized pair join.
      val vocab = Tables(s, dir).documents
        .select(explode(toks(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .filter(length(col("w")) >= 4 && col("cnt") >= 2)
      val vars = vocab.select(col("w"), col("cnt"),
        explode(concat(array(col("w")),
          transform(sequence(lit(0), length(col("w")) - 1),
            i => concat(col("w").substr(lit(1), i),
              col("w").substr(i + lit(2), length(col("w"))))))).as("v"))
      vars.as("a").join(vars.as("b"),
          col("a.v") === col("b.v") && col("a.w") < col("b.w"))
        .select(col("a.w").as("w1"), col("b.w").as("w2"),
          col("a.cnt").as("cnt1"), col("b.cnt").as("cnt2"))
        .distinct()
        .filter(levenshtein(col("w1"), col("w2")) <= 1)
        .orderBy(col("w1"), col("w2"))
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

    "q169_bloom_join" -> { (s, dir) =>
      // Bloom-reduced join (the runtime-filter / semi-join-reduction
      // pattern): before lineitem joins the urgent-order dim, the dim
      // keys collapse to a 128 KiB Bloom bitmap that rides into a
      // MAP-ONLY probe filter — at 100 TB the fact table's join
      // shuffle carries only rows that can possibly match (~20% here),
      // and the bitmap stays constant-size however big the dim grows
      // (vs a broadcast HashedRelation of the key set, which does
      // not). No false negatives, so the exact join that follows sees
      // every true match and drops the predictable trickle of false
      // positives; the 1-row output reports the funnel (keys, bloom
      // passes, true matches, revenue) so the reduction and the FP
      // rate are both observable. The audit join is SHUFFLE_HASH on
      // the bloom survivors — broadcasting the key set would assume
      // exactly what the bloom exists to avoid (q105's argument).
      val m = 1 << 20
      val urgent = Tables(s, dir).orders
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val bits = memo(bloomJoinBits, dir) {
        val pos = urgent.select(explode(array((0 until 3).map(j =>
          md5_lower64(concat(lit(s"bf$j:"), col("o_orderkey").cast("string"))
            .cast("binary")).bitwiseAND(lit((m - 1).toLong))): _*)).as("p"))
          .distinct().collect()
        val arr = new Array[Byte](m >>> 3)
        pos.foreach { r =>
          val p = r.getLong(0)
          arr((p >>> 3).toInt) = (arr((p >>> 3).toInt) | (1 << (p & 7L).toInt)).toByte
        }
        arr
      }
      val li = Tables(s, dir).lineitem.select(col("l_orderkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("rev"))
      li.filter(size(bloom_hits(lit(bits),
          array(col("l_orderkey").cast("string")))) === 1)
        .join(urgent.withColumn("hit", lit(1)).hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(count(lit(1)).as("n_pass_bloom"),
          sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_true"),
          sum(when(col("hit").isNotNull, col("rev")).otherwise(0L))
            .as("revenue_cents"))
        .crossJoin(broadcast(urgent.agg(count(lit(1)).as("n_urgent_keys"))))
        .select(col("n_urgent_keys"), col("n_pass_bloom"), col("n_true"),
          col("revenue_cents"))
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

    "q173_profile" -> { (s, dir) =>
      // One-pass data profiling (the ANALYZE TABLE / data-catalog
      // operator): per-column completeness, cardinality, and range for
      // four lineitem columns WITHOUT per-column scans — the columns
      // unpivot through one explode into a (col, value) stream, so
      // nulls, min/max, and an HLL distinct estimate (q121's integer
      // registers, exact-audited here by countDistinct) all come from
      // a single read and one (col, idx)-cell shuffle. At 100 TB a
      // profile that scans once per column reads the corpus N_cols
      // times; this reads it once, and every post-scan table is
      // <= cols x 256 cells. Values profile through their canonical
      // string form (a catalog profiles heterogeneous columns through
      // one schema; typed min/max stay derivable per family).
      val li = Tables(s, dir).lineitem
      val stacked = li.select(explode(array(
        struct(lit("l_returnflag").as("c"), col("l_returnflag").as("v")),
        struct(lit("l_linestatus").as("c"), col("l_linestatus").as("v")),
        struct(lit("l_quantity").as("c"),
          floor(col("l_quantity")).cast("long").cast("string").as("v")),
        struct(lit("l_partkey").as("c"),
          col("l_partkey").cast("string").as("v")))).as("cv"))
        .select(col("cv.c").as("c"), col("cv.v").as("v"))
      val base = stacked.groupBy(col("c")).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        countDistinct(col("v")).as("distinct_exact"))
      // HLL registers per column over the same stacked stream
      val h = stacked.filter(col("v").isNotNull).select(col("c"),
        md5_lower64(concat(lit("prof:"), col("v")).cast("binary")).as("h"))
        .select(col("c"), col("h").bitwiseAND(lit(255L)).as("idx"),
          shiftrightunsigned(col("h"), 8).bitwiseAND(lit(281474976710655L)).as("w"))
      val regs = Seq(1, 2, 4, 8, 16, 32)
        .foldLeft(h)((df, k) =>
          df.withColumn("w", col("w").bitwiseOR(shiftrightunsigned(col("w"), k))))
        .select(col("c"), col("idx"), (lit(49) - bit_count(col("w"))).as("rho"))
        .groupBy(col("c"), col("idx")).agg(max(col("rho")).as("m"))
      val est = regs.groupBy(col("c"))
        .agg((sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - m AS INT))")) +
          (lit(256L) - count(lit(1))) * lit(562949953421312L)).as("ssum"),
          count(lit(1)).as("nr"))
      val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
        lit(65536.0) * lit(562949953421312.0) / col("ssum")
      val hll = est.select(col("c"), round(when(col("nr") < 256 && raw <= 640.0,
          lit(256.0) * log(lit(256.0) / (lit(256L) - col("nr"))))
          .otherwise(raw), 3).as("distinct_est"))
      base.join(hll, Seq("c"))
        .select(col("c"), col("n_rows"), col("n_null"),
          col("distinct_exact"), col("distinct_est"),
          col("min_v"), col("max_v"))
        .orderBy(col("c"))
    },

    "q174_cumulative_distinct" -> { (s, dir) =>
      // Cumulative unique-users curve (running distinct over time) —
      // the growth chart whose naive form, COUNT(DISTINCT) OVER
      // (ORDER BY day), re-deduplicates the entire history per day.
      // Two scale answers, both here: EXACT via first-seen collapse
      // (distinct-over-time == cumsum of first-appearance counts: one
      // user rollup to min(day), one tiny cumsum), and SKETCHED via
      // the HLL prefix-union property — cumulative union of daily
      // register tables is a running MAX per register cell (the
      // windowed form of q160's grain merge), so any day's estimate
      // derives from <= days x 256 cells with NO rescan of history.
      // The two curves ride side by side; their agreement is the
      // audit. All windows run on day-bounded cell tables.
      val ev = Tables(s, dir).events
      val ud = ev.select(col("user_id"), Tables.eventMicros(ev).as("tus"))
        .select(col("user_id"), expr("tus DIV 86400000000").as("day"))
      val exact = ud.groupBy(col("user_id")).agg(min(col("day")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("nf"))
      // every active day appears in the output, not just first-seen days
      val days = ud.select(col("day")).distinct()
      val wcum = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val exactCurve = days.join(exact, Seq("day"), "left")
        .na.fill(0L, Seq("nf"))
        .withColumn("exact_cum", sum(col("nf")).over(wcum)).drop("nf")
      val h = ud.distinct().select(col("day"),
        md5_lower64(concat(lit("cu:"), col("user_id").cast("string"))
          .cast("binary")).as("h"))
        .select(col("day"), col("h").bitwiseAND(lit(255L)).as("idx"),
          shiftrightunsigned(col("h"), 8).bitwiseAND(lit(281474976710655L)).as("w"))
      val regs = Seq(1, 2, 4, 8, 16, 32)
        .foldLeft(h)((df, k) =>
          df.withColumn("w", col("w").bitwiseOR(shiftrightunsigned(col("w"), k))))
        .select(col("day"), col("idx"), (lit(49) - bit_count(col("w"))).as("rho"))
        .groupBy(col("day"), col("idx")).agg(max(col("rho")).as("m"))
      // prefix-union: running max per register across days; absent
      // (day, idx) pairs inherit via the day-spine cross join with the
      // 256 cells (days x 256 bounded)
      val spine = days.crossJoin(broadcast(
        s.range(0, 256).select(col("id").as("idx"))))
      val wpre = Window.partitionBy(col("idx")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = spine.join(regs, Seq("day", "idx"), "left")
        .withColumn("mc", max(col("m")).over(wpre))
        .filter(col("mc").isNotNull)
      val est = cum.groupBy(col("day"))
        .agg((sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - mc AS INT))")) +
          (lit(256L) - count(lit(1))) * lit(562949953421312L)).as("ssum"),
          count(lit(1)).as("nr"))
      val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
        lit(65536.0) * lit(562949953421312.0) / col("ssum")
      est.select(col("day"), round(when(col("nr") < 256 && raw <= 640.0,
          lit(256.0) * log(lit(256.0) / (lit(256L) - col("nr"))))
          .otherwise(raw), 3).as("hll_cum_est"))
        .join(exactCurve, Seq("day"))
        .select(col("day"), col("exact_cum"), col("hll_cum_est"))
        .orderBy(col("day"))
    },

    "q175_blocklist_filter" -> { (s, dir) =>
      // Blocklist phrase filtering — the safety/compliance gate every
      // training pipeline runs: count occurrences of listed 1..2-token
      // phrases per document and flag documents over threshold. The
      // phrase list rides as a PLAN LITERAL into an isin filter over
      // the token/shingle streams (broadcast-free, map-side; the list
      // is config-scale however big the corpus), counts come from one
      // explode + filter + doc rollup, and the rollup is the only
      // shuffle. Phrases match at TOKEN level (exact word-sequence
      // hits, not substring false positives: "data" never fires inside
      // "database" — shingle equality is the tokenized-match contract).
      val uni = Seq("data", "slow")
      val bi = Seq("hash join", "table scan")
      val docs = Tables(s, dir).documents
      val t1 = docs.select(col("doc_id"), explode(toks(col("text"))).as("g"))
        .filter(col("g").isin(uni: _*))
      // occurrence counts need the NON-distinct bigram stream (the
      // shingles kernel dedups within a doc), so bigrams come from a
      // positional transform. The token array materializes in its OWN
      // projection first: referencing the split expression inside the
      // lambda would inline it per element_at — two split() calls per
      // bigram, quadratic per doc (the round-11a plan-size lesson;
      // measured 5.4 s -> sub-second at sf0.1)
      val tk = docs.select(col("doc_id"), toks(col("text")).as("tk"))
      val t2 = tk
        .select(col("doc_id"), explode(when(size(col("tk")) >= 2,
          transform(sequence(lit(1), size(col("tk")) - 1),
            i => concat(element_at(col("tk"), i), lit(" "),
              element_at(col("tk"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("g"))
        .filter(col("g").isin(bi: _*))
      val hits = t1.unionAll(t2)
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_hits"),
          count(lit(1)).as("n_phrases_hit"))
      docs.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_hits", "n_phrases_hit"))
        .withColumn("flagged", col("n_hits") >= 8)
        .orderBy(col("doc_id"))
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

    "q178_joinsize_sketch" -> { (s, dir) =>
      // Self-join-size (F2) estimation WITHOUT joining — the AMS
      // second-moment machinery in CMS form: est = min over rows of
      // sum(cell^2) upper-bounds the token-equality self-join row
      // count (= sum over keys of cnt^2). This is the number that
      // predicts a BLOCKING JOIN's blowup before you run it — "how
      // many candidate pairs will the q31/q82 bucket join produce?" —
      // asked of a 16 KiB sketch built in one scan instead of the
      // join itself. The additive error is F1^2/w, negligible exactly
      // when the distribution is skewed enough for the question to
      // matter (hot keys dominate F2). Exact F2 rides along as the
      // audit; CMS inner products never UNDERestimate (spec-pinned).
      // (The two-table variant needs w ~ F1a*F1b/J for tightness —
      // for small FK joins prefer sample-and-count; documented, not
      // sketched here.)
      val cells = cmsGrid(Tables(s, dir).documents)
        .groupBy(col("d"), col("idx")).agg(count(lit(1)).as("cell"))
      val est = cells
        .groupBy(col("d")).agg(sum(col("cell") * col("cell")).as("ip"))
        .agg(min(col("ip")).as("est_f2"))
      val exact = Tables(s, dir).documents
        .select(explode(toks(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("exact_f2"))
      est.crossJoin(broadcast(exact))
        .select(col("est_f2"), col("exact_f2"),
          round((col("est_f2") - col("exact_f2")).cast("double") /
            col("exact_f2").cast("double"), 4).as("overest_frac"))
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

    "q182_bm25_ndcg" -> { (s, dir) =>
      // Retrieval-quality evaluation (nDCG@10) of the q112 BM25
      // ranker — the eval harness that closes the lexical loop the way
      // q158's recall audit closes the ANN loop. Graded relevance =
      // distinct query terms a doc contains (0..4, exact integer);
      // DCG folds the RANKED list's gains under 1/log2(rank+1), IDCG
      // re-ranks by relevance itself (doc_id tie-break, both engines),
      // nDCG = the single division at the end. Plan adds only
      // TakeOrdered top-10s and a 10-row fold to whatever the ranker
      // costs — the corpus still filters to query terms before any
      // shuffle. ln/ln2 spelled identically both engines.
      val terms = Seq("dup", "vector", "hash", "merge")
      val stats = memo(bm25Stats, dir) {
        val r = Tables(s, dir).documents
          .agg(count(lit(1)),
            avg(size(toks(col("text"))).cast("double"))).head
        (r.getLong(0), r.getDouble(1))
      }
      val (nDocs, avgdl) = stats
      val matched = Tables(s, dir).documents
        .select(col("doc_id"), size(toks(col("text"))).cast("double").as("dl"),
          explode(toks(col("text"))).as("token"))
        .filter(col("token").isin(terms: _*))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).cast("double").as("tf"), max(col("dl")).as("dl"))
        .withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("token"))).cast("double"))
      val idf = log((lit(nDocs.toDouble) - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0))
      val contrib = idf * col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl)))
      val scored = matched.groupBy(col("doc_id"))
        .agg(round(sum(contrib), 6).as("score"),
          countDistinct(col("token")).cast("long").as("rel"))
      def gainSum(df: DataFrame, ord: Seq[Column]): DataFrame =
        df.orderBy(ord: _*).limit(10)
          .withColumn("rk", row_number().over(Window.orderBy(ord: _*)))
          .agg(sum(col("rel").cast("double") /
            (log(col("rk").cast("double") + lit(1.0)) / log(lit(2.0))))
            .as("g"))
      val dcg = gainSum(scored, Seq(col("score").desc, col("doc_id")))
        .select(round(col("g"), 6).as("dcg"))
      val idcg = gainSum(scored, Seq(col("rel").desc, col("doc_id")))
        .select(round(col("g"), 6).as("idcg"))
      dcg.crossJoin(broadcast(idcg))
        .select(col("dcg"), col("idcg"),
          round(col("dcg") / col("idcg"), 6).as("ndcg"))
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
      graft.operators.Quantile.ranked(scored, Seq.empty, "sneg", "doc_id")
        .withColumn("decile",
          graft.operators.Quantile.ntileOf("rn", "n", 10).cast("long"))
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

    "q187_knn_graph_stats" -> { (s, dir) =>
      // kNN-graph structure audit: build the cell-bounded k-nearest-
      // neighbor graph over the embeddings (each vector's top-3
      // cosine neighbors WITHIN its q57 IVF cell), symmetrize, and
      // measure edges / wedges / triangles / global clustering — the
      // transitivity diagnostic behind graph-based dedup and community
      // detection (near-dup neighborhoods should be clique-like; a low
      // coefficient means the neighbor threshold is mixing clusters).
      // Scale shape: the only quadratic is WITHIN a cell, and K GROWS
      // with the corpus (max(16, n/125), q93/q115's contract) so cells
      // stay ~constant-size and per-vector work is flat — the fixed
      // K=16 form measured 17x for 10x data on the sf1 ladder before
      // this was made adaptive (PERF_NOTES round-12a); edges are <= 3
      // per vertex by construction, so the wedge join is
      // degree-bounded (<= C(6,2) per vertex), never corpus-quadratic.
      // Triangle counting is the standard closed-wedge form: each
      // triangle closes exactly 3 wedges (one per center), so
      // n_triangles = closed/3 — integer on both engines.
      val n: Long = memo(embCount, dir)(Tables(s, dir).embeddings.count())
      val K = math.max(16L, n / 125L).toInt
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
        .withColumn("ss", dot_product(col("emb"), col("emb")))
        .withColumn("cell", ivf_cell(col("emb"), K))
      val nb = e.select(col("cell").as("b_cell"), col("vec_id").as("nb"),
        col("emb").as("ne"), col("ss").as("nss"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nb"))
      val knn = e.join(nb, col("cell") === col("b_cell") &&
          col("vec_id") =!= col("nb"))
        .withColumn("cos", round(dot_product(col("emb"), col("ne")) /
          (sqrt(col("ss")) * sqrt(col("nss"))), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("vec_id"), col("nb"))
      val edges = knn.select(least(col("vec_id"), col("nb")).as("u"),
        greatest(col("vec_id"), col("nb")).as("v")).distinct()
      val adj = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val wedges = adj.as("x").join(adj.as("y"),
          col("x.u") === col("y.u") && col("x.v") < col("y.v"))
        .select(col("x.v").as("b"), col("y.v").as("c"))
      val closed = wedges.join(edges,
        wedges("b") === edges("u") && wedges("c") === edges("v"))
      val nv = e.agg(count(lit(1)).cast("long").as("n_vertices"))
      val ne2 = edges.agg(count(lit(1)).cast("long").as("n_edges"))
      val nw = wedges.agg(count(lit(1)).cast("long").as("n_wedges"))
      val nc = closed.agg(count(lit(1)).cast("long").as("n_closed"))
      nv.crossJoin(broadcast(ne2)).crossJoin(broadcast(nw))
        .crossJoin(broadcast(nc))
        .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
          expr("n_closed div 3").as("n_triangles"),
          round(col("n_closed").cast("double") / col("n_wedges"), 6)
            .as("clustering"))
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

    "q190_pmi_pairs" -> { (s, dir) =>
      // Pointwise mutual information of token pairs co-occurring
      // within a 3-token window (Church & Hanks 1990) — the collocation
      // statistic behind phrase mining and tokenizer-merge scoring
      // (q146's co-occurrence edges, scored instead of ranked). All
      // counts are exact integers; PMI multiplies them as DOUBLES in a
      // FIXED left-to-right order (products reach ~1e20 at the sf10
      // ladder, past long range) so both engines compute bit-identical
      // IEEE products before the single ln. Scale shape: the pair join
      // is per-doc positional (distance <= 3, so fan-out is 3 rows per
      // token, never doc-quadratic) on ONE doc_id shuffle; marginals
      // are a vocabulary-sized broadcast; the top-20 is TakeOrdered.
      val tk = Tables(s, dir).documents
        .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "w")))
      val b = tk.select(col("doc_id").as("d2"), col("pos").as("pos2"),
        col("w").as("wb"))
      // merge hint: explode wrecks size stats, and at the sf10 ladder
      // the planner tried to BROADCAST one side of this self-join
      // (driver OOM) — sort-merge on doc_id is the shape that holds at
      // any corpus size (both sides shuffle once on the join key)
      val pairs = tk.hint("merge").join(b, col("doc_id") === col("d2") &&
          col("pos2") > col("pos") && col("pos2") - col("pos") <= 3)
        .select(least(col("w"), col("wb")).as("w1"),
          greatest(col("w"), col("wb")).as("w2"))
      val cp = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_pair"))
      val cw = tk.groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val tTok = tk.agg(count(lit(1)).as("t_tok"))
      val tPair = pairs.agg(count(lit(1)).as("t_pair"))
      cp.filter(col("c_pair") >= 20)
        .join(broadcast(cw.select(col("w").as("w1"), col("cw").as("c1"))), "w1")
        .join(broadcast(cw.select(col("w").as("w2"), col("cw").as("c2"))), "w2")
        .crossJoin(broadcast(tTok)).crossJoin(broadcast(tPair))
        .select(col("w1"), col("w2"), col("c_pair"),
          round(log(col("c_pair").cast("double") * col("t_tok") * col("t_tok") /
            (col("t_pair").cast("double") * col("c1") * col("c2"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(20)
    },

    "q191_cluster_outliers" -> { (s, dir) =>
      // Distance-to-centroid outlier sweep — the embedding-space data-
      // cleaning pass that follows clustering: within each q114 k-means
      // cluster, flag vectors beyond the cluster's nearest-rank p95
      // distance (mislabeled points, junk embeddings, cluster-boundary
      // strays). Distances are q114's fixed-point integers, so the
      // cutoff and the flag are EXACT on both engines — no FP at all.
      // Scale shape: assignment is q114's map-only plan-literal pass;
      // the per-cluster p95 is the EXACT distributed rank
      // (operators/Quantile — |clusters| is a small constant, so a
      // cluster-partitioned window would put the whole corpus through
      // k partitions; the range-bucketed rank never does), and the
      // one-row-per-cluster cutoff table broadcasts back for the tail
      // filter.
      val asg = queries("q114_kmeans_cluster")(s, dir)
      val ranked = graft.operators.Quantile.ranked(
        asg, Seq("cluster"), "dist", "vec_id")
      val cuts = ranked
        .filter(col("rn") === expr("(19 * n + 19) DIV 20"))
        .groupBy(col("cluster")).agg(max(col("dist")).as("p95"))
      ranked.join(broadcast(cuts), "cluster")
        .filter(col("dist") > col("p95"))
        .select(col("vec_id"), col("cluster"), col("dist"), col("p95"))
        .orderBy(col("cluster"), col("dist").desc, col("vec_id"))
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
      val base = Tables(s, dir).events
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 100).cast("long").as("c"))
      val ranked = graft.operators.Quantile.ranked(
        base, Seq("event_type"), "c", "event_id")
      val cuts = ranked
        .filter(col("rn") === expr("(n + 19) DIV 20") ||
          col("rn") === expr("(19 * n + 19) DIV 20"))
        .groupBy(col("event_type"))
        .agg(max(when(col("rn") === expr("(n + 19) DIV 20"), col("c")))
            .as("lo"),
          max(when(col("rn") === expr("(19 * n + 19) DIV 20"), col("c")))
            .as("hi"))
      ranked.join(broadcast(cuts), "event_type")
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
      val scored = graft.operators.Quantile.ranked(
          dims, Seq("dim"), "v", "user_id")
        .withColumn("score",
          graft.operators.Quantile.ntileOf("rn", "n", 4).cast("long"))
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

    "q194_ctfidf_keywords" -> { (s, dir) =>
      // Class-based TF-IDF keywords (the c-TF-IDF of Grootendorst's
      // BERTopic, 2022): per SOURCE, the tokens whose in-class rate
      // most exceeds their corpus rate — score = (tf_class/total_class)
      // * ln(1 + avg_class_tokens/corpus_tf) — the corpus-exploration
      // readout "what is each source about" (q146 ranks tokens within
      // a doc; this ranks them across classes). Counts are exact
      // integers; the two divisions and one ln are spelled identically
      // on both engines and rounded at 6. Scale shape: ONE
      // (source, token) shuffle with map-side partials; the corpus
      // marginal is a vocabulary-sized broadcast; per-class totals ride
      // a window over the class cells; top-5 per class is a rank
      // window over |classes| x |vocab| cells, never raw tokens.
      val tk = Tables(s, dir).documents
        .select(col("source"), explode(toks(col("text"))).as("token"))
      val cls = tk.groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("tfc"))
        .withColumn("totc",
          sum(col("tfc")).over(Window.partitionBy(col("source"))))
      val corpus = tk.groupBy(col("token")).agg(count(lit(1)).as("ft"))
      val tots = tk.agg(count(lit(1)).as("t_tok"),
        countDistinct(col("source")).as("n_cls"))
      val wr = Window.partitionBy(col("source"))
        .orderBy(col("score").desc, col("token"))
      cls.join(broadcast(corpus), "token")
        .crossJoin(broadcast(tots))
        .withColumn("score",
          round(col("tfc").cast("double") / col("totc") *
            log(lit(1.0) + col("t_tok").cast("double") /
              (col("n_cls") * col("ft"))), 6))
        .withColumn("rk", row_number().over(wr).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("source"), col("rk"), col("token"), col("score"))
        .orderBy(col("source"), col("rk"))
    },

    "q195_token_burstiness" -> { (s, dir) =>
      // Token burstiness (Church & Gale 1995): the variance-to-mean
      // ratio of a token's per-document count — VMR 1 is Poisson
      // background, VMR >> 1 marks content words that arrive in bursts
      // (and candidate boilerplate when paired with high df). Over ALL
      // N docs (absent docs contribute 0), so
      // VMR = (N*sum(x^2) - tf^2) / (N*tf) from three exact integer
      // sums — products stay inside a long through the sf10 ladder;
      // one division + round at the end. Scale shape: ONE (doc, token)
      // count agg, then a vocabulary-sized token rollup; the doc total
      // is a broadcast ONE-ROW literal.
      val perDoc = Tables(s, dir).documents
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("x"))
      val nDocs = Tables(s, dir).documents.agg(count(lit(1)).as("n_docs"))
      perDoc.groupBy(col("token"))
        .agg(sum(col("x")).as("tf"), count(lit(1)).as("df"),
          sum(col("x") * col("x")).as("sx2"))
        .crossJoin(broadcast(nDocs))
        .select(col("token"), col("tf"), col("df"),
          round((col("n_docs") * col("sx2") - col("tf") * col("tf"))
            .cast("double") / (col("n_docs") * col("tf")).cast("double"), 6)
            .as("vmr"))
        .orderBy(col("vmr").desc, col("token"))
    },

    "q196_embedding_dim_stats" -> { (s, dir) =>
      // Per-dimension embedding health check: n / mean / population std
      // / min / max for each of the 64 dimensions — the feature-drift
      // and dead-dimension audit a vector pipeline runs before
      // training or indexing (a constant dim kills PQ subspaces; a
      // shifted mean breaks cosine thresholds). One posexplode scan
      // into a 64-cell agg with map-side partials — nothing global,
      // holds at any corpus size. Values cast to double before any
      // sum; mean/std spelled identically both engines and rounded
      // at 6 (summation order is the only FP freedom). Every column is
      // a mergeable partial, so the same plan runs over readStream in
      // complete mode as a LIVE drift monitor (spec-pinned).
      dimStats(Tables(s, dir).embeddings).orderBy(col("dim"))
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

    "q198_zipf_fit" -> { (s, dir) =>
      // Zipf's-law fit over the corpus vocabulary: OLS slope and R^2 of
      // ln(freq) against ln(rank) — the distributional sanity check a
      // curation pipeline runs on tokenizer output (natural text slopes
      // ~ -1; synthetic/boilerplate corpora flatten). Ranks are exact
      // integers (freq desc, token tie-break); the five OLS sums run
      // over VOCABULARY cells (q150's closed form in log space), so the
      // only FP freedom is the order of a |vocab|-term sum, absorbed by
      // round 6. Scale shape: one token count agg, one |vocab| window
      // rank, one single-row rollup.
      val vocab = Tables(s, dir).documents
        .select(explode(toks(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .withColumn("rnk", row_number()
          .over(Window.orderBy(col("freq").desc, col("token"))).cast("long"))
        .select(log(col("rnk").cast("double")).as("x"),
          log(col("freq").cast("double")).as("y"))
      vocab
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("n").as("n_types"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("zipf_slope"),
          round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
            ((col("n") * col("sxx") - col("sx") * col("sx")) *
             (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
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

    "q204_capture_recapture" -> { (s, dir) =>
      // Capture-recapture (Lincoln-Petersen) corpus-universe estimate —
      // "how many DISTINCT documents would full dedup leave" from two
      // small independent hash samples instead of a full exact count:
      // draw sample A (md5 "cap_a:" of the content fingerprint, low 3
      // bits = 0 -> ~1/8) and sample B (independent "cap_b:" salt),
      // count distinct fingerprints in each and in the overlap, then
      // N_hat = |A|*|B|/|A∩B| (Chapman's +1 bias correction, exact
      // integers until the one division). The exact distinct count
      // rides alongside as the audit (q121's sketch-vs-exact posture).
      // Scale shape: two map-side sample filters + distinct aggs over
      // ~1/8 of fingerprints each; the full-corpus exact audit is the
      // expensive column, the estimator never touches unsampled rows.
      val d = Tables(s, dir).documents
        .select(md5(col("text").cast("binary")).as("fp"))
      val inA = md5_lower64(concat(lit("cap_a:"), col("fp"))
        .cast("binary")).bitwiseAND(lit(7L)) === 0L
      val inB = md5_lower64(concat(lit("cap_b:"), col("fp"))
        .cast("binary")).bitwiseAND(lit(7L)) === 0L
      d.agg(countDistinct(col("fp")).as("exact_distinct"),
          countDistinct(when(inA, col("fp"))).as("n_a"),
          countDistinct(when(inB, col("fp"))).as("n_b"),
          countDistinct(when(inA && inB, col("fp"))).as("n_ab"))
        .select(col("exact_distinct"), col("n_a"), col("n_b"), col("n_ab"),
          round((col("n_a") + 1).cast("double") * (col("n_b") + 1) /
            (col("n_ab") + 1) - 1.0, 6).as("n_hat"))
    },

    "q122_cms_heavy_hitters" -> { (s, dir) =>
      // Heavy-hitter token counts via a Count-Min sketch (depth 4 x
      // width 1024): the frequency table that stays 16 KiB whatever the
      // vocabulary. Every estimate is min over 4 hash rows, integer
      // arithmetic throughout, and over-estimation only (est >= exact
      // by construction — the spec pins it). Plan shape: building the
      // sketch is ONE partial-aggregated shuffle of (d, idx) cells
      // (4096 groups — the map-side combine does almost all the work);
      // probing joins the 50 candidates against the 4096-cell table.
      // The exact counts ride along as the audit the sketch replaces
      // at scale.
      val tok = Tables(s, dir).documents
        .select(explode(toks(col("text"))).as("tok"))
      val cells = cmsGrid(Tables(s, dir).documents)
        .groupBy(col("d"), col("idx"))
        .agg(count(lit(1)).as("cell"))
      // TakeOrdered top-50, then ranks over just those 50 rows (never a
      // global window over the full vocabulary)
      val top = tok.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("tok")).limit(50)
        .withColumn("rnk", row_number()
          .over(Window.orderBy(col("exact").desc, col("tok"))).cast("long"))
      top
        .select(col("rnk"), col("tok"), col("exact"),
          explode(array((0 until 4).map(d =>
            struct(lit(d).as("d"), cmsIdx(col("tok"), d).as("idx"))): _*)).as("c"))
        .join(cells, col("c.d") === cells("d") && col("c.idx") === cells("idx"))
        .groupBy(col("rnk"), col("tok"), col("exact"))
        .agg(min(col("cell")).as("cms_est"))
        .select(col("rnk"), col("tok"), col("exact"), col("cms_est"),
          (col("cms_est") - col("exact")).as("overcount"))
        .orderBy(col("rnk"))
    },

    "q130_bpe_train" -> { (s, dir) =>
      // TRAIN a BPE tokenizer vocabulary on the corpus (Sennrich et
      // al. 2016) — the operator that turns raw text into the merge
      // table every LLM tokenizer ships. T=6 merge rounds as a driver
      // control loop (q114's Lloyd pattern): per round one distributed
      // adjacent-pair count over the word-TYPE table — occurrences
      // roll up to types once, so the per-round pass scales with
      // vocabulary, not corpus — and a single (cnt DESC, lhs, rhs)
      // argmax row to the driver; merges-so-far ride into the
      // bpe_apply kernel as plan literals (the broadcast analogue).
      // Greedy left-to-right apply semantics match the reference BPE
      // loop exactly; the oracle unrolls the same 6 rounds as CTEs
      // with a list_reduce fold proven equivalent to the kernel's.
      // Output = the learned artifact: (rank, lhs, rhs, cnt).
      import s.implicits._
      val merges = memo(bpeMerges, dir)(bpeTrain(Tables(s, dir).documents, 6))
      merges.zipWithIndex
        .map { case ((a, b, c), i) => (i + 1L, a, b, c) }
        .toDF("rank", "lhs", "rhs", "cnt")
        .orderBy(col("rank"))
    },

    "q131_bpe_tokenize" -> { (s, dir) =>
      // APPLY the q130-trained merges to the whole corpus and report
      // the standard per-source tokenizer health metric (compression =
      // chars per BPE token). Merges ride as plan literals into the
      // bpe_apply kernel; because the OUTPUT is per-source stats (not
      // per-doc token ids), segmentation rides the word-TYPE rollup:
      // occurrences collapse to (source, word, n) in the map-side
      // combine — the shuffle carries |sources|x|vocab| rows, not the
      // token stream — and the kernel runs once per TYPE, weighted by
      // n on the way to the source rollup. Measured at sf10 (900M
      // occurrences): 18.7 s -> 4.4 s vs the per-occurrence map-only
      // form, which remains the right shape only when the output
      // itself is per-document token ids. Training memoized with q130.
      val merges = memo(bpeMerges, dir)(bpeTrain(Tables(s, dir).documents, 6))
      val sy = bpe_apply(col("w"),
        typedlit(merges.map(_._1)), typedlit(merges.map(_._2)))
      Tables(s, dir).documents
        .select(col("source"), explode(toks(col("text"))).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("n"))
        .select(col("source"), col("n"),
          length(col("w")).cast("long").as("nc"), size(sy).cast("long").as("nt"))
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_words"), sum(col("nc") * col("n")).as("n_chars"),
          sum(col("nt") * col("n")).as("n_bpe_tokens"),
          round(sum(col("nc") * col("n")).cast("double") / sum(col("nt") * col("n")), 6)
            .as("compression"))
        .orderBy(col("source"))
    },

    "q132_dsir_select" -> { (s, dir) =>
      // DATA SELECTION via importance resampling (DSIR, Xie et al.
      // NeurIPS 2023): score every raw document by how target-like its
      // hashed-unigram feature distribution is — per-doc avg
      // log-likelihood ratio between the target-domain and raw-corpus
      // unigram models over 256 hash buckets — and keep the top-k.
      // (The paper samples with Gumbel noise; the deterministic top-k
      // variant is the reproducible form, and rank-by-llr is the same
      // ordering the noise perturbs.) Scale shape: the two feature
      // distributions are estimated in ONE token scan whose shuffle
      // carries <= 256 cells (dsirLlr above, memoized); the llr table
      // rides into the plan as a 2 KB literal (q110's dictionary
      // pattern), so SCORING is map-only per-row — tokenize, hash,
      // look up, sum — and selection is TakeOrdered top-k. The corpus
      // is read twice total and never joins or re-shuffles.
      dsirScore(Tables(s, dir).documents, dsirLlrCached(s, dir))
        .orderBy(col("llr_avg").desc, col("doc_id")).limit(100)
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
      graft.operators.Quantile.ranked(lat, Seq("m"), "v", "user_id")
        .agg(
          coalesce(max(when(col("m") === "c", col("n"))), lit(0L))
            .as("n_click_conv"),
          max(when(col("m") === "c" &&
            col("rn") === expr("(n + 1) DIV 2"), col("v")))
            .as("click_p50_us"),
          max(when(col("m") === "c" &&
            col("rn") === expr("(9 * n + 9) DIV 10"), col("v")))
            .as("click_p90_us"),
          coalesce(max(when(col("m") === "p", col("n"))), lit(0L))
            .as("n_purchase_conv"),
          max(when(col("m") === "p" &&
            col("rn") === expr("(n + 1) DIV 2"), col("v")))
            .as("purchase_p50_us"),
          max(when(col("m") === "p" &&
            col("rn") === expr("(9 * n + 9) DIV 10"), col("v")))
            .as("purchase_p90_us"))
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

    "q155_pca_project" -> { (s, dir) =>
      // Top principal component of the embedding corpus by FIXED-POINT
      // power iteration, then a per-vector projection — the
      // whitening/PCA step ahead of semantic dedup and clustering
      // (SemDeDup preprocesses embeddings exactly this way). All
      // arithmetic is integer: vectors quantize to 1e-4 longs (q114's
      // posture), the mean is a floor-rounded integer vector, the
      // covariance numerator is an EXACT integer Gramian over centered
      // vectors, and each of the 12 power steps renormalizes by
      // symmetric-truncating division of the max-abs component back to
      // 1e6 scale — so the eigensolve is bit-reproducible at any
      // partitioning and the oracle replays the identical trajectory in
      // unrolled CTEs (q146's contract). Scale shape: pass 1 = a
      // 64-cell mean aggregate; pass 2 = ONE GramianAgg whose partial
      // state is a fixed 2080-long triangle per task (MLlib's
      // computeGramianMatrix treeAggregate posture — the shuffle moves
      // O(tasks*d²) longs, never the O(rows*d²) exploded cells a
      // posexplode-pair aggregation would); the A·v steps run on the
      // driver over the 64x64 matrix in BigInt (|Σ C·v| clears 2^63 at
      // big SFs); pass 3 projects map-only with the mean and component
      // as plan literals. At 100 TB you'd cache the quantized
      // projection across passes 1-2.
      val d = 64
      val q = Tables(s, dir).embeddings
        .select(col("vec_id"), transform(col("embedding"),
          x => floor(x.cast("double") * 10000d + 0.5).cast("long")).as("qv"))
      val (m, v) = memo(pcaComponent, dir) {
        val mean = q.select(posexplode(col("qv")).as(Seq("pos", "x")))
          .groupBy(col("pos")).agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
          .collect().sortBy(_.getInt(0))
        val n = mean.head.getLong(2)
        val mm = mean.map(r => math.floor(r.getLong(1).toDouble / n + 0.5).toLong)
        val cent = zip_with(col("qv"), lit(mm), (a, b) => a - b)
        val tri = q.select(gramian(cent, d).as("g")).head.getSeq[Long](0)
        val a = Array.ofDim[Long](d, d)
        var off = 0
        for (i <- 0 until d; j <- i until d) {
          a(i)(j) = tri(off); a(j)(i) = tri(off); off += 1
        }
        var vv = Array.fill(d)(1000000L)
        for (_ <- 0 until 12) {
          val u = Array.tabulate(d) { i =>
            var acc = BigInt(0)
            var j = 0
            while (j < d) { acc += BigInt(a(i)(j)) * vv(j); j += 1 }
            acc
          }
          val mx = u.map(_.abs).max.max(BigInt(1))
          vv = u.map(x => (BigInt(x.signum) * ((x.abs * 1000000) / mx)).toLong)
        }
        (mm, vv)
      }
      q.select(col("vec_id"),
          aggregate(zip_with(zip_with(col("qv"), lit(m), (a, b) => a - b),
            lit(v), (c, w) => c * w), lit(0L), (acc, x) => acc + x).as("pc1"))
        .orderBy(col("vec_id"))
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

    "q158_ann_recall_audit" -> { (s, dir) =>
      // Recall@5 of the IVF index (q57) against the exact brute-force
      // top-5 (q36), per query — the EVAL harness every production ANN
      // deployment runs before trusting an index: approximate results
      // are only as good as their measured recall, and nprobe/K tuning
      // is exactly this number against cost. Composes the two existing
      // operators verbatim (same codebook, same tie-breaks) and joins
      // their (qid, neighbor) sets: hits = semi-join count, recall =
      // hits/k, zero-hit queries kept via the left join. Scale shape:
      // both sides are top-k-bounded (|queries| x 5 rows), so the audit
      // adds one tiny join + rollup on top of whatever the audited
      // index costs — at 100 TB you'd run it over a sampled query set,
      // which is what the vec_id < 10 query side already is.
      val exact = queries("q36_ann_topk")(s, dir).select(col("qid"), col("vec_id"))
      val approx = queries("q57_ann_ivf")(s, dir).select(col("qid"), col("vec_id"))
      val hits = exact.join(approx, Seq("qid", "vec_id"), "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
      exact.groupBy(col("qid")).agg(count(lit(1)).as("k"))
        .join(hits, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
          round(coalesce(col("hits"), lit(0L)).cast("double") / col("k"), 6)
            .as("recall"))
        .orderBy(col("qid"))
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

    "q137_coarse_to_fine" -> { (s, dir) =>
      // COARSE-TO-FINE ANN: q134's JL projection composed with q57's
      // IVF routing — the standard staged retrieval shape (route in
      // the cheap 16-d space, verify exactly in the original 64-d
      // space on candidates only). Cell assignment runs on the
      // PROJECTED integer vectors (exact ±integer dot products: the
      // 16-d Rademacher dots are integer-valued doubles, so the argmax
      // is deterministic on both engines — stronger than raw-float
      // cells), cutting per-vector routing cost 4x; the exact cosine
      // only ever touches ~nprobe/K of the corpus. Plan: one cell
      // shuffle of (projected) vectors + broadcast query probes —
      // q57's shape with the routing arithmetic on quarter-width
      // vectors. The spec measures recall@5 against exact brute force.
      val base = Tables(s, dir).embeddings
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("emb"),
          jl_project(transform(col("embedding"),
            x => floor(x.cast("double") * 10000d + 0.5).cast("long")),
            typedlit(jlSigns.toSeq), 16).as("pj"))
        .select(col("vec_id"), col("emb"),
          transform(col("pj"), _.cast("double")).as("p16"))
        .withColumn("ss", dot_product(col("emb"), col("emb")))
      val data = base.withColumn("cell", ivf_cell(col("p16"), 16))
      val q = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("emb").as("qe"), col("ss").as("qss"),
          explode(ivf_probes(col("p16"), 16, 4)).as("cell"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      data.join(broadcast(q), "cell")
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", round(dot_product(col("qe"), col("emb")) /
          (sqrt(col("qss")) * sqrt(col("ss"))), 6))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("vec_id"), col("cos"))
        .orderBy(col("qid"), col("rnk"))
    },

    "q134_jl_project" -> { (s, dir) =>
      // RANDOM-PROJECTION dimensionality reduction (Johnson-
      // Lindenstrauss via Achlioptas 2003's +-1 signs): 64-d
      // embeddings down to 16-d, the standard cost-cutter in front of
      // ANN / clustering / dedup (4x less memory and dot-product work
      // for q41/q57/q93-shaped consumers, angles preserved to
      // ~1/sqrt(16) — the spec measures the actual distortion).
      // Everything is exact integer arithmetic: vectors quantize to
      // 1e-4 longs (q114's fixed point), the sign matrix is
      // md5-derived (deterministic, reproducible by the oracle), and
      // each output component is an integer dot product — bit-stable
      // at any partitioning. Plan: MAP-ONLY, zero shuffles, the 16x64
      // sign matrix rides as a 1 KB plan literal; at 100 TB this is
      // one codegen'd projection pass, and the 16 output columns are
      // the gated contract (every vector, every component, exact).
      val qv = transform(col("embedding"),
        x => floor(x.cast("double") * 10000d + 0.5).cast("long"))
      // orderBy FIRST (the q116 rule: the kernel projection must stay
      // above the range exchange or the sort-sampling pass evaluates
      // it twice), then a two-step select: the kernel call is
      // referenced 16 times below, and CollapseProject leaves a
      // multiply-referenced non-trivial expression in its own
      // projection — ONE kernel run per row
      Tables(s, dir).embeddings.orderBy(col("vec_id"))
        .select(col("vec_id"), jl_project(qv, typedlit(jlSigns.toSeq), 16).as("proj"))
        .select(col("vec_id") +: (0 until 16).map(j =>
          element_at(col("proj"), j + 1).as(s"p$j")): _*)
    },

    "q136_stupid_backoff" -> { (s, dir) =>
      // Held-out LM scoring with STUPID BACKOFF (Brants et al. 2007 —
      // the smoothing designed explicitly for MapReduce-scale LMs:
      // no discounting state, just raw counts and a fixed 0.4 backoff
      // factor). Counts come from the TRAIN split (q83's deterministic
      // hash split) and score the held-out docs: p(c|a,b) = c_abc/c_ab
      // if seen, else 0.4*c_bc/c_c, else 0.16*(c_c+1)/(N+1) — unlike
      // the self-scored q98/q99, the backoff branches genuinely fire
      // here (unseen eval trigrams), and the per-branch counts are
      // part of the gated output. All counts ride conditional window
      // sums over ONE trigram stream (train flags aggregated, eval
      // rows filtered after): the c / (b,c) / (a,b,c) windows all
      // contain c, so hash(c) serves the three back-to-back with NO
      // re-exchange (ClusteredDistribution of a superset key is
      // satisfied by the subset hash); only (a,b) re-shuffles. Two
      // exchanges of the trigram stream + the doc rollup, documents
      // never shuffle. N = train trigram positions, a memoized scalar.
      val t = toks(col("text"))
      val bucket = md5_lower64(concat(lit("split:"),
        col("doc_id").cast("string")).cast("binary")).bitwiseAND(lit(1023L))
      val n: Long = memo(triCount, dir)(
        Tables(s, dir).documents.filter(bucket < 819)
          .agg(coalesce(sum(greatest(size(t) - 2, lit(0)).cast("long")), lit(0L)))
          .head.getLong(0))
      val trainSum = sum(when(col("tr"), 1L).otherwise(0L))
      val scored = Tables(s, dir).documents
        .select(col("doc_id"), (bucket < 819).as("tr"), t.as("t"))
        .select(col("doc_id"), col("tr"), explode(arrays_zip(
          slice(col("t"), lit(1), greatest(size(col("t")) - 2, lit(0))),
          slice(col("t"), lit(2), greatest(size(col("t")) - 2, lit(0))),
          slice(col("t"), lit(3), greatest(size(col("t")) - 2, lit(0))))).as("g"))
        .select(col("doc_id"), col("tr"), col("g.0").as("a"),
          col("g.1").as("b"), col("g.2").as("c"))
        .withColumn("c_c", trainSum.over(Window.partitionBy(col("c"))))
        .withColumn("c_bc", trainSum.over(Window.partitionBy(col("b"), col("c"))))
        .withColumn("c_abc",
          trainSum.over(Window.partitionBy(col("a"), col("b"), col("c"))))
        .withColumn("c_ab", trainSum.over(Window.partitionBy(col("a"), col("b"))))
        .filter(!col("tr"))
        .withColumn("p",
          when(col("c_abc") > 0, col("c_abc").cast("double") / col("c_ab"))
            .when(col("c_bc") > 0, lit(0.4) * col("c_bc") / col("c_c"))
            .otherwise(lit(0.16) * (col("c_c") + 1) / lit(n + 1.0)))
      scored.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_pos"),
          sum(when(col("c_abc") > 0, 1L).otherwise(0L)).as("n_tri"),
          sum(when(col("c_abc") === 0 && col("c_bc") > 0, 1L).otherwise(0L)).as("n_bi"),
          sum(when(col("c_abc") === 0 && col("c_bc") === 0, 1L).otherwise(0L)).as("n_uni"),
          round(avg(-log2(col("p"))), 6).as("avg_backoff_bits"))
        .orderBy(col("doc_id"))
    },

    "q135_pmi_collocations" -> { (s, dir) =>
      // COLLOCATION extraction by pointwise mutual information over
      // adjacent bigrams (Church & Hanks 1990) — the corpus-statistics
      // pass behind tokenizer audits and phrase mining. Every count
      // comes from ONE bigram-type table: occurrences collapse in the
      // map-side combine (the q131 rollup — the shuffle carries pair
      // TYPES, not the token stream), the a- and b-marginals are two
      // window sums over that small table, and the bigram total rides
      // in as a broadcast 1-row frame (q124's pattern — no global
      // single-partition window). PMI = ln(cnt*N / (ca*cb)) on exact
      // integer counts, rounded to 6dp like every FP compare; min
      // count 5 prunes the long tail before the windows; output =
      // top-20 by (pmi, a, b) via TakeOrdered.
      val prs = Tables(s, dir).documents
        .select(explode(zip_with(
          slice(toks(col("text")), lit(1), greatest(size(toks(col("text"))) - 1, lit(0))),
          slice(toks(col("text")), lit(2), greatest(size(toks(col("text"))) - 1, lit(0))),
          (x, y) => struct(x.as("a"), y.as("b")))).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
      val total = prs.agg(sum(col("cnt")).as("n"))
      prs
        .withColumn("ca", sum(col("cnt")).over(Window.partitionBy(col("a"))))
        .withColumn("cb", sum(col("cnt")).over(Window.partitionBy(col("b"))))
        .crossJoin(broadcast(total))
        .filter(col("cnt") >= 5)
        .select(col("a"), col("b"), col("cnt"),
          round(log(col("cnt") * col("n") / (col("ca") * col("cb"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("a"), col("b")).limit(20)
    },

    "q133_train_classifier" -> { (s, dir) =>
      // TRAIN the quality classifier q116 only applies: a linear model
      // over 64 hashed bag-of-words buckets, learned by the batch
      // perceptron against weak labels (target source vs rest — the
      // fasttext good-corpus/raw-corpus recipe). Five rounds as a
      // driver control loop; all-integer arithmetic makes every round
      // an exact commutative sum, so the learned trajectory is
      // bit-identical at any partitioning and the oracle replays it as
      // five unrolled join-agg CTEs. Output = the training curve:
      // per-round misclassification count (under the PRE-update
      // weights; round 1 is all docs, margin 0) and the post-update
      // weight l1 norm. See perceptronTrain for the per-round plan
      // shape (map-only scoring, 65-cell driver traffic).
      import s.implicits._
      val curve = memo(perceptronRuns, dir)(
        perceptronTrain(Tables(s, dir).documents, 5))
      curve.zipWithIndex.map { case ((m, l1), i) => (i + 1L, m, l1) }
        .toDF("round", "n_mis", "w_l1").orderBy(col("round"))
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

    "q129_source_minhash" -> { (s, dir) =>
      // Source-pair similarity MATRIX via 64-permutation MinHash
      // (Broder's resemblance sketch) — the sketch analogue of q102's
      // exact duplicate matrix: per source the state is 64 longs,
      // mergeable by element-wise min (the partial agg IS the sketch
      // union, so it streams and federates like q121's registers).
      // Permutations are the universal-hash family (a_p*h + b_p) mod
      // (2^31-1) over ONE md5 per shingle with plan-side constants —
      // see [[minhashSig]] for why the cheaper additive double-hash
      // form is NOT usable here. Estimate = matching components / 64;
      // the exact
      // per-pair Jaccard rides along as the audit (feasible at sf; at
      // 100 TB only the 64-long signatures meet, never shingle sets).
      // Plan: shingle-occurrence explode -> (source, p) min partial
      // agg (map-side combined to 64 rows/source/partition) -> 20x64
      // signature table -> tiny pairwise join. Min is duplicate-blind,
      // so no distinct pass is needed on the sketch side.
      val matches = minhashMatches(Tables(s, dir).documents)
      // exact audit over distinct (source, shingle) sets
      val sets = Tables(s, dir).documents
        .select(col("source"), explode(shingles(toks(col("text")), 3)).as("g"))
        .distinct()
      val sizes = sets.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val inter = sets.as("x").join(sets.as("y"),
          col("x.g") === col("y.g") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
        .agg(count(lit(1)).as("inter"))
      matches
        .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("na"))), "source_a")
        .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("nb"))), "source_b")
        .join(inter, Seq("source_a", "source_b"), "left")
        .select(col("source_a"), col("source_b"), col("matches"),
          round(col("matches").cast("double") / 64.0, 6).as("est_jaccard"),
          round(coalesce(col("inter"), lit(0L)).cast("double") /
            (col("na") + col("nb") - coalesce(col("inter"), lit(0L))), 6).as("exact_jaccard"))
        .orderBy(col("source_a"), col("source_b"))
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

    "q124_quantile_sketch" -> { (s, dir) =>
      // Quantile estimation from a fixed 256-bucket histogram — the
      // mergeable single-pass sketch that replaces per-group sorts for
      // percentiles at scale (the production stand-in for q18's exact
      // path; same family as approx_percentile's t-digest but with a
      // deterministic, oracle-replicable estimator). Plan: one global
      // (min, max) scalar agg broadcast back as bucket bounds, one
      // partially-aggregated (event_type, bucket) shuffle — at most 256
      // cells per group whatever the event volume — then the p-th
      // bucket via a cumulative window over those cells. Estimates are
      // bucket LOWER EDGES (conservative; error <= bucket width); the
      // exact interpolated percentile rides along as the audit. Bucket
      // assignment is one identical FP expression in both engines, so
      // edge rounding agrees bit-for-bit.
      val e = Tables(s, dir).events.select(col("event_type"), col("value"))
      val b = e.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      val hist = e.crossJoin(broadcast(b))
        // vmax==vmin guard: a single-valued distribution maps to
        // bucket 0 in both engines (unguarded, the divide is NaN and
        // Spark's least() vs DuckDB's CASE diverge)
        .withColumn("bucket", when(col("vmax") === col("vmin"), lit(0))
          .otherwise(least(lit(255),
            floor((col("value") - col("vmin")) / (col("vmax") - col("vmin")) * 256)
              .cast("int"))))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      val wn = Window.partitionBy(col("event_type"))
      def bkt(p: Double, name: String): Column =
        min(when(col("cum") >= ceil(lit(p) * col("n")), col("bucket"))).as(name)
      val sel = hist
        .withColumn("cum", sum(col("cnt")).over(wc))
        .withColumn("n", sum(col("cnt")).over(wn))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"), bkt(0.5, "b50"), bkt(0.9, "b90"), bkt(0.99, "b99"))
      val exact = e.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 6).as("exact_p50"),
          round(expr("percentile(value, 0.9)"), 6).as("exact_p90"),
          round(expr("percentile(value, 0.99)"), 6).as("exact_p99"))
      def est(bc: String, name: String): Column =
        round(col("vmin") + col(bc) * (col("vmax") - col("vmin")) / 256, 6).as(name)
      sel.join(exact, Seq("event_type")).crossJoin(broadcast(b))
        .select(col("event_type"), col("n"),
          est("b50", "est_p50"), col("exact_p50"),
          est("b90", "est_p90"), col("exact_p90"),
          est("b99", "est_p99"), col("exact_p99"))
        .orderBy(col("event_type"))
    },

    "q123_multimodal_frames" -> { (s, dir) =>
      // Frame sampling over opaque media payloads — the video/audio
      // plumbing q40 starts: treat the binary payload as fixed 64-byte
      // frames, SAMPLE every second frame (stride 128 bytes — the
      // decimation a real pipeline does before expensive per-frame
      // decode), and emit per sampled frame the offset, actual length
      // (tail frames run short) and the 16-bin byte-histogram feature
      // vector. Per-row explode over byte offsets, zero shuffles,
      // output-bound fan-out. The same plan shape with the decode made
      // REAL is q205_audio_pcm_windows: MediaKernel's RIFF walk reads
      // the actual 16-bit PCM samples per window. Payload slicing here
      // is byte-addressed (substring on BinaryType).
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          octet_length(col("text")).cast("long").as("n_bytes"))
        .filter(col("n_bytes") > 0)
        .select(col("doc_id"), col("payload"),
          posexplode(transform(
            sequence(lit(0), floor((col("n_bytes") - 1) / lit(128)).cast("int")),
            k => k * 128)).as(Seq("frame_id", "off")))
        .select(col("doc_id"), col("frame_id").cast("long").as("frame_id"),
          col("off").cast("long").as("off"),
          expr("substring(payload, off + 1, 64)").as("frame"))
        .select(col("doc_id"), col("frame_id"), col("off"),
          octet_length(col("frame")).cast("long").as("frame_bytes"),
          array_join(transform(byte_histogram_counts(col("frame")),
            _.cast("string")), ",").as("features"))
    },

    "q120_hybrid_rrf" -> { (s, dir) =>
      // Hybrid retrieval, the standard two-arm RAG/search stack:
      // a LEXICAL arm (exact 3-gram Jaccard over a shared-gram
      // candidate join — integer set sizes, no score drift) and a
      // SEMANTIC arm (q57's IVF-probed cosine), fused by reciprocal
      // rank fusion rrf = sum 1/(60+rank) — rank-based, so the two
      // arms' incomparable score scales never mix. The fixture pairs
      // documents and embeddings by id (doc_id == vec_id), the usual
      // layout where embeddings are a derived column of the corpus.
      // Plan shape: lexical candidates via ONE gram shuffle join
      // against the broadcast 10-query gram set (never all-pairs);
      // semantic candidates via the cell join (corpus shuffles once on
      // cell); fusion is a full-outer join of two top-20 lists — rows
      // per query bounded by 40 whatever the corpus size.
      val d = shingled(Tables(s, dir))
      val qd = d.filter(col("doc_id") < 10)
        .select(col("doc_id").as("qid"), col("sh").as("qsh"))
      val cand = d.select(col("doc_id"), explode(col("sh")).as("g"))
        .join(broadcast(qd.select(col("qid"), explode(col("qsh")).as("g"))), Seq("g"))
        .filter(col("doc_id") =!= col("qid"))
        .select("qid", "doc_id").distinct()
      val wl = Window.partitionBy(col("qid")).orderBy(col("jacc").desc, col("doc_id"))
      val lex = cand.join(d, Seq("doc_id")).join(broadcast(qd), Seq("qid"))
        .withColumn("jacc", size(array_intersect(col("sh"), col("qsh"))).cast("double") /
          size(array_union(col("sh"), col("qsh"))))
        .withColumn("lex_rnk", row_number().over(wl).cast("long"))
        .filter(col("lex_rnk") <= 20)
        .select(col("qid"), col("doc_id").as("id"), col("lex_rnk"))
      val K = 16
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
        .withColumn("ss", dot_product(col("emb"), col("emb")))
        .withColumn("cell", ivf_cell(col("emb"), K))
      val qe = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("emb").as("qe"), col("ss").as("qss"),
          explode(ivf_probes(col("emb"), K, 4)).as("cell"))
      val ws = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      val sem = e.join(broadcast(qe), Seq("cell"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", round(dot_product(col("qe"), col("emb")) /
          (sqrt(col("qss")) * sqrt(col("ss"))), 6))
        .withColumn("sem_rnk", row_number().over(ws).cast("long"))
        .filter(col("sem_rnk") <= 20)
        .select(col("qid"), col("vec_id").as("id"), col("sem_rnk"))
      val wf = Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("id"))
      lex.join(sem, Seq("qid", "id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (col("lex_rnk") + 60), lit(0.0)) +
            coalesce(lit(1.0) / (col("sem_rnk") + 60), lit(0.0)), 6))
        .withColumn("rnk", row_number().over(wf).cast("long"))
        .filter(col("rnk") <= 10)
        .select(col("qid"), col("rnk"), col("id"),
          coalesce(col("lex_rnk"), lit(0L)).as("lex_rnk"),
          coalesce(col("sem_rnk"), lit(0L)).as("sem_rnk"), col("rrf"))
        .orderBy(col("qid"), col("rnk"))
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

    "q117_block_dedup" -> { (s, dir) =>
      // The REWRITE stage of exact dedup (Dolma/C4 paragraph dedup):
      // q94 reports shared spans, this one removes them and emits the
      // cleaned corpus. Docs segment into fixed 16-token blocks (the
      // fixture has no paragraph breaks; on real data the segmenter
      // splits on blank lines first) and a block survives only at its
      // FIRST corpus occurrence — global keep-first by (doc_id, idx)
      // via one row_number window over the block key. Reassembly is the
      // per-doc rollup: surviving blocks re-join in index order. Two
      // shuffles total at any scale (block key, then doc_id), never a
      // pair join; the window state per block key is one counter. At
      // 100 TB the block column would hash to a 16-byte digest before
      // the shuffle to cut exchange volume — semantics identical.
      val d = docBlocks(Tables(s, dir).documents)
      val w = Window.partitionBy(col("blk")).orderBy(col("doc_id"), col("idx"))
      d.withColumn("rn", row_number().over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dropped"),
          array_join(transform(array_sort(collect_list(
            when(col("rn") === 1, struct(col("idx"), col("blk"))))),
            _.getField("blk")), " ").as("clean_text"))
        .orderBy(col("doc_id"))
    })

  private val tokSql = """string_split_regex(trim(text), '\s+')"""

  /** q139/q142's shared funnel CTE block (mirrors funnelTimes). */
  private val funnelCteSql =
    """WITH e AS (SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
          s1 AS (SELECT user_id, event_type, tus,
                  min(CASE WHEN event_type = 'view' THEN tus END)
                    OVER (PARTITION BY user_id) AS t1 FROM e),
          s2 AS (SELECT user_id, event_type, tus, t1,
                  min(CASE WHEN event_type = 'click' AND tus > t1 THEN tus END)
                    OVER (PARTITION BY user_id) AS t2 FROM s1),
          s3 AS (SELECT user_id, t1, t2,
                  min(CASE WHEN event_type = 'purchase' AND tus > t2 THEN tus END)
                    OVER (PARTITION BY user_id) AS t3 FROM s2),
          u AS (SELECT user_id, any_value(t1) AS t1, any_value(t2) AS t2,
                  any_value(t3) AS t3 FROM s3 GROUP BY user_id)"""

  /** q130's oracle, generated for T rounds: w0/c0 seed the word-type
    * table with code-point symbol lists; each round r contributes
    * p_r/m_r (weighted adjacent-pair count + argmax) and c_r (the
    * list_reduce greedy-merge apply of m_r). */
  private def bpeCtes(rounds: Int, finalApply: Boolean): String = {
    def pairCte(r: Int) =
      s"""p$r AS (SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS cnt
            FROM (SELECT freq, unnest(list_transform(range(1, len(s)), i ->
              struct_pack(a := s[CAST(i AS INT)], b := s[CAST(i AS INT) + 1]))) AS pr
              FROM c${r - 1} WHERE len(s) >= 2)
            GROUP BY 1, 2),
          m$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1)"""
    def applyCte(r: Int) =
      s"""c$r AS (SELECT w, freq, string_split(list_reduce(s, (acc, x) ->
            CASE WHEN x = m.b AND (acc = m.a OR ends_with(acc, ' ' || m.a))
                 THEN substr(acc, 1, length(acc) - length(m.a)) || m.a || m.b
                 ELSE acc || ' ' || x END), ' ') AS s
          FROM c${r - 1}, m$r m)"""
    val ctes = Seq(
      s"""w0 AS (SELECT w, count(*) AS freq
            FROM (SELECT unnest($tokSql) AS w FROM documents) GROUP BY w),
          c0 AS (SELECT w, freq, list_transform(range(1, length(w) + 1), i ->
            substr(w, CAST(i AS INT), 1)) AS s FROM w0)""") ++
      (1 to rounds).flatMap(r =>
        Seq(pairCte(r)) ++
          (if (r < rounds || finalApply) Seq(applyCte(r)) else Nil))
    "WITH " + ctes.mkString(",\n ")
  }

  private def bpeOracleSql(rounds: Int): String = {
    val union = (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS rank, a AS lhs, b AS rhs, cnt FROM m$r")
      .mkString(" UNION ALL ")
    bpeCtes(rounds, finalApply = false) +
      s" SELECT * FROM ($union) ORDER BY rank"
  }

  /** q133's oracle, generated for T rounds: integer batch-perceptron
    * training unrolled — per round, margins under w_{r-1} (mg_r),
    * misclassified set (mi_r), gradient (g_r), updated weights (w_r),
    * and the curve row (round, n_mis, w_l1). Everything BIGINT-cast:
    * DuckDB widens sum() to HUGEINT (the q114 lesson). */
  private def perceptronOracleSql(rounds: Int): String = {
    def roundCtes(r: Int) =
      s"""mg$r AS (SELECT x.doc_id, x.y, sum(w.wv * x.c) AS m
            FROM x JOIN w${r - 1} w ON w.b = x.b GROUP BY 1, 2),
          mi$r AS (SELECT doc_id FROM mg$r WHERE y * m <= 0),
          g$r AS (SELECT x.b, sum(x.y * x.c) AS g FROM x
            JOIN mi$r mi ON x.doc_id = mi.doc_id GROUP BY x.b),
          w$r AS (SELECT w.b, w.wv + coalesce(g.g, 0) AS wv
            FROM w${r - 1} w LEFT JOIN g$r g ON g.b = w.b),
          o$r AS (SELECT CAST($r AS BIGINT) AS round,
            CAST((SELECT count(*) FROM mi$r) AS BIGINT) AS n_mis,
            CAST((SELECT sum(abs(wv)) FROM w$r) AS BIGINT) AS w_l1)"""
    val union = (1 to rounds).map(r => s"SELECT * FROM o$r").mkString(" UNION ALL ")
    s"""WITH tk AS (SELECT doc_id,
            CASE WHEN source = (SELECT min(source) FROM documents)
                 THEN 1 ELSE -1 END AS y,
            CAST(md5_number_lower('qc133:' || tok) & 63 AS BIGINT) AS b
          FROM (SELECT doc_id, source, unnest($tokSql) AS tok
                FROM documents WHERE $hasTokensSql)),
        x AS (SELECT doc_id, y, b, count(*) AS c FROM tk GROUP BY 1, 2, 3),
        w0 AS (SELECT sp.range AS b, CAST(0 AS BIGINT) AS wv FROM range(0, 64) sp),
        ${(1 to rounds).map(roundCtes).mkString(",\n ")}
        SELECT * FROM ($union) ORDER BY round"""
  }

  /** q131's oracle: the same trained rounds, final apply included, then
    * per-source occurrence stats from joining tokens to their word
    * type's final segmentation. */
  private def bpeTokenizeOracleSql(rounds: Int): String =
    bpeCtes(rounds, finalApply = true) + s""",
       o AS (SELECT source, unnest($tokSql) AS w FROM documents)
       SELECT o.source,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(length(o.w)) AS BIGINT) AS n_chars,
         CAST(sum(len(c.s)) AS BIGINT) AS n_bpe_tokens,
         round(sum(length(o.w)) * 1.0 / sum(len(c.s)), 6) AS compression
       FROM o JOIN c$rounds c ON o.w = c.w
       GROUP BY o.source ORDER BY o.source"""
  private val shSql =
    """list_distinct([lst[i] || ' ' || lst[i+1] || ' ' || lst[i+2] for i in range(1, len(lst) - 1)])"""

  /** The q92 quality-rule CTE block (ends in `fk`: per-doc metrics,
    * per-rule flags, and `keep`), shared verbatim by the q97 composed
    * pipeline's oracle so both gates make the identical decision. */
  private val qualityCteSql =
    s"""t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          b2 AS (SELECT doc_id, unnest([lst[i] || ' ' || lst[i+1]
                   for i in range(1, len(lst))]) AS g FROM t),
          c2 AS (SELECT doc_id, g, count(*) AS c FROM b2 GROUP BY 1, 2),
          a2 AS (SELECT doc_id, max(c) AS best2 FROM c2 GROUP BY 1),
          m AS (SELECT doc_id, len(lst) AS n, lst, coalesce(best2, 0) AS best2,
                  len(list_filter(lst, x -> list_contains(['the','and','of','to','in','is','a'], x))) AS c_en,
                  len(list_filter(lst, x -> list_contains(['der','die','und','ist','das','ein'], x))) AS c_de,
                  len(list_filter(lst, x -> list_contains(['el','la','de','que','y','los'], x))) AS c_es,
                  len(list_filter(lst, x -> list_contains(['le','la','et','les','des','un'], x))) AS c_fr,
                  len(list_filter(lst, x -> list_contains(['的','是','不','我','在','了'], x))) AS c_zh
                FROM t LEFT JOIN a2 USING (doc_id)),
          f AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                  CAST(c_en AS DOUBLE) / n AS stop_ratio,
                  CAST(len(array_to_string(lst, '')) AS DOUBLE) / n AS mean_word_len,
                  CASE WHEN n >= 2 THEN CAST(best2 AS DOUBLE) / (n - 1)
                       ELSE 0.0 END AS top2_frac,
                  CASE WHEN greatest(c_en, c_de, c_es, c_fr, c_zh) = 0 THEN 'und'
                       WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
                       WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
                       WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
                       WHEN c_fr >= c_zh THEN 'fr'
                       ELSE 'zh' END AS lang_guess
                FROM m),
          fk AS (SELECT doc_id, n_tokens, stop_ratio, mean_word_len, top2_frac, lang_guess,
                  n_tokens < 25 AS f_short,
                  stop_ratio < 0.04 AS f_stop,
                  (mean_word_len < 3.0 OR mean_word_len > 10.0) AS f_wordlen,
                  top2_frac >= 0.08 AS f_rep,
                  lang_guess <> 'en' AS f_lang,
                  NOT (n_tokens < 25 OR stop_ratio < 0.04 OR mean_word_len < 3.0
                       OR mean_word_len > 10.0 OR top2_frac >= 0.08
                       OR lang_guess <> 'en') AS keep
                 FROM f)"""

  /** 32-bit Morton code of two 16-bit values — delegates to the
    * kernel form (one StaticInvoke per row): the pure-Column
    * mask-and-shift spread references its input twice per step, so it
    * duplicated the normalized-key subtree 16x per dimension, and the
    * blown-up tree rode into join keys, pushed filters, and every AQE
    * re-plan (measured on q147: 5.4 s -> sub-second at sf0.1 from plan
    * processing alone). PipelineSpec checks the kernel against a naive
    * per-bit fold. */
  private[graft] def morton16(x: Column, y: Column): Column =
    graft.functions.morton16(x, y)

  /** x144's layout pair, memoized per dataset dir: lineitem written
    * twice under a scratch dir — `raw` in arrival order (hash
    * repartition, the no-layout baseline) and `zord` range-partitioned
    * and sorted by the Morton z-value, so each file (= row group at
    * this size) covers one tight z-rectangle and carries tight
    * parquet min/max stats on BOTH keys. The bench then scans each
    * with the same two-sided key-range filter: on the z layout the
    * pushed filters skip ~15/16 of row groups from footer stats alone,
    * on the raw layout they skip nothing — the MEASURED version of
    * q144's zone-map pruning claim (at 100 TB this is the difference
    * between touching 2 files and touching all of them). */
  private val zorderDirs =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private[graft] def zorderLayoutDirs(s: SparkSession, dir: String): (String, String) =
    memo(zorderDirs, dir) {
      val li = Tables(s, dir).lineitem
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).head
      val (pmin, pspan) = (b.getLong(0), math.max(1L, b.getLong(1) - b.getLong(0)))
      val (smin, sspan) = (b.getLong(2), math.max(1L, b.getLong(3) - b.getLong(2)))
      val xs = ((col("l_partkey") - lit(pmin)) * lit(65535L) / lit(pspan)).cast("long")
      val ys = ((col("l_suppkey") - lit(smin)) * lit(65535L) / lit(sspan)).cast("long")
      val base = java.nio.file.Files.createTempDirectory("x144layout").toString
      val (raw, zord) = (s"$base/raw", s"$base/zord")
      li.repartition(32).write.mode("overwrite").parquet(raw)
      li.withColumn("zval", morton16(xs, ys))
        .repartitionByRange(32, col("zval"))
        .sortWithinPartitions(col("zval"))
        .drop("zval")
        .write.mode("overwrite").parquet(zord)
      (raw, zord)
    }

  /** q144's zone-map aggregation factored over ANY (l_partkey,
    * l_suppkey) frame with pre-supplied key bounds: every zone-map
    * column (count, min/max of keys and zval) is a mergeable partial
    * agg, so the identical Columns plan runs over readStream in update
    * mode — arriving rows keep the per-shard maps current without
    * recomputing history (the layout-maintenance loop a live table
    * needs). Bounds come from the calibration corpus: at 100 TB the
    * key domain is a table property, not something re-derived per
    * micro-batch. */
  private[graft] def zoneMaps(rows: DataFrame, pmin: Long, pspan: Long,
      smin: Long, sspan: Long): DataFrame = {
    val xs = ((col("l_partkey") - lit(pmin)) * lit(65535L) / lit(pspan)).cast("long")
    val ys = ((col("l_suppkey") - lit(smin)) * lit(65535L) / lit(sspan)).cast("long")
    rows.select(col("l_partkey"), col("l_suppkey"), morton16(xs, ys).as("zval"))
      .groupBy(shiftright(col("zval"), 24).as("shard_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
        min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"),
        min(col("zval")).as("z_min"), max(col("zval")).as("z_max"))
  }

  /** One filtered scan over either x144 layout: a selective rectangle
    * on BOTH keys (the zone-map query shape). */
  private[graft] def zorderScan(s: SparkSession, dir: String, zordered: Boolean): DataFrame = {
    val (raw, zord) = zorderLayoutDirs(s, dir)
    s.read.parquet(if (zordered) zord else raw)
      .filter(col("l_partkey").between(100, 199) &&
        col("l_suppkey").between(10, 14))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
  }

  /** Shared by q86 (label propagation) and q143 (alternating star):
    * both compute components over the verified near-dup pairs with
    * min-doc_id labels, so one transitive-closure oracle gates both. */
  private val dupComponentsSql =
    s"""WITH RECURSIVE
        t AS (SELECT doc_id, $shSql AS sh
              FROM (SELECT doc_id, $tokSql AS lst FROM documents) WHERE len(lst) >= 3),
        pairs AS (SELECT a.doc_id AS s, b.doc_id AS d
                  FROM t a JOIN t b ON a.doc_id < b.doc_id
                  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9),
        und AS (SELECT s, d FROM pairs UNION ALL SELECT d, s FROM pairs),
        reach AS (SELECT s AS src, s AS dst FROM und
                  UNION
                  SELECT r.src, u.d FROM reach r JOIN und u ON u.s = r.dst)
        SELECT src AS doc_id, min(dst) AS cluster_id,
               (src = min(dst)) AS is_keeper
        FROM reach GROUP BY src ORDER BY doc_id"""

  /** q146's oracle, generated for T rounds: the same fixed-point
    * integer PageRank unrolled — per round, each node's new score from
    * its neighbors' per-term floor-divided contributions. DuckDB's sum
    * widens to HUGEINT mid-expression (exact); every CTE's score is
    * CAST back to BIGINT. */
  private def textrankOracleSql(rounds: Int): String = {
    def iter(r: Int) =
      s"""s$r AS (SELECT d.v AS n,
            CAST(150000 + (850000 * sum((d.w * s.sc) // g.dw)) // 1000000
                 AS BIGINT) AS sc
          FROM dir d JOIN s${r - 1} s ON s.n = d.u JOIN deg g ON g.u = d.u
          GROUP BY d.v)"""
    s"""WITH vc AS (SELECT w FROM (
              SELECT unnest($tokSql) AS w FROM documents) tok
            WHERE length(w) >= 4 GROUP BY w
            ORDER BY count(*) DESC, w LIMIT 128),
        t AS (SELECT $tokSql AS lst FROM documents),
        bgs AS (SELECT unnest([lst[i] || ' ' || lst[i+1]
                 for i in range(1, len(lst))]) AS g FROM t),
        bg AS (SELECT string_split(g, ' ')[1] AS a,
                      string_split(g, ' ')[2] AS b FROM bgs),
        fb AS (SELECT a, b FROM bg
            WHERE a <> b AND a IN (SELECT w FROM vc) AND b IN (SELECT w FROM vc)),
        ed AS (SELECT least(a, b) AS u, greatest(a, b) AS v,
                      CAST(count(*) AS BIGINT) AS w FROM fb GROUP BY 1, 2),
        dir AS (SELECT u, v, w FROM ed UNION ALL SELECT v, u, w FROM ed),
        deg AS (SELECT u, CAST(sum(w) AS BIGINT) AS dw FROM dir GROUP BY u),
        s0 AS (SELECT u AS n, CAST(1000000 AS BIGINT) AS sc FROM deg),
        ${(1 to rounds).map(iter).mkString(",\n ")}
        SELECT CAST(row_number() OVER (ORDER BY sc DESC, n) AS BIGINT) AS rank,
               n AS word, sc AS score
        FROM s$rounds ORDER BY sc DESC, n LIMIT 20"""
  }

  /** q155's oracle, generated for T power-iteration rounds: the same
    * fixed-point integer trajectory unrolled (q146's contract). Every
    * intermediate that can clear BIGINT is lifted to HUGEINT explicitly
    * (the iteration products) or by DuckDB's sum widening, and every
    * CTE/output column lands back in BIGINT — the dtype gate bans wide
    * types in OUTPUT only. The normalizing division keeps both operands
    * nonnegative (sign split) so DuckDB `//` and the engine's BigInt
    * truncating division agree on negatives. */
  private def pcaOracleSql(rounds: Int): String = {
    // MATERIALIZED everywhere a CTE is referenced more than once (or
    // sits under the iteration chain): DuckDB INLINES plain CTEs, so
    // v_r naively expanding u_r twice per round doubles the whole
    // upstream tree 2^rounds times — the un-materialized form ran out
    // of file descriptors re-opening the parquet scan thousands of
    // times before any row moved.
    def iter(r: Int) =
      s"""u$r AS MATERIALIZED (
            SELECT c.i AS i, sum(CAST(c.cv AS HUGEINT) * v.v) AS u
            FROM cov c JOIN v${r - 1} v ON v.i = c.j GROUP BY c.i),
         v$r AS MATERIALIZED (
            SELECT i, CAST(CASE WHEN u < 0
                   THEN -((-u * 1000000) // greatest(max(abs(u)) OVER (), 1))
                   ELSE (u * 1000000) // greatest(max(abs(u)) OVER (), 1)
                 END AS BIGINT) AS v
            FROM u$r)"""
    s"""WITH q AS MATERIALIZED (SELECT vec_id, list_transform(range(1, 65), i ->
             CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
           FROM embeddings),
        nn AS (SELECT count(*) AS n FROM q),
        mn AS MATERIALIZED (SELECT t.i AS i, CAST(floor(
                 CAST(sum(qv[CAST(t.i AS INT)]) AS DOUBLE) / (SELECT n FROM nn)
                 + 0.5) AS BIGINT) AS m
               FROM q CROSS JOIN range(1, 65) t(i) GROUP BY t.i),
        cent AS MATERIALIZED (SELECT vec_id, t.i AS i,
                   qv[CAST(t.i AS INT)] - mn.m AS c
                 FROM q CROSS JOIN range(1, 65) t(i) JOIN mn ON mn.i = t.i),
        cov AS MATERIALIZED (
                SELECT a.i AS i, b.i AS j, CAST(sum(a.c * b.c) AS BIGINT) AS cv
                FROM cent a JOIN cent b ON a.vec_id = b.vec_id GROUP BY a.i, b.i),
        v0 AS (SELECT i, CAST(1000000 AS BIGINT) AS v FROM range(1, 65) t(i)),
        ${(1 to rounds).map(iter).mkString(",\n ")}
        SELECT c.vec_id, CAST(sum(c.c * v.v) AS BIGINT) AS pc1
        FROM cent c JOIN v$rounds v ON v.i = c.i
        GROUP BY c.vec_id ORDER BY vec_id"""
  }

  /** q36's oracle (also the exact side of q158's recall audit). */
  private val annExactSql =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
          p AS (SELECT q.vec_id AS qid, e.vec_id,
            round(
              list_sum(list_transform(range(1, 65), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
               * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))), 6) AS cos
            FROM e q JOIN e ON q.vec_id < 10 AND e.vec_id <> q.vec_id),
          r AS (SELECT qid, vec_id, cos,
            CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk FROM p)
          SELECT qid, rnk, vec_id, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk"""

  /** q57's oracle (also the approximate side of q158's recall audit):
    * IVF over the md5-Rademacher codebook — the oracle recomputes cell
    * assignment (argmax of 16 centroid dots, lower-id tie-break), the
    * nprobe=4 probe list, and the exact in-cell cosine top-5. */
  /** q57's 16-cell Rademacher IVF assignment as a reusable CTE body
    * ending in `data(vec_id, embedding, ss, cell)` (rk-1 cell per
    * vector) with `asg` still visible for probe expansion — shared by
    * the q57 and q187 oracles. */
  private val ivfAsgCte =
    """c AS (SELECT vec_id, embedding,
             list_transform(range(0, 16), k -> list_sum(list_transform(range(1, 65), i ->
               CAST(embedding[i] AS DOUBLE) *
               (CASE WHEN (md5_number_lower('ivf_' || k::VARCHAR || '_' || (i-1)::VARCHAR) & 1) = 1
                     THEN 1.0 ELSE -1.0 END)))) AS dots,
             list_sum(list_transform(range(1, 65), i ->
               CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS ss
           FROM embeddings),
         d AS (SELECT vec_id, embedding, ss, k, dots[CAST(k AS INT) + 1] AS dot
               FROM c, range(0, 16) t(k)),
         asg AS (SELECT vec_id, embedding, ss, k AS cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, k) AS rk FROM d),
         data AS (SELECT vec_id, embedding, ss, cell FROM asg WHERE rk = 1)"""

  private val annIvfSql =
    s"""WITH $ivfAsgCte,
         probes AS (SELECT vec_id AS qid, embedding AS qe, ss AS qss, cell
                    FROM asg WHERE vec_id < 10 AND rk <= 4),
         p AS (SELECT pr.qid, e.vec_id,
                round(list_sum(list_transform(range(1, 65), i ->
                    CAST(pr.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                  / (sqrt(pr.qss) * sqrt(e.ss)), 6) AS cos
               FROM data e JOIN probes pr ON e.cell = pr.cell AND e.vec_id <> pr.qid),
         r AS (SELECT qid, vec_id, cos,
               CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk FROM p)
         SELECT qid, rnk, vec_id, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk"""

  /** q196's per-dimension stats as a reusable plan over any
    * (embedding: array) frame. Every output is built from mergeable
    * partials (count/sum/sumsq/min/max), so the identical Columns run
    * over readStream in complete mode — the live embedding-drift
    * monitor (EventStreamsSpec pins stream/batch convergence). */
  private[graft] def dimStats(embs: DataFrame): DataFrame =
    embs
      .select(posexplode(transform(col("embedding"), _.cast("double")))
        .as(Seq("dim", "v")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).as("sx"), sum(col("v") * col("v")).as("sx2"),
        round(min(col("v")), 6).as("vmin"), round(max(col("v")), 6).as("vmax"))
      .select(col("dim"), col("n"),
        round(col("sx") / col("n"), 6).as("mean"),
        round(sqrt((col("sx2") - col("sx") * col("sx") / col("n")) / col("n")), 6)
          .as("std"),
        col("vmin"), col("vmax"))

  /** q114's fixed-point Lloyd's rounds unrolled as a full SELECT
    * (vec_id, cluster, dist) — the oracle for q114 itself and, wrapped
    * as a CTE, the assignment input to the q191 outlier oracle. */
  private val kmeansAsgSql =
    """WITH q AS (SELECT vec_id, list_transform(range(1, 65), i ->
             CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
           FROM embeddings),
         c0 AS (SELECT vec_id AS cl, qv AS cv FROM q WHERE vec_id < 8),
         a0 AS (SELECT vec_id, qv, cl,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
                FROM (SELECT x.vec_id, x.qv, c.cl,
                       list_sum(list_transform(range(1, 65), i ->
                         (x.qv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]) *
                         (x.qv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))) AS dist
                      FROM q x, c0 c)),
         c1 AS (SELECT cl, list(cv ORDER BY i) AS cv FROM (
                 SELECT a.cl, i,
                   CAST(floor(sum(a.qv[CAST(i AS INT)]) * 1.0 / count(*) + 0.5) AS BIGINT) AS cv
                 FROM a0 a, range(1, 65) t(i) WHERE a.rk = 1 GROUP BY a.cl, i)
                GROUP BY cl),
         a1 AS (SELECT vec_id, qv, cl,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
                FROM (SELECT x.vec_id, x.qv, c.cl,
                       list_sum(list_transform(range(1, 65), i ->
                         (x.qv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]) *
                         (x.qv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))) AS dist
                      FROM q x, c1 c)),
         c2 AS (SELECT cl, list(cv ORDER BY i) AS cv FROM (
                 SELECT a.cl, i,
                   CAST(floor(sum(a.qv[CAST(i AS INT)]) * 1.0 / count(*) + 0.5) AS BIGINT) AS cv
                 FROM a1 a, range(1, 65) t(i) WHERE a.rk = 1 GROUP BY a.cl, i)
                GROUP BY cl),
         a2 AS (SELECT vec_id, cl, dist,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
                FROM (SELECT x.vec_id, c.cl,
                       list_sum(list_transform(range(1, 65), i ->
                         (x.qv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]) *
                         (x.qv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))) AS dist
                      FROM q x, c2 c))
         SELECT vec_id, cl AS cluster, CAST(dist AS BIGINT) AS dist
         FROM a2 WHERE rk = 1 ORDER BY vec_id"""

  /** q132's scoring stages as a reusable CTE body ending in
    * `sc(doc_id, y, score)` — per-doc rounded DSIR llr average plus the
    * target-source label — shared by the q185/q186 model-eval oracles
    * (same tk/cn/tot/llr stages as the q132 oracle). */
  private val dsirScoredCte =
    s"""tk AS (SELECT doc_id, source,
              CAST(md5_number_lower('dsir:' || tok) & 255 AS BIGINT) AS b
            FROM (SELECT doc_id, source, unnest($tokSql) AS tok
                  FROM documents WHERE $hasTokensSql)),
          cn AS (SELECT b, count(*) AS cr,
              sum(CASE WHEN source = (SELECT min(source) FROM documents)
                  THEN 1 ELSE 0 END) AS ct
            FROM tk GROUP BY b),
          tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM cn),
          llr AS (SELECT sp.range AS b,
              ln((coalesce(cn.ct, 0) + 1.0) / ((SELECT nt FROM tot) + 256.0))
            - ln((coalesce(cn.cr, 0) + 1.0) / ((SELECT nr FROM tot) + 256.0)) AS v
            FROM range(0, 256) sp LEFT JOIN cn ON cn.b = sp.range),
          sc AS (SELECT tk.doc_id,
              tk.source = (SELECT min(source) FROM documents) AS y,
              round(sum(llr.v) / count(*), 6) AS score
            FROM tk JOIN llr ON tk.b = llr.b GROUP BY tk.doc_id, tk.source)"""

  def oracle: Map[String, String] = Map(
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
    "q187_knn_graph_stats" ->
      s"""WITH kk AS (SELECT greatest(16, CAST(count(*) // 125 AS INT)) AS nk
                      FROM embeddings),
          c AS (SELECT vec_id, embedding,
             list_transform(range(0, nk), k -> list_sum(list_transform(range(1, 65), i ->
               CAST(embedding[i] AS DOUBLE) *
               (CASE WHEN (md5_number_lower('ivf_' || k::VARCHAR || '_' || (i-1)::VARCHAR) & 1) = 1
                     THEN 1.0 ELSE -1.0 END)))) AS dots,
             list_sum(list_transform(range(1, 65), i ->
               CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS ss
           FROM embeddings, kk),
          d AS (SELECT vec_id, embedding, ss, k, dots[CAST(k AS INT) + 1] AS dot
                FROM (SELECT vec_id, embedding, ss, dots, unnest(range(0, nk)) AS k
                      FROM c, kk)),
          asg AS (SELECT vec_id, embedding, ss, k AS cell,
                  row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, k) AS rk FROM d),
          data AS (SELECT vec_id, embedding, ss, cell FROM asg WHERE rk = 1),
          knn AS (SELECT vec_id, nb FROM (
              SELECT a.vec_id, b.vec_id AS nb,
                row_number() OVER (PARTITION BY a.vec_id ORDER BY
                  round(list_sum(list_transform(range(1, 65), i ->
                      CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                    / (sqrt(a.ss) * sqrt(b.ss)), 6) DESC, b.vec_id) AS rk
              FROM data a JOIN data b
                ON a.cell = b.cell AND a.vec_id <> b.vec_id)
            WHERE rk <= 3),
          edges AS (SELECT DISTINCT least(vec_id, nb) AS u,
                      greatest(vec_id, nb) AS v FROM knn),
          adj AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
          wedges AS (SELECT x.v AS b, y.v AS c FROM adj x JOIN adj y
                     ON x.u = y.u AND x.v < y.v),
          closed AS (SELECT count(*) AS nc FROM wedges w
                     JOIN edges e ON w.b = e.u AND w.c = e.v)
          SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_vertices,
                 (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
                 (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS n_wedges,
                 CAST(nc // 3 AS BIGINT) AS n_triangles,
                 round(CAST(nc AS DOUBLE) /
                   (SELECT count(*) FROM wedges), 6) AS clustering
          FROM closed""",
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

    "q204_capture_recapture" ->
      """WITH f AS (SELECT md5(text) AS fp FROM documents),
          g AS (SELECT CAST(count(DISTINCT fp) AS BIGINT) AS exact_distinct,
                 CAST(count(DISTINCT CASE WHEN
                   (md5_number_lower('cap_a:' || fp) & 7) = 0 THEN fp END)
                   AS BIGINT) AS n_a,
                 CAST(count(DISTINCT CASE WHEN
                   (md5_number_lower('cap_b:' || fp) & 7) = 0 THEN fp END)
                   AS BIGINT) AS n_b,
                 CAST(count(DISTINCT CASE WHEN
                   (md5_number_lower('cap_a:' || fp) & 7) = 0 AND
                   (md5_number_lower('cap_b:' || fp) & 7) = 0 THEN fp END)
                   AS BIGINT) AS n_ab
                FROM f)
          SELECT exact_distinct, n_a, n_b, n_ab,
                 round(CAST(n_a + 1 AS DOUBLE) * (n_b + 1) / (n_ab + 1) - 1.0, 6)
                   AS n_hat
          FROM g""",
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
    "q198_zipf_fit" ->
      s"""WITH f AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
              FROM (SELECT unnest($tokSql) AS token FROM documents)
              GROUP BY 1),
          xy AS (SELECT ln(CAST(row_number() OVER
                   (ORDER BY freq DESC, token) AS DOUBLE)) AS x,
                 ln(CAST(freq AS DOUBLE)) AS y FROM f),
          g AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
                FROM xy)
          SELECT n AS n_types,
                 round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
                 round(power(n * sxy - sx * sy, 2) /
                   ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
          FROM g""",
    "q194_ctfidf_keywords" ->
      s"""WITH tk AS (SELECT source, unnest($tokSql) AS token FROM documents),
          cls AS (SELECT source, token, CAST(count(*) AS BIGINT) AS tfc
                  FROM tk GROUP BY 1, 2),
          cw AS (SELECT source, token, tfc,
                  CAST(sum(tfc) OVER (PARTITION BY source) AS BIGINT) AS totc
                 FROM cls),
          corpus AS (SELECT token, CAST(count(*) AS BIGINT) AS ft
                     FROM tk GROUP BY 1),
          tots AS (SELECT CAST(count(*) AS BIGINT) AS t_tok,
                    CAST(count(DISTINCT source) AS BIGINT) AS n_cls FROM tk),
          sc AS (SELECT cw.source, cw.token,
                  round(CAST(cw.tfc AS DOUBLE) / cw.totc *
                    ln(1.0 + CAST(t.t_tok AS DOUBLE) / (t.n_cls * c.ft)), 6)
                    AS score
                 FROM cw JOIN corpus c ON cw.token = c.token CROSS JOIN tots t),
          r AS (SELECT source, token, score,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY score DESC, token) AS BIGINT) AS rk FROM sc)
          SELECT source, rk, token, score FROM r WHERE rk <= 5
          ORDER BY source, rk""",
    "q195_token_burstiness" ->
      s"""WITH pd AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS x
              FROM (SELECT doc_id, unnest($tokSql) AS token FROM documents)
              GROUP BY 1, 2),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          t AS (SELECT token, CAST(sum(x) AS BIGINT) AS tf,
                 CAST(count(*) AS BIGINT) AS df,
                 CAST(sum(x * x) AS BIGINT) AS sx2
                FROM pd GROUP BY 1)
          SELECT token, tf, df,
                 round(CAST(n_docs * sx2 - tf * tf AS DOUBLE)
                   / CAST(n_docs * tf AS DOUBLE), 6) AS vmr
          FROM t CROSS JOIN n ORDER BY vmr DESC, token""",
    "q196_embedding_dim_stats" ->
      """WITH v AS (SELECT dim - 1 AS dim, CAST(embedding[CAST(dim AS INT)] AS DOUBLE) AS v
              FROM embeddings, range(1, 65) t(dim)),
          a AS (SELECT CAST(dim AS BIGINT) AS dim,
                 CAST(count(*) AS BIGINT) AS n,
                 sum(v) AS sx, sum(v * v) AS sx2,
                 round(min(v), 6) AS vmin, round(max(v), 6) AS vmax
                FROM v GROUP BY 1)
          SELECT dim, n, round(sx / n, 6) AS mean,
                 round(sqrt((sx2 - sx * sx / n) / n), 6) AS std,
                 vmin, vmax
          FROM a ORDER BY dim""",
    "q191_cluster_outliers" ->
      s"""WITH asg AS ($kmeansAsgSql),
          w AS (SELECT vec_id, cluster, dist,
                 CAST(row_number() OVER (PARTITION BY cluster
                   ORDER BY dist, vec_id) AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n
                FROM asg),
          p AS (SELECT cluster,
                 max(CASE WHEN 20 * rn <= 19 * n + 19 THEN dist END) AS p95
                FROM w GROUP BY cluster)
          SELECT w.vec_id, w.cluster, w.dist, CAST(p.p95 AS BIGINT) AS p95
          FROM w JOIN p USING (cluster) WHERE w.dist > p.p95
          ORDER BY cluster, dist DESC, vec_id""",
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
    "q189_kanon_audit" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
                c_mktsegment AS segment,
                CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
                CAST(count(*) AS BIGINT) AS n,
                count(*) < 4 AS at_risk
         FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q190_pmi_pairs" ->
      s"""WITH tk AS (SELECT doc_id, generate_subscripts(l, 1) AS pos,
                unnest(l) AS w
              FROM (SELECT doc_id, $tokSql AS l FROM documents)),
          pr AS (SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
                 FROM tk a JOIN tk b ON a.doc_id = b.doc_id
                   AND b.pos > a.pos AND b.pos - a.pos <= 3),
          cp AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_pair
                 FROM pr GROUP BY 1, 2),
          cw AS (SELECT w, CAST(count(*) AS BIGINT) AS cw FROM tk GROUP BY 1),
          t AS (SELECT CAST(count(*) AS BIGINT) AS t_tok FROM tk),
          tp AS (SELECT CAST(count(*) AS BIGINT) AS t_pair FROM pr),
          j AS (SELECT cp.w1, cp.w2, cp.c_pair, a.cw AS c1, b.cw AS c2
                FROM cp JOIN cw a ON cp.w1 = a.w JOIN cw b ON cp.w2 = b.w
                WHERE cp.c_pair >= 20)
          SELECT w1, w2, c_pair,
                 round(ln(CAST(c_pair AS DOUBLE) * t_tok * t_tok /
                   (CAST(t_pair AS DOUBLE) * c1 * c2)), 6) AS pmi
          FROM j CROSS JOIN t CROSS JOIN tp
          ORDER BY pmi DESC, w1, w2 LIMIT 20""",
    "q182_bm25_ndcg" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  avg(CAST(len(lst) AS DOUBLE)) AS avgdl FROM t),
          x AS (SELECT doc_id, CAST(len(lst) AS DOUBLE) AS dl,
                  unnest(lst) AS token FROM t),
          m AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf, max(dl) AS dl
                FROM x WHERE token IN ('dup', 'vector', 'hash', 'merge') GROUP BY 1, 2),
          d AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM m GROUP BY 1),
          c AS (SELECT m.doc_id, m.token,
                  ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) * m.tf * 2.2
                    / (m.tf + 1.2 * (0.25 + 0.75 * m.dl / s.avgdl)) AS contrib
                FROM m JOIN d USING (token) CROSS JOIN s),
          sc AS (SELECT doc_id, round(sum(contrib), 6) AS score,
                   CAST(count(DISTINCT token) AS BIGINT) AS rel
                 FROM c GROUP BY doc_id),
          dr AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk
                 FROM sc),
          ir AS (SELECT *, row_number() OVER (ORDER BY rel DESC, doc_id) AS rk
                 FROM sc),
          dcg AS (SELECT round(sum(CAST(rel AS DOUBLE)
                    / (ln(CAST(rk AS DOUBLE) + 1.0) / ln(2.0))), 6) AS dcg
                  FROM dr WHERE rk <= 10),
          idcg AS (SELECT round(sum(CAST(rel AS DOUBLE)
                    / (ln(CAST(rk AS DOUBLE) + 1.0) / ln(2.0))), 6) AS idcg
                   FROM ir WHERE rk <= 10)
          SELECT dcg, idcg, round(dcg / idcg, 6) AS ndcg
          FROM dcg CROSS JOIN idcg""",
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
    "q178_joinsize_sketch" ->
      s"""WITH tk AS (SELECT unnest($tokSql) AS tok FROM documents),
          hs AS (SELECT
                   CAST(md5_number_lower('cms:' || tok) & 4294967295 AS BIGINT) AS h1,
                   CAST((md5_number_lower('cms:' || tok) >> 32) | 1 AS BIGINT) AS h2
                 FROM tk),
          g AS (SELECT d, (h1 + d * h2) & 1023 AS idx, count(*) AS cell
                FROM hs, range(0, 4) t(d) GROUP BY 1, 2),
          ip AS (SELECT d, CAST(sum(cell * cell) AS BIGINT) AS ip
                 FROM g GROUP BY d),
          est AS (SELECT min(ip) AS est_f2 FROM ip),
          ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS exact_f2 FROM
                  (SELECT count(*) AS c FROM tk GROUP BY tok))
          SELECT est_f2, exact_f2,
            round(CAST(est_f2 - exact_f2 AS DOUBLE)
              / CAST(exact_f2 AS DOUBLE), 4) AS overest_frac
          FROM est CROSS JOIN ex""",
    "q174_cumulative_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
             FROM events),
          days AS (SELECT DISTINCT day FROM ud),
          fs AS (SELECT user_id, min(day) AS day FROM ud GROUP BY 1),
          nf AS (SELECT day, count(*) AS nf FROM fs GROUP BY 1),
          exact AS (SELECT days.day,
                     CAST(sum(coalesce(nf, 0)) OVER (ORDER BY days.day) AS BIGINT)
                       AS exact_cum
                    FROM days LEFT JOIN nf USING (day)),
          h0 AS (SELECT day,
                  CAST(md5_number_lower('cu:' || user_id) & 255 AS BIGINT) AS idx,
                  CAST((md5_number_lower('cu:' || user_id) >> 8) & 281474976710655 AS BIGINT) AS w
                 FROM ud),
          s1 AS (SELECT *, w | (w >> 1) AS w1 FROM h0),
          s2 AS (SELECT *, w1 | (w1 >> 2) AS w2 FROM s1),
          s3 AS (SELECT *, w2 | (w2 >> 4) AS w3 FROM s2),
          s4 AS (SELECT *, w3 | (w3 >> 8) AS w4 FROM s3),
          s5 AS (SELECT *, w4 | (w4 >> 16) AS w5 FROM s4),
          s6 AS (SELECT *, w5 | (w5 >> 32) AS w6 FROM s5),
          r AS (SELECT day, idx, max(49 - bit_count(w6)) AS m
                FROM s6 GROUP BY day, idx),
          spine AS (SELECT day, idx FROM days
                    CROSS JOIN (SELECT range AS idx FROM range(256))),
          cum AS (SELECT spine.day, spine.idx,
                   max(m) OVER (PARTITION BY spine.idx ORDER BY spine.day) AS mc
                  FROM spine LEFT JOIN r ON r.day = spine.day AND r.idx = spine.idx),
          est AS (SELECT day,
                   CAST(sum(1::BIGINT << CAST(49 - mc AS INT)) AS BIGINT)
                     + (256 - count(*)) * 562949953421312 AS ssum,
                   count(*) AS nr
                  FROM cum WHERE mc IS NOT NULL GROUP BY day)
          SELECT exact.day, exact_cum,
            round(CASE WHEN nr < 256
                    AND 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 562949953421312.0 / ssum <= 640.0
                   THEN 256.0 * ln(256.0 / (256 - nr))
                   ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 562949953421312.0 / ssum
              END, 3) AS hll_cum_est
          FROM exact JOIN est USING (day) ORDER BY day""",
    "q175_blocklist_filter" ->
      s"""WITH t1 AS (SELECT doc_id, tok AS g FROM
                   (SELECT doc_id, unnest($tokSql) AS tok FROM documents)
                 WHERE tok IN ('data', 'slow')),
          t2 AS (SELECT doc_id, g FROM
                   (SELECT doc_id,
                      unnest([lst[i] || ' ' || lst[i+1]
                              for i in range(1, len(lst))]) AS g
                    FROM (SELECT doc_id, $tokSql AS lst FROM documents)
                    WHERE len(lst) >= 2)
                 WHERE g IN ('hash join', 'table scan')),
          u AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2),
          pg AS (SELECT doc_id, g, count(*) AS n FROM u GROUP BY 1, 2),
          hits AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_hits,
                     count(*) AS n_phrases_hit
                   FROM pg GROUP BY doc_id)
          SELECT d.doc_id, coalesce(n_hits, 0) AS n_hits,
            coalesce(n_phrases_hit, 0) AS n_phrases_hit,
            coalesce(n_hits, 0) >= 8 AS flagged
          FROM (SELECT doc_id FROM documents) d
          LEFT JOIN hits USING (doc_id) ORDER BY d.doc_id""",
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
    "q173_profile" ->
      """WITH st AS (
            SELECT 'l_returnflag' AS c, l_returnflag AS v FROM lineitem
            UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
            UNION ALL SELECT 'l_quantity',
              CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) FROM lineitem
            UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem),
          base AS (SELECT c, count(*) AS n_rows,
                    CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                    min(v) AS min_v, max(v) AS max_v,
                    count(DISTINCT v) AS distinct_exact
                   FROM st GROUP BY c),
          h0 AS (SELECT c,
                  CAST(md5_number_lower('prof:' || v) & 255 AS BIGINT) AS idx,
                  CAST((md5_number_lower('prof:' || v) >> 8) & 281474976710655 AS BIGINT) AS w
                 FROM st WHERE v IS NOT NULL),
          s1 AS (SELECT *, w | (w >> 1) AS w1 FROM h0),
          s2 AS (SELECT *, w1 | (w1 >> 2) AS w2 FROM s1),
          s3 AS (SELECT *, w2 | (w2 >> 4) AS w3 FROM s2),
          s4 AS (SELECT *, w3 | (w3 >> 8) AS w4 FROM s3),
          s5 AS (SELECT *, w4 | (w4 >> 16) AS w5 FROM s4),
          s6 AS (SELECT *, w5 | (w5 >> 32) AS w6 FROM s5),
          r AS (SELECT c, idx, max(49 - bit_count(w6)) AS m
                FROM s6 GROUP BY c, idx),
          sr AS (SELECT c,
                  CAST(sum(1::BIGINT << CAST(49 - m AS INT)) AS BIGINT)
                    + (256 - count(*)) * 562949953421312 AS ssum,
                  count(*) AS nr
                 FROM r GROUP BY c)
          SELECT base.c, n_rows, n_null, distinct_exact,
            round(CASE WHEN nr < 256
                    AND 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 562949953421312.0 / ssum <= 640.0
                   THEN 256.0 * ln(256.0 / (256 - nr))
                   ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 562949953421312.0 / ssum
              END, 3) AS distinct_est,
            min_v, max_v
          FROM base JOIN sr USING (c) ORDER BY base.c""",
    "q170_topk_bounded" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer),
          r AS (SELECT *, row_number() OVER (PARTITION BY c_nationkey
                  ORDER BY bal_cents DESC, c_custkey) AS rk FROM c)
          SELECT n_name, CAST(rk AS BIGINT) AS rk, c_custkey, bal_cents
          FROM r JOIN nation ON n_nationkey = c_nationkey
          WHERE rk <= 3 ORDER BY n_name, rk""",
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
    "q167_fuzzy_join" ->
      s"""WITH vb AS (SELECT tok AS w, count(*) AS cnt
                      FROM (SELECT unnest($tokSql) AS tok FROM documents)
                      WHERE length(tok) >= 4 GROUP BY tok HAVING count(*) >= 2),
          vr AS (SELECT w, cnt,
                   unnest(list_prepend(w, list_transform(range(length(w)),
                     i -> substr(w, 1, CAST(i AS INT)) || substr(w, CAST(i + 2 AS INT))))) AS v
                 FROM vb),
          cand AS (SELECT DISTINCT a.w AS w1, b.w AS w2,
                     a.cnt AS cnt1, b.cnt AS cnt2
                   FROM vr a JOIN vr b ON a.v = b.v AND a.w < b.w)
          SELECT w1, w2, cnt1, cnt2 FROM cand
          WHERE levenshtein(w1, w2) <= 1 ORDER BY w1, w2""",
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
    "q169_bloom_join" ->
      """WITH u AS (SELECT o_orderkey FROM orders
                    WHERE o_orderpriority = '1-URGENT'),
          bits AS (SELECT DISTINCT
                     CAST(md5_number_lower('bf' || j || ':' || o_orderkey) & 1048575 AS BIGINT) AS pos
                   FROM u CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) jj),
          li AS (SELECT l_orderkey,
                   CAST(floor(l_extendedprice * 100) AS BIGINT) AS rev
                 FROM lineitem),
          pass AS (SELECT l_orderkey, rev FROM li
                   WHERE CAST(md5_number_lower('bf0:' || l_orderkey) & 1048575 AS BIGINT) IN (SELECT pos FROM bits)
                     AND CAST(md5_number_lower('bf1:' || l_orderkey) & 1048575 AS BIGINT) IN (SELECT pos FROM bits)
                     AND CAST(md5_number_lower('bf2:' || l_orderkey) & 1048575 AS BIGINT) IN (SELECT pos FROM bits))
          SELECT (SELECT count(*) FROM u) AS n_urgent_keys,
            count(*) AS n_pass_bloom,
            CAST(sum(CASE WHEN u.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
            CAST(sum(CASE WHEN u.o_orderkey IS NOT NULL THEN rev ELSE 0 END) AS BIGINT) AS revenue_cents
          FROM pass LEFT JOIN u ON pass.l_orderkey = u.o_orderkey""",
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
    "q161_kmv_overlap" ->
      s"""WITH tk AS (SELECT DISTINCT source, tok FROM
                   (SELECT source, unnest($tokSql) AS tok FROM documents)),
          h AS (SELECT source,
                 CAST(md5_number_lower('kmv:' || tok) & 281474976710655 AS BIGINT) AS h
                FROM tk),
          sk AS (SELECT source, list_sort(list(DISTINCT h))[1:128] AS sk
                 FROM h GROUP BY source),
          nd AS (SELECT source, count(DISTINCT tok) AS nd FROM tk GROUP BY source),
          ei AS (SELECT x.source AS src_a, y.source AS src_b,
                   count(*) AS exact_inter
                 FROM tk x JOIN tk y ON x.tok = y.tok AND x.source < y.source
                 GROUP BY 1, 2),
          p AS (SELECT a.source AS src_a, b.source AS src_b,
                  a.sk AS ska, b.sk AS skb, na.nd AS nda, nb.nd AS ndb,
                  list_sort(list_distinct(list_concat(a.sk, b.sk)))[1:128] AS un
                FROM sk a JOIN sk b ON a.source < b.source
                JOIN nd na ON na.source = a.source
                JOIN nd nb ON nb.source = b.source),
          c AS (SELECT src_a, src_b, nda, ndb, len(un) AS ku, un[len(un)] AS tau,
                  len(list_filter(un, x -> list_contains(ska, x)
                                       AND list_contains(skb, x))) AS m
                FROM p),
          e AS (SELECT src_a, src_b, nda, ndb, ku, m,
                  CASE WHEN ku < 128 THEN CAST(ku AS DOUBLE)
                       ELSE 127.0 * 281474976710656.0 / tau END AS u_est
                FROM c)
          SELECT e.src_a, e.src_b,
            coalesce(ei.exact_inter, 0) AS exact_inter,
            nda + ndb - coalesce(ei.exact_inter, 0) AS exact_union,
            round(u_est, 3) AS union_est,
            round(CAST(m AS DOUBLE) / ku, 6) AS jacc_est,
            CAST(round(CAST(m AS DOUBLE) / ku * u_est, 0) AS BIGINT) AS inter_est
          FROM e LEFT JOIN ei USING (src_a, src_b)
          ORDER BY src_a, src_b""",
    "q160_sketch_rollup" ->
      s"""WITH tk AS (SELECT source, unnest(sh) AS tok FROM
                   (SELECT source, $shSql AS sh
                    FROM (SELECT source, $tokSql AS lst FROM documents)
                    WHERE len(lst) >= 3)),
          h0 AS (SELECT source, tok,
                 CAST(md5_number_lower('hll:' || tok) & 255 AS BIGINT) AS idx,
                 CAST((md5_number_lower('hll:' || tok) >> 8) & 281474976710655 AS BIGINT) AS w
                 FROM tk),
          s1 AS (SELECT *, w | (w >> 1) AS w1 FROM h0),
          s2 AS (SELECT *, w1 | (w1 >> 2) AS w2 FROM s1),
          s3 AS (SELECT *, w2 | (w2 >> 4) AS w3 FROM s2),
          s4 AS (SELECT *, w3 | (w3 >> 8) AS w4 FROM s3),
          s5 AS (SELECT *, w4 | (w4 >> 16) AS w5 FROM s4),
          s6 AS (SELECT *, w5 | (w5 >> 32) AS w6 FROM s5),
          r AS MATERIALIZED (SELECT source, idx, max(49 - bit_count(w6)) AS m
                FROM s6 GROUP BY source, idx),
          lv AS (SELECT source AS scope, idx, m FROM r
                 UNION ALL
                 SELECT '__corpus__', idx, max(m) FROM r GROUP BY idx),
          sreg AS (SELECT scope,
                   CAST(sum(1::BIGINT << CAST(49 - m AS INT)) AS BIGINT)
                     + (256 - count(*)) * 562949953421312 AS s,
                   count(*) AS nr
                   FROM lv GROUP BY scope),
          ex AS (SELECT source AS scope,
                   count(DISTINCT tok) AS distinct_exact FROM tk GROUP BY source
                 UNION ALL
                 SELECT '__corpus__', count(DISTINCT tok) FROM tk)
          SELECT ex.scope, ex.distinct_exact,
            round(CASE WHEN nr < 256
                        AND 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 562949953421312.0 / s <= 640.0
                       THEN 256.0 * ln(256.0 / (256 - nr))
                       ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 562949953421312.0 / s
                  END, 3) AS hll_est
          FROM ex JOIN sreg USING (scope) ORDER BY scope""",
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
    "q158_ann_recall_audit" ->
      s"""WITH exact AS MATERIALIZED ($annExactSql),
          approx AS MATERIALIZED ($annIvfSql),
          hits AS (SELECT e.qid, count(*) AS hits
                   FROM exact e JOIN approx a
                     ON a.qid = e.qid AND a.vec_id = e.vec_id
                   GROUP BY e.qid),
          k AS (SELECT qid, count(*) AS k FROM exact GROUP BY qid)
          SELECT k.qid, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
                 round(CAST(coalesce(h.hits, 0) AS DOUBLE) / k.k, 6) AS recall
          FROM k LEFT JOIN hits h ON h.qid = k.qid ORDER BY k.qid""",
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
    "q155_pca_project" -> pcaOracleSql(12),
    "q146_textrank" -> textrankOracleSql(10),
    "q30_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper, count(*) AS n_copies
         FROM documents GROUP BY md5(text) ORDER BY content_hash""",
    "q31_minhash_lsh_dedup" ->
      s"""WITH t AS (SELECT doc_id, $shSql AS sh
                     FROM (SELECT doc_id, $tokSql AS lst FROM documents) WHERE len(lst) >= 3)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
          FROM t a JOIN t b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9
          ORDER BY doc_a, doc_b""",
    "q82_ngram_jaccard_join" ->
      s"""WITH t AS (SELECT doc_id, $shSql AS sh
                     FROM (SELECT doc_id, $tokSql AS lst FROM documents) WHERE len(lst) >= 3)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
          FROM t a JOIN t b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
          ORDER BY doc_a, doc_b""",
    "q83_stratified_split" ->
      """WITH t AS (SELECT doc_id, source,
             CAST(md5_number_lower('split:' || doc_id) & 1023 AS BIGINT) AS bucket
           FROM documents)
         SELECT doc_id, source, bucket,
           CASE WHEN bucket < 819 THEN 'train'
                WHEN bucket < 922 THEN 'valid'
                ELSE 'test' END AS split
         FROM t ORDER BY doc_id""",
    "q84_vocab_topk" ->
      s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS token FROM documents)
          SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
          FROM t GROUP BY token ORDER BY tf DESC, token LIMIT 100""",
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

    // the salt is invisible to results by construction — the oracle is
    // the PLAIN join
    "q145_salted_join" ->
      """SELECT c_mktsegment, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment, event_type
         ORDER BY c_mktsegment, event_type""",

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

    "q86_dup_clusters" -> dupComponentsSql,
    // q143 computes the identical contract by alternating star — one
    // oracle serves both engines' algorithms.
    "q143_components_star" -> dupComponentsSql,
    "q87_pii_redact" ->
      """SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(text, '\+?\d[\d -]{7,}\d')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+?\d[\d -]{7,}\d', '<PHONE>', 'g') AS redacted
         FROM documents ORDER BY doc_id""",
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
    // The oracle recounts n-gram occurrences by brute unnest + group-by,
    // independently of Spark's sorted run-length scan.
    "q89_repetition_stats" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          b2 AS (SELECT doc_id, unnest([lst[i] || ' ' || lst[i+1]
                   for i in range(1, len(lst))]) AS g FROM t),
          c2 AS (SELECT doc_id, g, count(*) AS c FROM b2 GROUP BY 1, 2),
          a2 AS (SELECT doc_id, max(c) AS best2,
                   sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup2
                 FROM c2 GROUP BY 1),
          b3 AS (SELECT doc_id, unnest([lst[i] || ' ' || lst[i+1] || ' ' || lst[i+2]
                   for i in range(1, len(lst) - 1)]) AS g FROM t),
          c3 AS (SELECT doc_id, g, count(*) AS c FROM b3 GROUP BY 1, 2),
          a3 AS (SELECT doc_id, max(c) AS best3,
                   sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3
                 FROM c3 GROUP BY 1)
          SELECT t.doc_id, CAST(len(lst) AS BIGINT) AS n_tokens,
            CAST(coalesce(best2, 0) AS BIGINT) AS top2_count,
            CASE WHEN len(lst) >= 2
              THEN CAST(coalesce(best2, 0) AS DOUBLE) / (len(lst) - 1)
              ELSE 0.0 END AS top2_frac,
            CASE WHEN len(lst) >= 2
              THEN CAST(coalesce(dup2, 0) AS DOUBLE) / (len(lst) - 1)
              ELSE 0.0 END AS dup2_frac,
            CAST(coalesce(best3, 0) AS BIGINT) AS top3_count,
            CASE WHEN len(lst) >= 3
              THEN CAST(coalesce(dup3, 0) AS DOUBLE) / (len(lst) - 2)
              ELSE 0.0 END AS dup3_frac
          FROM t LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
          ORDER BY doc_id""",
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
    // The oracle rebuilds the identical Bloom filter relationally: the
    // set-bit positions are a tiny CTE, a gram is flagged iff all 3 of
    // its positions are set, and the true/false-positive split comes
    // from the exact eval gram set — independent of the kernel.
    "q105_bloom_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $shSql AS sh
                     FROM (SELECT doc_id, $tokSql AS lst FROM documents) WHERE len(lst) >= 3),
          e AS (SELECT DISTINCT unnest(sh) AS g FROM t WHERE doc_id % 20 = 0),
          bits AS (SELECT DISTINCT
                     CAST(md5_number_lower('bf' || j || ':' || g) & 1048575 AS BIGINT) AS pos
                   FROM e CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) jj),
          d AS (SELECT doc_id, unnest(sh) AS g FROM t WHERE doc_id % 20 <> 0),
          h AS (SELECT doc_id, g FROM d
                WHERE CAST(md5_number_lower('bf0:' || g) & 1048575 AS BIGINT) IN (SELECT pos FROM bits)
                  AND CAST(md5_number_lower('bf1:' || g) & 1048575 AS BIGINT) IN (SELECT pos FROM bits)
                  AND CAST(md5_number_lower('bf2:' || g) & 1048575 AS BIGINT) IN (SELECT pos FROM bits))
          SELECT h.doc_id, count(*) AS n_flagged,
            CAST(sum(CASE WHEN e2.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
            CAST(sum(CASE WHEN e2.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_fp
          FROM h LEFT JOIN e e2 ON h.g = e2.g
          GROUP BY h.doc_id ORDER BY doc_id""",
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
    "q110_tokenize_ids" ->
      s"""WITH ex AS (SELECT doc_id, unnest($tokSql) AS token FROM documents),
          c AS (SELECT token, count(*) AS tf FROM ex GROUP BY token),
          v AS (SELECT token,
                  CAST(row_number() OVER (ORDER BY tf DESC, token) - 1 AS BIGINT) AS id
                FROM c ORDER BY tf DESC, token LIMIT 1024),
          t AS (SELECT doc_id, $tokSql AS tok FROM documents),
          p AS (SELECT doc_id, tok, unnest(generate_series(1, len(tok))) AS i FROM t),
          j AS (SELECT p.doc_id, p.i, v.id
                FROM (SELECT doc_id, i, tok[i] AS token FROM p) p
                LEFT JOIN v ON p.token = v.token)
          SELECT t.doc_id,
            coalesce(j.ids, '') AS ids,
            CAST(len(t.tok) AS BIGINT) AS n_tokens,
            CAST(coalesce(j.n_oov, 0) AS BIGINT) AS n_oov
          FROM t LEFT JOIN (
            SELECT doc_id,
              array_to_string(list(CAST(coalesce(id, -1) AS VARCHAR) ORDER BY i), ',') AS ids,
              sum(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS n_oov
            FROM j GROUP BY doc_id) j ON t.doc_id = j.doc_id
          ORDER BY t.doc_id""",
    "q111_inverted_index" ->
      s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS token FROM documents),
          p AS (SELECT token, doc_id, count(*) AS c FROM t GROUP BY 1, 2)
          SELECT token, CAST(sum(c) AS BIGINT) AS tf, count(*) AS df,
            array_to_string(list_sort(list(doc_id))[1:16], ',') AS postings
          FROM p GROUP BY token ORDER BY token""",
    "q112_bm25_topk" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  avg(CAST(len(lst) AS DOUBLE)) AS avgdl FROM t),
          x AS (SELECT doc_id, CAST(len(lst) AS DOUBLE) AS dl,
                  unnest(lst) AS token FROM t),
          m AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf, max(dl) AS dl
                FROM x WHERE token IN ('dup', 'vector', 'hash', 'merge') GROUP BY 1, 2),
          d AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM m GROUP BY 1),
          c AS (SELECT m.doc_id,
                  ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) * m.tf * 2.2
                    / (m.tf + 1.2 * (0.25 + 0.75 * m.dl / s.avgdl)) AS contrib
                FROM m JOIN d USING (token) CROSS JOIN s)
          SELECT doc_id, count(*) AS n_terms, round(sum(contrib), 6) AS score
          FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""",
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
    "q108_incremental_dedup" ->
      s"""WITH t AS (SELECT doc_id, $shSql AS sh
                     FROM (SELECT doc_id, $tokSql AS lst FROM documents) WHERE len(lst) >= 3),
          v AS (SELECT a.doc_id AS new_doc, b.doc_id AS idx_doc,
                  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
                FROM t a JOIN t b ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
                WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9),
          r AS (SELECT new_doc, idx_doc, jaccard,
                  row_number() OVER (PARTITION BY new_doc
                    ORDER BY jaccard DESC, idx_doc DESC) AS rn,
                  count(*) OVER (PARTITION BY new_doc) AS n_dups
                FROM v)
          SELECT n.doc_id AS new_doc,
            CAST(coalesce(r.n_dups, 0) AS BIGINT) AS n_dups,
            r.idx_doc AS best_match, r.jaccard AS best_jaccard,
            (r.new_doc IS NULL) AS admit
          FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) n
          LEFT JOIN (SELECT * FROM r WHERE rn = 1) r ON n.doc_id = r.new_doc
          ORDER BY new_doc""",
    "q103_embed_quantize" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         m AS (SELECT vec_id, emb,
                 list_max(list_transform(emb, x -> abs(x))) AS maxabs FROM e),
         sc AS (SELECT vec_id, emb, maxabs,
                  CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END AS scale
                FROM m)
         SELECT vec_id,
           array_to_string(list_transform(emb,
             x -> CAST(CAST(round(x * scale) AS INT) AS VARCHAR)), ',') AS qvec,
           round(CASE WHEN maxabs > 0
             THEN list_max(list_transform(emb, x -> abs(x - round(x * scale) / scale)))
             ELSE 0.0 END, 6) AS max_abs_err
         FROM sc ORDER BY vec_id""",
    "q102_dup_source_matrix" ->
      s"""WITH t AS (SELECT doc_id, $shSql AS sh
                     FROM (SELECT doc_id, $tokSql AS lst FROM documents) WHERE len(lst) >= 3),
          p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
                FROM t a JOIN t b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9),
          j AS (SELECT least(da.source, db.source) AS source_a,
                  greatest(da.source, db.source) AS source_b, jaccard
                FROM p JOIN documents da ON p.doc_a = da.doc_id
                       JOIN documents db ON p.doc_b = db.doc_id)
          SELECT source_a, source_b, count(*) AS n_pairs,
            round(avg(jaccard), 6) AS avg_jaccard,
            source_a <> source_b AS cross_source
          FROM j GROUP BY source_a, source_b ORDER BY source_a, source_b""",
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
    // The oracle replays winnowing itself: k-gram UBIGINT hashes, then
    // each window's leftmost list_min via list_position.
    "q100_winnow_overlap" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          h AS (SELECT doc_id,
                  [md5_number_lower(lst[i] || ' ' || lst[i+1] || ' ' || lst[i+2] || ' ' || lst[i+3])
                   for i in range(1, len(lst) - 2)] AS hs
                FROM t WHERE len(lst) >= 7),
          sel AS (SELECT doc_id, list_distinct(
                    [hs[j + list_position(hs[j:j+3], list_min(hs[j:j+3])) - 1]
                     for j in range(1, len(hs) - 2)]) AS fps FROM h),
          g AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
          c AS (SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n_docs FROM g)
          SELECT doc_id, count(*) AS n_fp,
            CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_fp,
            CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
              / count(*) AS shared_frac
          FROM c GROUP BY doc_id ORDER BY doc_id""",
    "q99_bigram_surprisal" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          b AS (SELECT doc_id, unnest(lst[1:len(lst)-1]) AS prev,
                  unnest(lst[2:len(lst)]) AS cur
                FROM t WHERE len(lst) >= 2),
          c AS (SELECT doc_id, prev, cur,
                  count(*) OVER (PARTITION BY prev, cur) AS c_bg,
                  count(*) OVER (PARTITION BY prev) AS c_prev
                FROM b)
          SELECT doc_id, count(*) AS n_bigrams,
            round(avg(log2(c_prev) - log2(c_bg)), 6) AS avg_surprisal_bits
          FROM c GROUP BY doc_id ORDER BY doc_id""",
    "q98_unigram_surprisal" ->
      s"""WITH tk AS (SELECT doc_id, unnest($tokSql) AS token FROM documents),
          c AS (SELECT doc_id, token,
                  count(*) OVER (PARTITION BY token) AS tf FROM tk)
          SELECT doc_id, count(*) AS n_tokens,
            round(log2((SELECT count(*) FROM tk)) - avg(log2(tf)), 6)
              AS avg_surprisal_bits
          FROM c GROUP BY doc_id ORDER BY doc_id""",
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
    "q95_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
         g AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
         e AS (SELECT doc_id, sum(n) AS n_chars, count(*) AS n_distinct,
                 round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 6) AS h
               FROM g GROUP BY doc_id)
         SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_distinct AS BIGINT) AS n_distinct_chars,
           h AS entropy_bits
         FROM e ORDER BY doc_id""",
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
    "q94_span_dedup" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          s AS (SELECT doc_id, list_distinct([array_to_string(lst[i:i+7], ' ')
                  for i in range(1, len(lst) - 6)]) AS sh
                FROM t WHERE len(lst) >= 8),
          g AS (SELECT doc_id, unnest(sh) AS g FROM s),
          c AS (SELECT g, count(*) AS n_docs FROM g GROUP BY g)
          SELECT doc_id, count(*) AS n_windows,
            CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
            CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
              / count(*) AS shared_frac
          FROM g JOIN c USING (g)
          GROUP BY doc_id ORDER BY doc_id""",
    // The oracle recomputes cells and within-cell cosines brute-force
    // (q57's codebook SQL), independently of Spark's join order.
    "q93_semantic_dedup" ->
      """WITH kk AS (SELECT greatest(16, CAST(count(*) // 125 AS INT)) AS nk
                     FROM embeddings),
         c AS (SELECT vec_id, embedding,
             list_transform(range(0, nk), k -> list_sum(list_transform(range(1, 65), i ->
               CAST(embedding[i] AS DOUBLE) *
               (CASE WHEN (md5_number_lower('ivf_' || k::VARCHAR || '_' || (i-1)::VARCHAR) & 1) = 1
                     THEN 1.0 ELSE -1.0 END)))) AS dots,
             list_sum(list_transform(range(1, 65), i ->
               CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS ss
           FROM embeddings, kk),
         d0 AS (SELECT vec_id, embedding, ss, dots, unnest(range(0, nk)) AS k
                FROM c, kk),
         d AS (SELECT vec_id, embedding, ss, k, dots[CAST(k AS INT) + 1] AS dot
               FROM d0),
         asg AS (SELECT vec_id, embedding, ss, k AS cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, k) AS rk FROM d),
         a AS (SELECT vec_id, embedding, ss, cell FROM asg WHERE rk = 1),
         p AS (SELECT y.vec_id AS vec_id, count(*) AS n_dups
               FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id
               WHERE round(list_sum(list_transform(range(1, 65), i ->
                       CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
                     / (sqrt(x.ss) * sqrt(y.ss)), 6) >= 0.45
               GROUP BY y.vec_id)
         SELECT a.vec_id, CAST(cell AS INT) AS cell,
           CAST(coalesce(n_dups, 0) AS BIGINT) AS n_dups,
           coalesce(n_dups, 0) = 0 AS kept
         FROM a LEFT JOIN p USING (vec_id) ORDER BY vec_id""",
    "q92_quality_filter" ->
      s"""WITH $qualityCteSql
          SELECT doc_id, n_tokens, stop_ratio, mean_word_len, top2_frac,
            lang_guess, f_short, f_stop, f_wordlen, f_rep, f_lang, keep
          FROM fk ORDER BY doc_id""",
    "q32_canonical_fingerprint" ->
      s"""SELECT doc_id,
          md5(array_to_string(list_sort(list_distinct($tokSql)), ' ')) AS fingerprint
          FROM documents ORDER BY doc_id""",
    "q33_quality_score" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst, text FROM documents)
          SELECT doc_id,
            CAST(len(lst) AS BIGINT) AS n_tokens,
            CAST(len(regexp_extract_all(text, '[,.!?;:]')) AS BIGINT) AS n_punct,
            CAST(len(list_filter(lst, x -> list_contains(['the','and','of','to','in','is','a'], x))) AS BIGINT) AS stop_hits,
            CAST(len(list_filter(lst, x -> list_contains(['the','and','of','to','in','is','a'], x))) AS DOUBLE)
              / len(lst) * 0.5 + least(CAST(len(lst) AS DOUBLE) / 100.0, 1.0) * 0.5 AS quality
          FROM t ORDER BY doc_id""",
    "q34_lang_id" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          c AS (SELECT doc_id,
            len(list_filter(lst, x -> list_contains(['the','and','of','to','in','is','a'], x))) AS c_en,
            len(list_filter(lst, x -> list_contains(['der','die','und','ist','das','ein'], x))) AS c_de,
            len(list_filter(lst, x -> list_contains(['el','la','de','que','y','los'], x))) AS c_es,
            len(list_filter(lst, x -> list_contains(['le','la','et','les','des','un'], x))) AS c_fr,
            len(list_filter(lst, x -> list_contains(['的','是','不','我','在','了'], x))) AS c_zh
            FROM t)
          SELECT doc_id, CASE
            WHEN greatest(c_en, c_de, c_es, c_fr, c_zh) = 0 THEN 'und'
            WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
            WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
            WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
            WHEN c_fr >= c_zh THEN 'fr'
            ELSE 'zh' END AS lang_guess
          FROM c ORDER BY doc_id""",
    "q35_token_count" ->
      s"""SELECT doc_id,
          CAST(len($tokSql) AS BIGINT) AS n_ws_tokens,
          CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens
          FROM documents ORDER BY doc_id""",
    "q36_ann_topk" -> annExactSql,
    "q37_embedding_neardup" ->
      """WITH p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
            round(
              list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
               * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 6) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
          SELECT vec_a, vec_b, cos FROM p WHERE cos >= 0.45 ORDER BY vec_a, vec_b""",
    // DuckDB recomputes the simhash signatures from scratch (md5-lower-64
    // token hashes == md5_number_lower) and replicates the 4x16-bit band
    // condition exactly — the oracle checks LSH candidate generation AND
    // hamming verification, not just the verify stage.
    "q38_simhash_neardup" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          s AS (SELECT doc_id, list_transform(lst, tok -> md5_number_lower(tok)) AS hs FROM t),
          g AS (SELECT doc_id, list_sum(list_transform(range(0, 64), k ->
                  CASE WHEN 2 * len(list_filter(hs, h -> ((h >> k) & 1) = 1)) > len(hs)
                       THEN (1::HUGEINT << k) ELSE 0::HUGEINT END))::HUGEINT AS sig FROM s),
          bands AS (SELECT doc_id, sig, b AS band_id,
                      ((sig >> CAST(b * 16 AS INT)) & 65535) AS key
                    FROM g, range(0, 4) t2(b)),
          capped AS (SELECT * FROM (SELECT bands.*,
                       row_number() OVER (PARTITION BY band_id, key ORDER BY doc_id) AS rk
                     FROM bands) WHERE rk <= 64),
          pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.sig AS sig_a, b.sig AS sig_b
                    FROM capped a JOIN capped b
                      ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
          FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= 6
          ORDER BY doc_a, doc_b""",
    // FNV-1a chained over token bytes + 0x1f boundary markers, replayed
    // byte-for-byte in DuckDB via hex expansion + HUGEINT mod-2^64 fold.
    "q39_rolling_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          b AS (SELECT doc_id, flatten(list_transform(lst, tok ->
                  list_append(
                    list_transform(range(1, octet_length(encode(tok)) + 1), i ->
                      (strpos('0123456789abcdef', substr(lower(hex(encode(tok))), 2*i-1, 1)) - 1) * 16
                      + (strpos('0123456789abcdef', substr(lower(hex(encode(tok))), 2*i, 1)) - 1)),
                    31))) AS bs
                FROM t),
          f AS (SELECT doc_id, list_reduce(list_prepend(14695981039346656037::HUGEINT, bs),
                  (acc, x) -> (xor(acc::HUGEINT, x::HUGEINT) * 1099511628211) % 18446744073709551616::HUGEINT) AS h
                FROM b)
          SELECT doc_id, CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                 THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS fp
          FROM f ORDER BY doc_id""",
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
    // IVF over the md5-Rademacher codebook: the oracle recomputes cell
    // assignment (argmax of 16 centroid dots, lower-id tie-break), the
    // nprobe=4 probe list, and the exact in-cell cosine top-5.
    "q57_ann_ivf" -> annIvfSql,
    // Sign bits from md5-Rademacher hyperplanes (weight = ±1 by the low
    // bit of md5_number_lower('p_j')), 4x8-bit bands with the 64-
    // representative bucket cap, exact cosine on candidates — the full
    // LSH pipeline, independently rebuilt.
    "q41_ann_lsh" ->
      """WITH g AS (SELECT vec_id,
             list_sum(list_transform(range(0, 32), p ->
               CASE WHEN list_sum(list_transform(range(1, 65), i ->
                      CAST(embedding[i] AS DOUBLE) *
                      (CASE WHEN (md5_number_lower(p::VARCHAR || '_' || (i-1)::VARCHAR) & 1) = 1
                            THEN 1.0 ELSE -1.0 END))) >= 0
                    THEN (1::BIGINT << CAST(p AS INT)) ELSE 0::BIGINT END))::BIGINT AS bits,
             list_sum(list_transform(range(1, 65), i ->
               CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS ss,
             embedding
             FROM embeddings),
         bands AS (SELECT vec_id, ((bits >> CAST(p * 8 AS INT)) & 255) AS key, p AS band_id
                   FROM g, range(0, 4) t2(p)),
         capped AS (SELECT * FROM (SELECT bands.*,
                      row_number() OVER (PARTITION BY band_id, key ORDER BY vec_id) AS rk
                    FROM bands) WHERE rk <= 64),
         cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
                  FROM capped x JOIN capped y
                    ON x.band_id = y.band_id AND x.key = y.key AND x.vec_id < y.vec_id)
         SELECT c.vec_a, c.vec_b,
           round(list_sum(list_transform(range(1, 65), i ->
               CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt(a.ss) * sqrt(b.ss)), 6) AS cos
         FROM cand c JOIN g a ON a.vec_id = c.vec_a JOIN g b ON b.vec_id = c.vec_b
         WHERE round(list_sum(list_transform(range(1, 65), i ->
               CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt(a.ss) * sqrt(b.ss)), 6) >= 0.4
         ORDER BY vec_a, vec_b""",

    // Fixed-point Lloyd's, three assignment rounds unrolled as CTEs:
    // quantize to 1e-4 longs, init = k lowest vec_ids, centroid update
    // = per-dim rounded integer mean, tie-break lowest cluster id.
    "q114_kmeans_cluster" -> kmeansAsgSql,

    // q57's cell/probe machinery turned cross-set: corpus = rk 1 cell,
    // eval split probes its 4 closest cells, exact cosine on candidates.
    "q115_semantic_decontaminate" ->
      """WITH kk AS (SELECT greatest(16, CAST(count(*) // 125 AS INT)) AS nk
                     FROM embeddings),
         c AS (SELECT vec_id, embedding,
             list_transform(range(0, nk), k -> list_sum(list_transform(range(1, 65), i ->
               CAST(embedding[i] AS DOUBLE) *
               (CASE WHEN (md5_number_lower('ivf_' || k::VARCHAR || '_' || (i-1)::VARCHAR) & 1) = 1
                     THEN 1.0 ELSE -1.0 END)))) AS dots,
             list_sum(list_transform(range(1, 65), i ->
               CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS ss
           FROM embeddings, kk),
         d AS (SELECT vec_id, embedding, ss, k, dots[CAST(k AS INT) + 1] AS dot
               FROM (SELECT vec_id, embedding, ss, dots, unnest(range(0, nk)) AS k
                     FROM c, kk)),
         asg AS (SELECT vec_id, embedding, ss, k AS cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, k) AS rk FROM d),
         corpus AS (SELECT vec_id, embedding, ss, cell FROM asg
                    WHERE rk = 1 AND vec_id % 20 <> 0),
         ev AS (SELECT vec_id AS eid, embedding AS ee, ss AS ess, cell
                FROM asg WHERE vec_id % 20 = 0 AND rk <= 4),
         h AS (SELECT x.vec_id, count(*) AS n_hits,
                max(round(list_sum(list_transform(range(1, 65), i ->
                      CAST(x.embedding[i] AS DOUBLE) * CAST(e.ee[i] AS DOUBLE)))
                    / (sqrt(x.ss) * sqrt(e.ess)), 6)) AS max_cos
               FROM corpus x JOIN ev e ON x.cell = e.cell
               WHERE round(list_sum(list_transform(range(1, 65), i ->
                     CAST(x.embedding[i] AS DOUBLE) * CAST(e.ee[i] AS DOUBLE)))
                   / (sqrt(x.ss) * sqrt(e.ess)), 6) >= 0.45
               GROUP BY x.vec_id)
         SELECT c.vec_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
           coalesce(max_cos, 0.0) AS max_cos,
           coalesce(n_hits, 0) > 0 AS contaminated
         FROM corpus c LEFT JOIN h USING (vec_id) ORDER BY vec_id""",

    // Hashed linear classifier with integer weights:
    // w[fid] = fid * 2654435761 mod 2048 - 1024, fid = md5 & 1023.
    "q116_quality_classifier" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
          w AS (SELECT doc_id, len(toks) AS n_tokens,
                list_sum(list_transform(toks, tok ->
                  CAST(md5_number_lower('qc:' || tok) & 1023 AS BIGINT)
                    * 2654435761 % 2048 - 1024)) AS score_raw
                FROM t)
          SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
            CAST(score_raw AS BIGINT) AS score_raw,
            round(score_raw * 1.0 / n_tokens, 6) AS score,
            score_raw >= 0 AS accept
          FROM w ORDER BY doc_id""",

    // Trained PQ rebuilt in SQL: q114's fixed-point Lloyd's unrolled
    // PER SUBSPACE (rows are (vec, s) pairs, clusters partitioned by
    // s), seeds = the 16 lowest vec_ids' subvectors, two floor-mean
    // updates, then encode, reconstruct, integer ADC rank, exact cosine
    // on survivors. ADC is an exact integer so summation order never
    // matters; only the final cosine rounds.
    "q118_pq_ann" ->
      """WITH q AS (SELECT vec_id,
             list_transform(range(1, 65), i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS emb,
             list_transform(range(1, 65), i ->
               CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
           FROM embeddings),
         sv AS (SELECT vec_id, s,
                list_transform(range(1, 9), j -> qv[CAST(s * 8 + j AS INT)]) AS v
                FROM q, range(0, 8) t(s)),
         c0 AS (SELECT s, vec_id AS cl, v AS cv FROM sv WHERE vec_id < 16),
         a0 AS (SELECT vec_id, s, v, cl,
                row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cl) AS rk
                FROM (SELECT x.vec_id, x.s, x.v, c.cl,
                       list_sum(list_transform(range(1, 9), j ->
                         (x.v[CAST(j AS INT)] - c.cv[CAST(j AS INT)]) *
                         (x.v[CAST(j AS INT)] - c.cv[CAST(j AS INT)]))) AS dist
                      FROM sv x JOIN c0 c ON x.s = c.s)),
         c1 AS (SELECT s, cl, list(cv ORDER BY j) AS cv FROM (
                 SELECT a.s, a.cl, j,
                   CAST(floor(sum(a.v[CAST(j AS INT)]) * 1.0 / count(*) + 0.5) AS BIGINT) AS cv
                 FROM a0 a, range(1, 9) t(j) WHERE a.rk = 1 GROUP BY a.s, a.cl, j)
                GROUP BY s, cl),
         a1 AS (SELECT vec_id, s, v, cl,
                row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cl) AS rk
                FROM (SELECT x.vec_id, x.s, x.v, c.cl,
                       list_sum(list_transform(range(1, 9), j ->
                         (x.v[CAST(j AS INT)] - c.cv[CAST(j AS INT)]) *
                         (x.v[CAST(j AS INT)] - c.cv[CAST(j AS INT)]))) AS dist
                      FROM sv x JOIN c1 c ON x.s = c.s)),
         c2 AS (SELECT s, cl, list(cv ORDER BY j) AS cv FROM (
                 SELECT a.s, a.cl, j,
                   CAST(floor(sum(a.v[CAST(j AS INT)]) * 1.0 / count(*) + 0.5) AS BIGINT) AS cv
                 FROM a1 a, range(1, 9) t(j) WHERE a.rk = 1 GROUP BY a.s, a.cl, j)
                GROUP BY s, cl),
         a2 AS (SELECT vec_id, s, cl,
                row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cl) AS rk
                FROM (SELECT x.vec_id, x.s, c.cl,
                       list_sum(list_transform(range(1, 9), j ->
                         (x.v[CAST(j AS INT)] - c.cv[CAST(j AS INT)]) *
                         (x.v[CAST(j AS INT)] - c.cv[CAST(j AS INT)]))) AS dist
                      FROM sv x JOIN c2 c ON x.s = c.s)),
         rec AS (SELECT a.vec_id, a.s, c.cv
                 FROM a2 a JOIN c2 c ON a.s = c.s AND a.cl = c.cl WHERE a.rk = 1),
         ivfd AS (SELECT vec_id,
                  list_transform(range(0, 16), k -> list_sum(list_transform(range(1, 65), i ->
                    emb[CAST(i AS INT)] *
                    (CASE WHEN (md5_number_lower('ivf_' || k::VARCHAR || '_' || (i-1)::VARCHAR) & 1) = 1
                          THEN 1.0 ELSE -1.0 END)))) AS dots
                  FROM q),
         ivfa AS (SELECT vec_id, k AS cell,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY dots[CAST(k AS INT) + 1] DESC, k) AS crk
                  FROM ivfd, range(0, 16) t9(k)),
         dcell AS (SELECT vec_id, cell FROM ivfa WHERE crk = 1),
         qcell AS (SELECT vec_id, cell FROM ivfa WHERE vec_id < 10 AND crk <= 4),
         padc AS (SELECT qs.vec_id AS qid, x.vec_id,
                  CAST(sum(list_sum(list_transform(range(1, 9), j ->
                      (qs.v[CAST(j AS INT)] - x.cv[CAST(j AS INT)]) *
                      (qs.v[CAST(j AS INT)] - x.cv[CAST(j AS INT)])))) AS BIGINT) AS adc
                  FROM rec x
                  JOIN dcell dc ON dc.vec_id = x.vec_id
                  JOIN (SELECT vec_id, s, v FROM sv WHERE vec_id < 10) qs
                    ON x.s = qs.s
                  JOIN qcell qc ON qc.vec_id = qs.vec_id AND qc.cell = dc.cell
                  WHERE x.vec_id <> qs.vec_id
                  GROUP BY qs.vec_id, x.vec_id),
         e2 AS (SELECT vec_id, emb,
                list_sum(list_transform(range(1, 65), i ->
                  emb[CAST(i AS INT)] * emb[CAST(i AS INT)])) AS ss
                FROM q),
         r AS (SELECT qid, vec_id, adc,
               CAST(row_number() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS BIGINT) AS rnk
               FROM padc)
         SELECT r.qid, r.rnk, r.vec_id, r.adc,
           round(list_sum(list_transform(range(1, 65), i ->
               a.emb[CAST(i AS INT)] * b.emb[CAST(i AS INT)])) / (sqrt(a.ss) * sqrt(b.ss)), 6) AS cos
         FROM r JOIN e2 a ON a.vec_id = r.qid JOIN e2 b ON b.vec_id = r.vec_id
         WHERE r.rnk <= 5 ORDER BY r.qid, r.rnk""",

    // HLL rebuilt: same md5 registers (idx = low 8 bits, rho = 49 -
    // bit-length of the next 48 bits via smear+popcount), register max
    // per (source, idx), integer-scaled harmonic sum, one identical
    // final FP expression.
    "q121_hll_distinct" ->
      s"""WITH tk AS (SELECT source, unnest(sh) AS tok FROM
                   (SELECT source, $shSql AS sh
                    FROM (SELECT source, $tokSql AS lst FROM documents)
                    WHERE len(lst) >= 3)),
          h0 AS (SELECT source, tok,
                 CAST(md5_number_lower('hll:' || tok) & 255 AS BIGINT) AS idx,
                 CAST((md5_number_lower('hll:' || tok) >> 8) & 281474976710655 AS BIGINT) AS w
                 FROM tk),
          s1 AS (SELECT *, w | (w >> 1) AS w1 FROM h0),
          s2 AS (SELECT *, w1 | (w1 >> 2) AS w2 FROM s1),
          s3 AS (SELECT *, w2 | (w2 >> 4) AS w3 FROM s2),
          s4 AS (SELECT *, w3 | (w3 >> 8) AS w4 FROM s3),
          s5 AS (SELECT *, w4 | (w4 >> 16) AS w5 FROM s4),
          s6 AS (SELECT *, w5 | (w5 >> 32) AS w6 FROM s5),
          r AS (SELECT source, idx, max(49 - bit_count(w6)) AS m
                FROM s6 GROUP BY source, idx),
          sreg AS (SELECT source,
                   CAST(sum(1::BIGINT << CAST(49 - m AS INT)) AS BIGINT)
                     + (256 - count(*)) * 562949953421312 AS s,
                   count(*) AS nr
                   FROM r GROUP BY source),
          ex AS (SELECT source, count(*) AS n_tokens,
                 count(DISTINCT tok) AS distinct_exact FROM tk GROUP BY source)
          SELECT ex.source, ex.n_tokens, ex.distinct_exact,
            round(CASE WHEN nr < 256
                        AND 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 562949953421312.0 / s <= 640.0
                       THEN 256.0 * ln(256.0 / (256 - nr))
                       ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 562949953421312.0 / s
                  END, 3) AS hll_est
          FROM ex JOIN sreg USING (source) ORDER BY source""",

    // Curation v2 rebuilt: the same four stages chained as CTEs —
    // BPE training unrolled: 6 pair-count/argmax/apply rounds. The
    // greedy left-to-right merge is a list_reduce over a
    // space-delimited string accumulator — collapsing the trailing
    // symbol when (trailing == lhs, next == rhs), which reproduces the
    // kernel's fold exactly (merged symbols stop matching lhs, so runs
    // merge non-overlapping).
    "q130_bpe_train" -> bpeOracleSql(6),

    // Corpus tokenization with the trained merges: same rounds, final
    // apply included, per-source stats over occurrences.
    "q131_bpe_tokenize" -> bpeTokenizeOracleSql(6),

    // DSIR rebuilt: hashed-unigram counts for target (= min source)
    // and raw in one conditional agg, Laplace-smoothed llr per bucket
    // over a 256-row spine, per-doc avg llr via the bucket join the
    // engine replaces with a plan-literal lookup, top-100.
    "q132_dsir_select" ->
      s"""WITH tk AS (SELECT doc_id, source,
              CAST(md5_number_lower('dsir:' || tok) & 255 AS BIGINT) AS b
            FROM (SELECT doc_id, source, unnest($tokSql) AS tok
                  FROM documents WHERE $hasTokensSql)),
          cn AS (SELECT b, count(*) AS cr,
              sum(CASE WHEN source = (SELECT min(source) FROM documents)
                  THEN 1 ELSE 0 END) AS ct
            FROM tk GROUP BY b),
          tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM cn),
          llr AS (SELECT sp.range AS b,
              ln((coalesce(cn.ct, 0) + 1.0) / ((SELECT nt FROM tot) + 256.0))
            - ln((coalesce(cn.cr, 0) + 1.0) / ((SELECT nr FROM tot) + 256.0)) AS v
            FROM range(0, 256) sp LEFT JOIN cn ON cn.b = sp.range),
          sc AS (SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
              round(sum(llr.v) / count(*), 6) AS llr_avg
            FROM tk JOIN llr ON tk.b = llr.b GROUP BY tk.doc_id)
          SELECT doc_id, n_tokens, llr_avg FROM sc
          ORDER BY llr_avg DESC, doc_id LIMIT 100""",

    // Batch-perceptron training unrolled: five margin/misclassified/
    // gradient/update rounds over integer hashed features — the whole
    // trajectory is exact integer arithmetic on both sides.
    "q133_train_classifier" -> perceptronOracleSql(5),

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

    // Coarse-to-fine rebuilt: JL-project (integer dots), Rademacher
    // cells over the 16-d projection, q57's probe/join/re-rank tail
    // with the exact cosine on the ORIGINAL 64-d embedding.
    "q137_coarse_to_fine" ->
      """WITH pj AS (SELECT vec_id, embedding,
             list_transform(range(0, 16), j -> CAST(list_sum(list_transform(range(1, 65), i ->
               (CASE WHEN (md5_number_lower('jl:' || j::VARCHAR || ':' || (i-1)::VARCHAR) & 1) = 0
                     THEN 1 ELSE -1 END)
               * CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 10000 + 0.5) AS BIGINT)))
               AS DOUBLE)) AS p,
             list_sum(list_transform(range(1, 65), i ->
               CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS ss
           FROM embeddings),
         c AS (SELECT vec_id, embedding, ss,
             list_transform(range(0, 16), k -> list_sum(list_transform(range(1, 17), i ->
               p[CAST(i AS INT)] *
               (CASE WHEN (md5_number_lower('ivf_' || k::VARCHAR || '_' || (i-1)::VARCHAR) & 1) = 1
                     THEN 1.0 ELSE -1.0 END)))) AS dots
           FROM pj),
         d AS (SELECT vec_id, embedding, ss, k, dots[CAST(k AS INT) + 1] AS dot
               FROM c, range(0, 16) t(k)),
         asg AS (SELECT vec_id, embedding, ss, k AS cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, k) AS rk FROM d),
         data AS (SELECT vec_id, embedding, ss, cell FROM asg WHERE rk = 1),
         probes AS (SELECT vec_id AS qid, embedding AS qe, ss AS qss, cell
                    FROM asg WHERE vec_id < 10 AND rk <= 4),
         p AS (SELECT pr.qid, e.vec_id,
                round(list_sum(list_transform(range(1, 65), i ->
                    CAST(pr.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                  / (sqrt(pr.qss) * sqrt(e.ss)), 6) AS cos
               FROM data e JOIN probes pr ON e.cell = pr.cell AND e.vec_id <> pr.qid),
         r AS (SELECT qid, vec_id, cos,
               CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk FROM p)
         SELECT qid, rnk, vec_id, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk""",

    // Stupid backoff rebuilt: one trigram stream with conditional
    // train-count windows, eval rows filtered after, the same
    // three-branch CASE and +1-smoothed unigram floor.
    "q136_stupid_backoff" ->
      s"""WITH t AS (SELECT doc_id,
              (md5_number_lower('split:' || CAST(doc_id AS VARCHAR)) & 1023) < 819 AS tr,
              $tokSql AS lst FROM documents),
          tg AS (SELECT doc_id, tr, g.a AS a, g.b AS b, g.c AS c
            FROM (SELECT doc_id, tr,
                unnest(list_transform(range(1, len(lst) - 1), i ->
                  struct_pack(a := lst[CAST(i AS INT)],
                              b := lst[CAST(i AS INT) + 1],
                              c := lst[CAST(i AS INT) + 2]))) AS g
              FROM t WHERE len(lst) >= 3)),
          n AS (SELECT sum(CASE WHEN tr THEN 1 ELSE 0 END) AS n FROM tg),
          w AS (SELECT doc_id, tr, a, b, c,
              sum(CASE WHEN tr THEN 1 ELSE 0 END) OVER (PARTITION BY c) AS c_c,
              sum(CASE WHEN tr THEN 1 ELSE 0 END) OVER (PARTITION BY b, c) AS c_bc,
              sum(CASE WHEN tr THEN 1 ELSE 0 END) OVER (PARTITION BY a, b, c) AS c_abc,
              sum(CASE WHEN tr THEN 1 ELSE 0 END) OVER (PARTITION BY a, b) AS c_ab
            FROM tg)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pos,
            CAST(sum(CASE WHEN c_abc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
            CAST(sum(CASE WHEN c_abc = 0 AND c_bc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi,
            CAST(sum(CASE WHEN c_abc = 0 AND c_bc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni,
            round(avg(-log2(
              CASE WHEN c_abc > 0 THEN c_abc * 1.0 / c_ab
                   WHEN c_bc > 0 THEN 0.4 * c_bc / c_c
                   ELSE 0.16 * (c_c + 1.0) / ((SELECT n FROM n) + 1) END)), 6)
              AS avg_backoff_bits
          FROM w WHERE NOT tr GROUP BY doc_id ORDER BY doc_id""",

    // PMI rebuilt: the same bigram-type counts, window marginals and
    // natural log over exact integer ratios.
    "q135_pmi_collocations" ->
      s"""WITH pr AS (SELECT pr.a AS a, pr.b AS b
            FROM (SELECT unnest(list_transform(range(1, len(lst)), i ->
                struct_pack(a := lst[CAST(i AS INT)], b := lst[CAST(i AS INT) + 1]))) AS pr
              FROM (SELECT $tokSql AS lst FROM documents) WHERE len(lst) >= 2)),
          c AS (SELECT a, b, count(*) AS cnt FROM pr GROUP BY 1, 2),
          m AS (SELECT a, b, cnt,
              sum(cnt) OVER (PARTITION BY a) AS ca,
              sum(cnt) OVER (PARTITION BY b) AS cb,
              (SELECT sum(cnt) FROM c) AS n FROM c)
          SELECT a, b, CAST(cnt AS BIGINT) AS cnt,
            round(ln(cnt * n * 1.0 / (ca * cb)), 6) AS pmi
          FROM m WHERE cnt >= 5
          ORDER BY pmi DESC, a, b LIMIT 20""",

    // JL projection rebuilt: the same md5-derived +-1 signs and
    // integer dot products, one SQL expression per output component.
    "q134_jl_project" -> {
      val comps = (0 until 16).map { j =>
        s"""CAST(list_sum(list_transform(range(1, 65), i ->
             (CASE WHEN md5_number_lower('jl:$j:' || CAST(i - 1 AS VARCHAR)) & 1 = 0
                   THEN 1 ELSE -1 END)
             * CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 10000 + 0.5) AS BIGINT)))
           AS BIGINT) AS p$j"""
      }.mkString(",\n            ")
      s"""SELECT vec_id,
            $comps
          FROM embeddings ORDER BY vec_id"""
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

    // 64-permutation MinHash with the identical universal-hash grid
    // ((a_p*h + b_p) mod 2^31-1, constants from md5 of "mha:"/"mhb:"),
    // plus the exact distinct-shingle Jaccard per source pair.
    "q129_source_minhash" ->
      s"""WITH t AS (SELECT source, unnest(sh) AS g FROM
                  (SELECT source, $shSql AS sh
                   FROM (SELECT source, $tokSql AS lst FROM documents)
                   WHERE len(lst) >= 3)),
          hs AS (SELECT source,
                 CAST(md5_number_lower('mh:' || g) & 2147483647 AS BIGINT) AS h
                 FROM t),
          pc AS (SELECT p,
                 CAST((md5_number_lower('mha:' || p::VARCHAR) & 2147483647)
                   % 2147483646 + 1 AS BIGINT) AS a,
                 CAST(md5_number_lower('mhb:' || p::VARCHAR) & 2147483647 AS BIGINT) AS b
                 FROM range(0, 64) r(p)),
          grid AS (SELECT source, p, (a * h + b) % 2147483647 AS v FROM hs, pc),
          sig AS (SELECT source, p, min(v) AS mn FROM grid GROUP BY source, p),
          m AS (SELECT a.source AS source_a, b.source AS source_b,
                CAST(sum(CASE WHEN a.mn = b.mn THEN 1 ELSE 0 END) AS BIGINT) AS matches
                FROM sig a JOIN sig b ON a.p = b.p AND a.source < b.source
                GROUP BY 1, 2),
          sets AS (SELECT DISTINCT source, g FROM t),
          sz AS (SELECT source, count(*) AS n FROM sets GROUP BY source),
          iv AS (SELECT x.source AS source_a, y.source AS source_b,
                 count(*) AS inter
                 FROM sets x JOIN sets y ON x.g = y.g AND x.source < y.source
                 GROUP BY 1, 2)
          SELECT m.source_a, m.source_b, m.matches,
            round(m.matches / 64.0, 6) AS est_jaccard,
            round(coalesce(iv.inter, 0) * 1.0 /
              (sa.n + sb.n - coalesce(iv.inter, 0)), 6) AS exact_jaccard
          FROM m
          JOIN sz sa ON sa.source = m.source_a
          JOIN sz sb ON sb.source = m.source_b
          LEFT JOIN iv ON iv.source_a = m.source_a AND iv.source_b = m.source_b
          ORDER BY m.source_a, m.source_b""",

    // Expected media-header fields recomputed ARITHMETICALLY from the
    // source columns — independent of MediaKernel's encoder AND parser,
    // so a shared endianness/layout bug on the Spark side cannot cancel.
    // payload_bytes pins the encoder's structural layout (PNG: 8 sig +
    // 25 IHDR + 12 IDAT + 12 IEND = 57; WAV: canonical 44).
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

    // Histogram-quantile sketch rebuilt: identical bucket expression,
    // cumulative window, lower-edge estimator; quantile_cont is the
    // exact-audit pairing q18 already pins.
    "q124_quantile_sketch" ->
      """WITH b AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
          e AS (SELECT event_type, value FROM events),
          bin AS (SELECT event_type,
                  CASE WHEN vmax = vmin THEN 0
                       ELSE least(255, CAST(floor((value - vmin) / (vmax - vmin) * 256) AS INT))
                  END AS bucket
                  FROM e, b),
          hist AS (SELECT event_type, bucket, count(*) AS cnt
                   FROM bin GROUP BY event_type, bucket),
          c AS (SELECT event_type, bucket, cnt,
                sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
                sum(cnt) OVER (PARTITION BY event_type) AS n FROM hist),
          sel AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
                  min(CASE WHEN cum >= ceil(0.5 * n) THEN bucket END) AS b50,
                  min(CASE WHEN cum >= ceil(0.9 * n) THEN bucket END) AS b90,
                  min(CASE WHEN cum >= ceil(0.99 * n) THEN bucket END) AS b99
                  FROM c GROUP BY event_type),
          ex AS (SELECT event_type,
                 round(quantile_cont(value, 0.5), 6) AS exact_p50,
                 round(quantile_cont(value, 0.9), 6) AS exact_p90,
                 round(quantile_cont(value, 0.99), 6) AS exact_p99
                 FROM e GROUP BY event_type)
          SELECT s2.event_type, s2.n,
            round(vmin + b50 * (vmax - vmin) / 256, 6) AS est_p50, exact_p50,
            round(vmin + b90 * (vmax - vmin) / 256, 6) AS est_p90, exact_p90,
            round(vmin + b99 * (vmax - vmin) / 256, 6) AS est_p99, exact_p99
          FROM sel s2 JOIN ex USING (event_type) CROSS JOIN b
          ORDER BY event_type""",

    // Frame sampling rebuilt: same stride-128 offsets, then q40's
    // high-nibble hex histogram per frame. DuckDB v1.0 has no BLOB
    // substring, so the oracle slices the STRING and encodes the slice
    // — byte-identical here because the fixture text is ASCII (the
    // engine side stays byte-addressed on BinaryType regardless).
    "q123_multimodal_frames" ->
      """WITH p AS (SELECT doc_id, text,
               CAST(octet_length(encode(text)) AS BIGINT) AS n
             FROM documents WHERE octet_length(encode(text)) > 0),
          f0 AS (SELECT doc_id, text,
                 unnest(range(0, (n - 1) // 128 + 1)) AS k FROM p),
          f AS (SELECT doc_id, k AS frame_id, k * 128 AS off,
                encode(substring(text, CAST(k * 128 + 1 AS INT), 64)) AS frame
                FROM f0),
          h AS (SELECT doc_id, frame_id, off,
                CAST(octet_length(frame) AS BIGINT) AS frame_bytes,
                regexp_replace(hex(frame), '(.)(.)', '\1', 'g') AS hn FROM f)
          SELECT doc_id, frame_id, off, frame_bytes,
            array_to_string(list_transform(range(0, 16), b ->
              length(hn) - length(replace(hn, substr('0123456789ABCDEF', CAST(b AS INT) + 1, 1), ''))), ',') AS features
          FROM h ORDER BY doc_id, frame_id""",

    // CMS rebuilt: ONE md5 per occurrence, the 4 row indexes via
    // Kirsch-Mitzenmacher double hashing (h1 + d*h2 mod 1024, h2 forced
    // odd) — exact top-50, min-over-rows probe, integers end to end.
    "q122_cms_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest($tokSql) AS tok FROM documents),
          hs AS (SELECT tok,
                 CAST(md5_number_lower('cms:' || tok) & 4294967295 AS BIGINT) AS h1,
                 CAST((md5_number_lower('cms:' || tok) >> 32) | 1 AS BIGINT) AS h2
                 FROM tk),
          grid AS (SELECT tok, d, (h1 + d * h2) & 1023 AS idx
                   FROM hs, range(0, 4) t(d)),
          cells AS (SELECT d, idx, count(*) AS cell FROM grid GROUP BY d, idx),
          ex AS (SELECT tok, count(*) AS exact FROM tk GROUP BY tok),
          t50 AS (SELECT * FROM (SELECT tok, exact,
                   CAST(row_number() OVER (ORDER BY exact DESC, tok) AS BIGINT) AS rnk
                   FROM ex) WHERE rnk <= 50),
          probe AS (SELECT t.rnk, t.tok, t.exact, d,
                    (CAST(md5_number_lower('cms:' || t.tok) & 4294967295 AS BIGINT)
                     + d * CAST((md5_number_lower('cms:' || t.tok) >> 32) | 1 AS BIGINT)) & 1023 AS idx
                    FROM t50 t, range(0, 4) r2(d)),
          est AS (SELECT p.rnk, p.tok, p.exact, min(c.cell) AS cms_est
                  FROM probe p JOIN cells c ON c.d = p.d AND c.idx = p.idx
                  GROUP BY p.rnk, p.tok, p.exact)
          SELECT rnk, tok, exact, cms_est, cms_est - exact AS overcount
          FROM est ORDER BY rnk""",

    // Hybrid RRF rebuilt: the exact-Jaccard lexical top-20 (shared-gram
    // candidates), q57's IVF probe machinery for the semantic top-20,
    // and 1/(60+rank) fusion — ranks are exact ints, so the fused
    // doubles match bit-for-bit before the display rounding.
    "q120_hybrid_rrf" ->
      s"""WITH t AS (SELECT doc_id, $shSql AS sh
                     FROM (SELECT doc_id, $tokSql AS lst FROM documents) WHERE len(lst) >= 3),
          qd AS (SELECT doc_id AS qid, sh AS qsh FROM t WHERE doc_id < 10),
          cand AS (SELECT DISTINCT qg.qid, dg.doc_id
                   FROM (SELECT doc_id, unnest(sh) AS g FROM t) dg
                   JOIN (SELECT qid, unnest(qsh) AS g FROM qd) qg USING (g)
                   WHERE dg.doc_id <> qg.qid),
          lex0 AS (SELECT c.qid, c.doc_id,
                   CAST(len(list_intersect(dd.sh, q.qsh)) AS DOUBLE)
                     / len(list_distinct(list_concat(dd.sh, q.qsh))) AS jacc
                   FROM cand c JOIN t dd ON dd.doc_id = c.doc_id
                   JOIN qd q ON q.qid = c.qid),
          lexr AS (SELECT qid, doc_id AS id,
                   CAST(row_number() OVER (PARTITION BY qid ORDER BY jacc DESC, doc_id) AS BIGINT) AS lex_rnk
                   FROM lex0),
          lex AS (SELECT * FROM lexr WHERE lex_rnk <= 20),
          c AS (SELECT vec_id, embedding,
              list_transform(range(0, 16), k -> list_sum(list_transform(range(1, 65), i ->
                CAST(embedding[i] AS DOUBLE) *
                (CASE WHEN (md5_number_lower('ivf_' || k::VARCHAR || '_' || (i-1)::VARCHAR) & 1) = 1
                      THEN 1.0 ELSE -1.0 END)))) AS dots,
              list_sum(list_transform(range(1, 65), i ->
                CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS ss
            FROM embeddings),
          d2 AS (SELECT vec_id, embedding, ss, k, dots[CAST(k AS INT) + 1] AS dot
                 FROM c, range(0, 16) t2(k)),
          asg AS (SELECT vec_id, embedding, ss, k AS cell,
                  row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, k) AS rk FROM d2),
          data AS (SELECT vec_id, embedding, ss, cell FROM asg WHERE rk = 1),
          probes AS (SELECT vec_id AS qid, embedding AS qe, ss AS qss, cell
                     FROM asg WHERE vec_id < 10 AND rk <= 4),
          sem0 AS (SELECT pr.qid, e.vec_id,
                   round(list_sum(list_transform(range(1, 65), i ->
                       CAST(pr.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                     / (sqrt(pr.qss) * sqrt(e.ss)), 6) AS cos
                  FROM data e JOIN probes pr ON e.cell = pr.cell AND e.vec_id <> pr.qid),
          semr AS (SELECT qid, vec_id AS id,
                   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS sem_rnk
                   FROM sem0),
          sem AS (SELECT * FROM semr WHERE sem_rnk <= 20),
          fused AS (SELECT coalesce(l.qid, s2.qid) AS qid, coalesce(l.id, s2.id) AS id,
                    l.lex_rnk, s2.sem_rnk,
                    round(coalesce(1.0 / (60 + l.lex_rnk), 0.0)
                        + coalesce(1.0 / (60 + s2.sem_rnk), 0.0), 6) AS rrf
                    FROM lex l FULL OUTER JOIN sem s2
                      ON l.qid = s2.qid AND l.id = s2.id),
          r AS (SELECT qid, id, lex_rnk, sem_rnk, rrf,
                CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id) AS BIGINT) AS rnk
                FROM fused)
          SELECT qid, rnk, id, coalesce(lex_rnk, 0) AS lex_rnk,
            coalesce(sem_rnk, 0) AS sem_rnk, rrf
          FROM r WHERE rnk <= 10 ORDER BY qid, rnk""",

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

    // 16-token blocks, global keep-first by (doc_id, idx), reassembly
    // in index order; string_agg skips the NULLed dropped blocks.
    "q117_block_dedup" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
          b0 AS (SELECT doc_id, toks,
                  unnest(range(0, CAST(ceil(len(toks) / 16.0) AS BIGINT))) AS idx
                 FROM t WHERE len(toks) > 0),
          b AS (SELECT doc_id, idx,
                  array_to_string(list_slice(toks,
                    CAST(idx AS INT) * 16 + 1, CAST(idx AS INT) * 16 + 16), ' ') AS blk
                FROM b0),
          k AS (SELECT doc_id, idx, blk,
                row_number() OVER (PARTITION BY blk ORDER BY doc_id, idx) AS rn FROM b)
          SELECT doc_id, count(*) AS n_blocks,
            CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
            coalesce(string_agg(CASE WHEN rn = 1 THEN blk END, ' ' ORDER BY idx), '') AS clean_text
          FROM k GROUP BY doc_id ORDER BY doc_id""")
}
