package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming deduplication for a continuously-ingested document corpus:
  * the streaming halves of the batch dedup family (q30/q38).
  *
  * Scale notes:
  *   - Exact dedup rides Spark's dropDuplicatesWithinWatermark: state is
  *     one entry per distinct hash inside the watermark horizon and is
  *     evicted by event time — bounded by ingest rate x horizon, not by
  *     corpus size.
  *   - Near-dup keeps per-(band, key) buckets in the state store with a
  *     hard cap per bucket: a new document compares against at most
  *     maxPerBucket signatures in each of its bands (the streaming form
  *     of the batch band join's bucket cap). State is 16 bytes per
  *     retained signature.
  */
object DedupStreams {

  /** Streaming exact dedup by content hash within a watermark horizon.
    * Input must carry an event-time column named `event_time`. */
  def exactDedup(docs: DataFrame, hashCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(Seq(hashCol))

  /** One document signature exploded to one row per band. */
  final case class BandedSig(doc_id: Long, sig: Long, band_id: Int, band_key: Long)
  /** An emitted near-duplicate hit (may repeat across bands — dedup
    * downstream with dropDuplicates on (doc_id, matched_doc)). */
  final case class NearDup(doc_id: Long, matched_doc: Long, hamming: Int)

  /** Explode a doc_id + simhash frame into per-band rows (4 x 16-bit
    * bands, the batch q38 banding). */
  def bandSigs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("sig"),
      explode(expr(
        """transform(sequence(0, 3), b -> struct(CAST(b AS int) AS band_id,
          shiftrightunsigned(sig, cast(b * 16 AS int)) & 65535 AS band_key))""")).as("bd"))
      .select(col("doc_id"), col("sig"),
        col("bd.band_id").as("band_id"), col("bd.band_key").as("band_key"))

  /** Stateful streaming simhash near-dup: per (band, key) bucket, a new
    * signature is compared against the bucket's retained members; hits
    * within maxHamming are emitted as they stream in. */
  def simhashNearDup(banded: Dataset[BandedSig], maxPerBucket: Int = 64,
      maxHamming: Int = 6): Dataset[NearDup] = {
    import banded.sparkSession.implicits._
    banded
      .groupByKey(d => (d.band_id, d.band_key))
      .flatMapGroupsWithState[Vector[(Long, Long)], NearDup](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[BandedSig], state: GroupState[Vector[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Vector.empty)
          val out = Vector.newBuilder[NearDup]
          rows.foreach { d =>
            seen.foreach { case (id, sig) =>
              if (id != d.doc_id) {
                val h = java.lang.Long.bitCount(sig ^ d.sig)
                if (h <= maxHamming)
                  out += NearDup(d.doc_id, id, h)
              }
            }
            // keep-FIRST representative cap — same policy as the TWS
            // processor below and the batch q31 cap, so both streaming
            // variants retain the same members (and emit the same pairs)
            // under bucket overflow
            if (!seen.exists(_._1 == d.doc_id) && seen.length < maxPerBucket)
              seen = seen :+ (d.doc_id -> d.sig)
          }
          state.update(seen)
          out.result().iterator
      }
  }

  /** The same banded near-dup on the transformWithState API: the bucket
    * members live in a ListState (RocksDB appends instead of
    * read-modify-write of one blob) and an optional TTL evicts stale
    * buckets — at corpus-ingest scale the state store holds
    * O(active buckets x cap) 16-byte entries, and a bucket that goes
    * cold for longer than the TTL costs nothing forever after. */
  final class NearDupProcessor(maxPerBucket: Int, maxHamming: Int,
      ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, Long), BandedSig, NearDup] {
    import org.apache.spark.sql.streaming.{ListState, TTLConfig, TimeMode, TimerValues}
    import org.apache.spark.sql.{Encoders, streaming}
    @transient private var members: ListState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttlConf =
        if (ttl == null || ttl.isZero) TTLConfig.NONE else TTLConfig(ttl)
      members = getHandle.getListState[(Long, Long)]("members",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), ttlConf)
    }

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandedSig],
        timerValues: TimerValues): Iterator[NearDup] = {
      // keep-first representative cap (ListState appends are cheap;
      // eviction is the TTL's job) — same policy as the batch q31 cap
      var seen = members.get().toVector
      val out = Vector.newBuilder[NearDup]
      rows.foreach { d =>
        seen.foreach { case (id, sig) =>
          if (id != d.doc_id) {
            val h = java.lang.Long.bitCount(sig ^ d.sig)
            if (h <= maxHamming) out += NearDup(d.doc_id, id, h)
          }
        }
        if (!seen.exists(_._1 == d.doc_id) && seen.length < maxPerBucket) {
          seen = seen :+ (d.doc_id -> d.sig)
          members.appendValue(d.doc_id -> d.sig)
        }
      }
      out.result().iterator
    }
  }

  /** Streaming simhash near-dup via transformWithState (RocksDB state
    * store required). `ttl` null/zero keeps buckets forever. */
  def simhashNearDupTws(banded: Dataset[BandedSig], maxPerBucket: Int = 64,
      maxHamming: Int = 6, ttl: java.time.Duration = null): Dataset[NearDup] = {
    import banded.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val timeMode =
      if (ttl == null || ttl.isZero) TimeMode.None()
      else TimeMode.ProcessingTime()
    banded
      .groupByKey(d => (d.band_id, d.band_key))
      .transformWithState(new NearDupProcessor(maxPerBucket, maxHamming, ttl),
        timeMode, OutputMode.Append())
  }

  /** One MinHash signature exploded to one row per band (16 x 4 of the
    * 64 permutations — the batch q31 banding). */
  final case class MinhashBanded(doc_id: Long, sig: Array[Long],
      band_id: Int, band_key: Long)
  /** An emitted MinHash near-dup candidate with its signature-estimated
    * Jaccard (the streaming stand-in for batch q31's exact verify: the
    * shingle sets would have to live in state to verify exactly, so the
    * estimator — matching permutations / 64 — decides instead; with 64
    * permutations its std-err at J=0.9 is ~0.04). */
  final case class MinhashDup(doc_id: Long, matched_doc: Long, est_jaccard: Double)

  /** Explode (doc_id, sig: 64 minhashes) into per-band rows using the
    * batch q31 banding: band key = xxhash64 of the band's 4 signature
    * values, seeded by the band id. */
  def minhashBandSigs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("sig"),
      explode(expr(
        """transform(sequence(0, 15), b -> struct(CAST(b AS int) AS band_id,
          xxhash64(slice(sig, b * 4 + 1, 4), b) AS band_key))""")).as("bd"))
      .select(col("doc_id"), col("sig"),
        col("bd.band_id").as("band_id"), col("bd.band_key").as("band_key"))

  /** Stateful streaming MinHash near-dup: per (band, key) bucket, a new
    * signature is compared against the bucket's retained members and
    * pairs whose estimated Jaccard clears the threshold are emitted as
    * they stream in. State is 64 longs per retained signature with the
    * same keep-first bucket cap as the batch band join. */
  def minhashNearDup(banded: Dataset[MinhashBanded], maxPerBucket: Int = 64,
      minJaccard: Double = 0.9): Dataset[MinhashDup] = {
    import banded.sparkSession.implicits._
    banded
      .groupByKey(d => (d.band_id, d.band_key))
      .flatMapGroupsWithState[Vector[(Long, Array[Long])], MinhashDup](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[MinhashBanded],
            state: GroupState[Vector[(Long, Array[Long])]]) =>
          var seen = state.getOption.getOrElse(Vector.empty)
          val out = Vector.newBuilder[MinhashDup]
          rows.foreach { d =>
            if (!seen.exists(_._1 == d.doc_id)) {
              seen.foreach { case (id, sig) =>
                var eq = 0
                var i = 0
                while (i < 64) { if (sig(i) == d.sig(i)) eq += 1; i += 1 }
                val est = eq / 64.0
                if (est >= minJaccard)
                  out += MinhashDup(math.max(d.doc_id, id), math.min(d.doc_id, id), est)
              }
              if (seen.size < maxPerBucket) seen = seen :+ (d.doc_id -> d.sig)
            }
          }
          state.update(seen)
          out.result().iterator
      }
  }

  /** A doc entering the packing stream: id, shard, token count. */
  final case class PackDoc(doc_id: Long, source: String, n_tokens: Long)
  /** One packed assignment — the streaming twin of a batch q88 row. */
  final case class PackedAssignment(doc_id: Long, source: String,
      n_tokens: Long, bin: Long, bin_offset: Long)

  /** Streaming greedy sequence packing: the incremental form of batch
    * q88. State per shard (source) is ONE long — the running token
    * count — so an ingest stream assigns every arriving doc its
    * context-window bin immediately and state never grows with
    * history. Docs are packed in doc_id order within each micro-batch;
    * like the batch operator, a global total order exists only per
    * shard, which is exactly why packing is sharded. */
  def packSequences(docs: Dataset[PackDoc], budget: Long = 256L): Dataset[PackedAssignment] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, PackedAssignment](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[PackDoc], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toVector.sortBy(_.doc_id).map { d =>
            val a = PackedAssignment(d.doc_id, src, d.n_tokens,
              cum / budget, cum % budget)
            cum += d.n_tokens
            a
          }
          state.update(cum)
          out.iterator
      }
  }

  /** A candidate document for budget-fill admission. `h` is the masked
    * md5 admission-order hash — compute it with the SAME column
    * expression as batch q101 so the two forms order identically. */
  final case class FillDoc(doc_id: Long, lang: String, n_tokens: Long, h: Long)
  /** An admitted document with its exact pre-admission running total —
    * the streaming twin of a batch q101 row. */
  final case class FillAdmission(doc_id: Long, lang: String,
      n_tokens: Long, prev_cum: Long)

  /** Streaming token-budget fill: the incremental form of batch q101.
    * State per language is ONE long — the running token total over
    * EVERY doc seen, admitted or not, exactly the batch prefix-sum
    * semantics — so a continuously-ingested corpus admits docs into
    * the per-language token budget immediately and state never grows
    * with history. Docs apply in (h, doc_id) order within each
    * micro-batch (the batch admission order); across micro-batches
    * arrival order stands in for hash order, the same ingest-order
    * contract as [[packSequences]] — identical output to batch q101
    * when ingest is hash-ordered or fits one batch
    * (EventStreamsSpec pins the parity). */
  def fillBudget(docs: Dataset[FillDoc], budget: Long = 5000L): Dataset[FillAdmission] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState[Long, FillAdmission](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[FillDoc], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toVector.sortBy(d => (d.h, d.doc_id)).flatMap { d =>
            val adm = if (cum < budget)
              Some(FillAdmission(d.doc_id, lang, d.n_tokens, cum))
            else None
            cum += d.n_tokens
            adm
          }
          state.update(cum)
          out.iterator
      }
  }

  /** Streaming benchmark decontamination: the online form of batch q90.
    * `docs` is a stream of (doc_id, event_time, sh: array<string>);
    * `evalGrams` is the STATIC distinct shingle set of the held-out
    * benchmark — stream-static joins re-resolve the static side per
    * micro-batch and broadcast it (it is small by construction), so the
    * ingest stream itself never shuffles for the membership test. A doc
    * is flagged the moment any of its shingles matches (left-semi on the
    * exploded grams); dropDuplicatesWithinWatermark collapses the
    * per-gram hits to one emission per doc with state bounded by
    * contaminated-docs-per-horizon, not corpus size. */
  def decontaminate(docs: DataFrame, evalGrams: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("event_time", watermark)
      .select(col("doc_id"), col("event_time"), explode(col("sh")).as("g"))
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .dropDuplicatesWithinWatermark(Seq("doc_id"))
      .select(col("doc_id"))

  /** Streaming twin of batch q108 (Pipeline.incrementalDedup): docs
    * arriving on a stream probe the STATIC band index of the existing
    * corpus — the continuous-ingest form of incremental dedup. Emits
    * the verified (new_doc, idx_doc, jaccard) dup pairs; an admitted
    * doc is one that emits nothing (absence isn't an event, so the
    * admit rollup stays a batch decision downstream). All three joins
    * are stream-static: the band probe, then the exact-Jaccard verify
    * against the existing side's shingles — banding and the 64-posting
    * bucket cap are the batch code (Pipeline.bandCol / bandIndex), so
    * the two forms flag identical pairs by construction. State is only
    * the within-watermark (new_doc, idx_doc) dedup of band-repeated
    * hits. Input must carry (doc_id, sh, event_time). */
  def incrementalDedup(docs: DataFrame, existing: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    import graft.queries.Pipeline
    val index = Pipeline.bandIndex(existing)
    val exSh = existing.select(col("doc_id").as("idx_doc"), col("sh").as("sh_i"))
    docs
      .withWatermark("event_time", watermark)
      .withColumn("sig", graft.functions.minhash_sig(col("sh")))
      .select(col("doc_id").as("new_doc"), col("sh").as("sh_n"),
        col("event_time"), Pipeline.bandCol.as("bd"))
      .join(index, "bd")
      .join(exSh, "idx_doc")
      .withColumn("jaccard",
        size(array_intersect(col("sh_n"), col("sh_i"))).cast("double") /
          size(array_union(col("sh_n"), col("sh_i"))))
      .filter(col("jaccard") >= 0.9)
      .dropDuplicatesWithinWatermark(Seq("new_doc", "idx_doc"))
      .select(col("new_doc"), col("idx_doc"), col("jaccard"))
  }

  /** Streaming twin of batch q224 (asymmetric near-containment join):
    * docs arriving on a stream probe the STATIC 64-capped container-
    * side inverted index of the existing corpus — the continuous-
    * ingest boilerplate/quotation detector. An arriving doc posts only
    * its ordered PREFIX (the pigeonhole witness set — shared batch
    * code, DedupQueries.containmentPrefixPostings), each row
    * independently, so the batch side's contained-prefix 64-cap (a
    * degenerate-corpus guard that binds only past shingle-df 64) has
    * no streaming analogue; wherever the cap doesn't bind, the two
    * forms flag identical pairs by construction (parity spec in
    * EventStreamsSpec). All joins are stream-static: the index probe
    * with the lossless 10*|B| >= 9*|A| length test, then exact-
    * containment verify against the container's full shingle set —
    * never all-pairs, and per arriving doc the probe fan-out is
    * bounded by prefix_len x 64. State is only the within-watermark
    * (contained, container) dedup of prefix-repeated hits. Input must
    * carry (doc_id, sh, event_time). */
  def containmentProbe(docs: DataFrame, existing: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    import graft.queries.DedupQueries
    val index = DedupQueries.containmentIndex(existing)
    val exSh = existing.select(col("doc_id").as("container_doc"),
      col("sh").as("sh_b"))
    DedupQueries.containmentPrefixPostings(
        docs.withWatermark("event_time", watermark),
        keep = Seq("sh", "event_time"))
      .join(index, "g")
      .select(col("doc_id").as("contained_doc"), col("sh").as("sh_a"),
        col("len"), col("event_time"), explode(col("mb")).as("b"))
      .filter(col("b.doc_id") =!= col("contained_doc") &&
        col("b.len") * 10 >= col("len") * 9)
      .select(col("contained_doc"), col("sh_a"), col("event_time"),
        col("b.doc_id").as("container_doc"))
      .join(exSh, "container_doc")
      .withColumn("containment",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(col("sh_a")))
      .filter(col("containment") >= 0.9)
      .dropDuplicatesWithinWatermark(Seq("contained_doc", "container_doc"))
      .select(col("contained_doc"), col("container_doc"), col("containment"))
  }

  /** One fixed-width token block of a streamed document (from
    * Pipeline.docBlocks — the identical segmentation as batch q117). */
  final case class DocBlock(doc_id: Long, idx: Int, blk: String)
  /** The keep/drop decision for one block: kept = this is the block
    * content's FIRST corpus occurrence. */
  final case class BlockDecision(doc_id: Long, idx: Int, blk: String, kept: Boolean)

  /** Streaming twin of batch q117 (block dedup + rewrite): blocks
    * arriving on a stream keep only their first corpus occurrence.
    * State per distinct block content is ONE boolean ("seen"), keyed by
    * the block text — at ingest scale the key would be a 64-bit content
    * hash instead of the text to shrink the state store, with identical
    * decisions modulo hash collisions. Within a micro-batch, rows sort
    * by (doc_id, idx) before deciding, so a batch replayed as one
    * micro-batch reproduces the batch operator's global keep-first
    * order; across micro-batches, arrival order IS corpus order (the
    * same ingest-order assumption as packSequences). The cleaned-text
    * reassembly stays a downstream per-doc rollup, exactly as in the
    * batch form. */
  def blockDedup(blocks: Dataset[DocBlock]): Dataset[BlockDecision] = {
    import blocks.sparkSession.implicits._
    blocks.groupByKey(_.blk)
      .flatMapGroupsWithState[Boolean, BlockDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[DocBlock], state: GroupState[Boolean]) =>
          var seen = state.getOption.getOrElse(false)
          val out = rows.toVector.sortBy(b => (b.doc_id, b.idx)).map { b =>
            val kept = !seen
            seen = true
            BlockDecision(b.doc_id, b.idx, b.blk, kept)
          }
          state.update(seen)
          out.iterator
      }
  }

  /** blockDedup on the transformWithState API (RocksDB state store):
    * one ValueState[Boolean] per block key with an optional TTL — the
    * form for UNBOUNDED block spaces, where "seen" entries for blocks
    * that stop recurring must eventually cost nothing. A TTL'd entry
    * that expires re-admits the next occurrence of that block (the
    * standard horizon trade every streaming dedup makes — same policy
    * as exactDedup's watermark). Decisions inside a micro-batch use the
    * same (doc_id, idx) order as the FMGWS twin, so the two variants
    * agree whenever state is within TTL (spec-pinned). */
  final class BlockDedupProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, DocBlock, BlockDecision] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttlConf =
        if (ttl == null || ttl.isZero) TTLConfig.NONE else TTLConfig(ttl)
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean, ttlConf)
    }

    override def handleInputRows(key: String, rows: Iterator[DocBlock],
        timerValues: TimerValues): Iterator[BlockDecision] = {
      var s = seen.exists()
      val out = rows.toVector.sortBy(b => (b.doc_id, b.idx)).map { b =>
        val kept = !s
        s = true
        BlockDecision(b.doc_id, b.idx, b.blk, kept)
      }
      // Refresh on EVERY batch that touches the key, not just the
      // first: with a TTL, `update` resets the expiry clock, so a hot
      // duplicate that keeps recurring stays deduped (sliding-recency
      // TTL) and only blocks unseen for a full `ttl` are re-admitted.
      // First-write-only would let hot duplicates expire mid-stream
      // and be silently re-admitted (ADVICE r9).
      seen.update(true)
      out.iterator
    }
  }

  /** Streaming block dedup via transformWithState; `ttl` null/zero
    * keeps block keys forever (exact corpus-lifetime dedup). A non-zero
    * `ttl` bounds state for endless streams with SLIDING-recency
    * semantics: the expiry clock resets on every batch that touches the
    * key, so recurring blocks stay deduped and only blocks idle for a
    * full `ttl` are forgotten (then re-admitted once). */
  def blockDedupTws(blocks: Dataset[DocBlock],
      ttl: java.time.Duration = null): Dataset[BlockDecision] = {
    import blocks.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val timeMode =
      if (ttl == null || ttl.isZero) TimeMode.None()
      else TimeMode.ProcessingTime()
    blocks.groupByKey(_.blk)
      .transformWithState(new BlockDedupProcessor(ttl), timeMode, OutputMode.Append())
  }

  /** One CDC record: an upsert (`op = "U"`, payload text/source) or a
    * delete tombstone (`op = "D"`) for a document key at a version. */
  final case class ChangeRow(doc_id: Long, text: String, source: String,
      ver: Long, op: String)
  /** The key's merged state after a micro-batch: `present = false`
    * means the latest version is a delete (the key is gone from the
    * logical snapshot). */
  final case class MergedDoc(doc_id: Long, ver: Long, content_hash: String,
      source: String, present: Boolean)

  /** Streaming twin of batch q156 (CDC apply-changes merge): change
    * records fold into ONE keep-highest-version record per key —
    * upserts replace the payload, tombstones flip `present` off — and
    * each micro-batch emits the key's post-batch state, so the latest
    * emission per key IS the merged snapshot row (a downstream
    * materializer upserts by doc_id; `present = false` rows delete).
    * State per key is one fixed-width record (ver + 32-hex hash +
    * source), independent of how many times the key churns. Within a
    * micro-batch, rows apply in version order (ties: keep-last, the
    * same `ver DESC` row_number winner as the batch window); version
    * regressions — a late change older than state — are ignored, which
    * is exactly the batch semantics where the window keeps the max
    * version. Parity with q156 is spec-pinned by replaying
    * snapshot-then-changes and comparing final states. */
  def applyChanges(changes: Dataset[ChangeRow]): Dataset[MergedDoc] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.doc_id)
      .flatMapGroupsWithState[MergedDoc, MergedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[ChangeRow], state: GroupState[MergedDoc]) =>
          var cur = state.getOption
            .getOrElse(MergedDoc(id, -1L, null, null, present = false))
          rows.toVector.sortBy(_.ver).foreach { c =>
            if (c.ver >= cur.ver)
              cur =
                if (c.op == "U")
                  MergedDoc(id, c.ver, md5Hex(c.text), c.source, present = true)
                else MergedDoc(id, c.ver, null, null, present = false)
          }
          state.update(cur)
          Iterator(cur)
      }
  }

  /** Hex md5 of a UTF-8 string — the same value as Spark's `md5(text
    * CAST AS BINARY)` and DuckDB's `md5(text)`, so streamed hashes
    * compare byte-equal against both batch engines. */
  private def md5Hex(s: String): String =
    if (s == null) null
    else graft.expressions.CryptoKernel.md5Bytes(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}
