package graft.expressions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Sketching/fingerprinting kernel for the LLM-data-pipeline operators
  * (dedup, lang-id). Pure JVM loops invoked from whole-stage codegen via
  * StaticInvoke — each call is O(tokens), no boxing of the token array
  * beyond ArrayData access.
  *
  * Algorithms are standard published constructions (Charikar's SimHash,
  * FNV-1a rolling hash, stopword-profile language ID); nothing here
  * derives from the reference engine, which has no dedup/similarity
  * surface (SURVEY.md §2.13).
  */
object SketchKernel {

  /** FNV-1a 64-bit over a UTF-8 string. */
  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lower 64 bits of MD5 (digest bytes 8..15, little-endian) — the same
    * convention as DuckDB's `md5_number_lower`, so every sketch built on
    * it is independently recomputable by the SQL oracle. */
  def md5Lower64(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h |= (d(8 + i) & 0xffL) << (8 * i); i += 1 }
    h
  }

  /** Charikar SimHash-64 over a token array: per bit, sum +1/-1 weighted
    * by token-hash bit, sign -> bit. Hamming distance of signatures
    * approximates cosine distance of the token multisets. Token hash is
    * md5-lower-64 (not FNV) so the DuckDB oracle reproduces it exactly. */
  def simhash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = md5Lower64(tokens.getUTF8String(i).getBytes)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) acc(k) += 1 else acc(k) -= 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) { if (acc(k) > 0) sig |= (1L << k); k += 1 }
    sig
  }

  /** q89 repetition kernel: occurrence stats over a document's word
    * n-grams in one row-local build-sort-scan pass. Returns [best, dup]:
    * the highest occurrence count of any single n-gram, and the total
    * occurrences belonging to n-grams that occur more than once. The
    * sort order itself is irrelevant (any total order makes equal grams
    * adjacent), so plain String order is fine. Codegen'd StaticInvoke —
    * the equivalent transform/array_sort/aggregate HOF chain measured
    * ~6x slower at sf0.1 (1.98 s vs 0.35 s; HOF lambdas don't
    * participate in whole-stage codegen). */
  def ngramRunStats(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    val m = cnt - n + 1
    if (m <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](0L, 0L))
    val grams = new Array[String](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + k).toString)
        k += 1
      }
      grams(i) = sb.toString
      i += 1
    }
    java.util.Arrays.sort(grams.asInstanceOf[Array[AnyRef]])
    var best = 0L
    var dup = 0L
    var run = 1L
    i = 1
    while (i <= m) {
      if (i < m && grams(i) == grams(i - 1)) run += 1
      else {
        if (run > best) best = run
        if (run > 1) dup += run
        run = 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](best, dup))
  }

  /** Distinct word n-gram shingles in one pass (vs a Catalyst
    * transform/slice/concat chain): preserves first-occurrence order,
    * empty when fewer than n tokens. */
  def wordShingles(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    if (cnt < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= cnt - n) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + k).toString)
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** 64-permutation MinHash signature in ONE pass over the shingle set:
    * one FNV-1a per shingle plus 64 cheap splitmix64-style derivations,
    * instead of 64 full string hashes per element. Returns the 64
    * per-permutation minima. Empty input -> Long.MaxValue sentinels
    * (can never collide into a band bucket pair with real signatures
    * only if both are empty — callers filter size>=n upstream). */
  def minhashSig(shingles: ArrayData): ArrayData = {
    val sig = Array.fill(64)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val base = fnv1a(shingles.getUTF8String(i).getBytes)
      var p = 0
      while (p < 64) {
        // splitmix64 finalizer over (base + odd-constant * p): an
        // independent-enough hash family for LSH banding
        var z = base + 0x9e3779b97f4a7c15L * (p + 1)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        if (z < sig(p)) sig(p) = z
        p += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig.map(java.lang.Long.valueOf(_): Any))
  }

  /** Left-to-right double dot product over two equal-length double
    * arrays — bit-identical to aggregate(zip_with(a, b, *), 0d, +) and
    * to the oracle's list_sum(list_transform(...)), but one tight JVM
    * loop instead of per-element Catalyst lambda dispatch. */
  /** 32-bit Morton code of two 16-bit values (x on even bit positions,
    * y on odd) — q144/q147's z-order key. A kernel rather than a
    * Column tree: the mask-and-shift spread references its input twice
    * per step, so the pure-expression form duplicates the normalized-
    * key subtree 16x per dimension and the blown-up tree then rides
    * into join keys, pushed filters, and every AQE re-plan (measured:
    * q147 5.4 s -> sub-second at sf0.1 from plan processing alone). */
  def morton16(x: Long, y: Long): Long = {
    def spread(v0: Long): Long = {
      var v = v0 & 0xffffL
      v = (v | (v << 8)) & 0x00ff00ffL
      v = (v | (v << 4)) & 0x0f0f0f0fL
      v = (v | (v << 2)) & 0x33333333L
      (v | (v << 1)) & 0x55555555L
    }
    spread(x) | (spread(y) << 1)
  }

  /** PQ subspace argmin codes (q114/q118's strict argmin as ONE kernel
    * loop instead of nSub x nClusters struct-least expressions per
    * row — the per-row hot path of PQ training assignment, encoding
    * and the ADC search build). `cents` is one inner array per
    * subspace, each a flat [cl, d_0..d_{subDim-1}]* table in ASCENDING
    * cl order. Distance = exact integer sum of squared diffs over the
    * subspace slice; ties keep the LOWEST cl — bit-identical to the
    * previous least(struct(dist, cl)...) expression form (spec-pinned
    * in PipelineSpec). */
  def pqCodes(qv: ArrayData, cents: ArrayData, subDim: Int): ArrayData = {
    val nSub = cents.numElements()
    val out = new Array[Long](nSub)
    var st = 0
    while (st < nSub) {
      val tab = cents.getArray(st)
      val stride = subDim + 1
      val m = tab.numElements() / stride
      // fail loudly on malformed centroid tables (ADVICE r15): an
      // empty subspace table or a length that is not a multiple of
      // (subDim + 1) used to silently emit Long.MaxValue codes /
      // silently truncate — the struct-least expression form this
      // kernel replaced failed at plan build instead
      require(m > 0 && tab.numElements() % stride == 0,
        s"pqCodes: subspace $st centroid table has ${tab.numElements()} " +
          s"elements, not a positive multiple of subDim+1=$stride")
      var best = Long.MaxValue
      var bestCl = Long.MaxValue
      var j = 0
      while (j < m) {
        val base = j * stride
        val cl = tab.getLong(base)
        var d = 0L
        var i = 0
        while (i < subDim) {
          val diff = qv.getLong(st * subDim + i) - tab.getLong(base + 1 + i)
          d += diff * diff
          i += 1
        }
        if (d < best || (d == best && cl < bestCl)) { best = d; bestCl = cl }
        j += 1
      }
      out(st) = bestCl
      st += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def dotProduct(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0d
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Rolling document fingerprint: FNV-1a chained over tokens in order
    * (order-sensitive, unlike the canonical sorted-token fingerprint). */
  def rollingFingerprint(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < n) {
      val b = tokens.getUTF8String(i).getBytes
      var j = 0
      while (j < b.length) { h ^= b(j) & 0xffL; h *= 0x100000001b3L; j += 1 }
      h ^= 0x1fL; h *= 0x100000001b3L // token boundary marker
      i += 1
    }
    h
  }

  // Stopword profiles for the n-gram/stopword language-ID heuristic.
  // Priority order for ties is the declaration order below (must match
  // the SQL oracle's CASE chain in queries/Pipeline.scala).
  private val profiles: Array[(String, Set[String])] = Array(
    "en" -> Set("the", "and", "of", "to", "in", "is", "a"),
    "de" -> Set("der", "die", "und", "ist", "das", "ein"),
    "es" -> Set("el", "la", "de", "que", "y", "los"),
    "fr" -> Set("le", "la", "et", "les", "des", "un"),
    "zh" -> Set("的", "是", "不", "我", "在", "了"))

  /** Language of a token array by max stopword hits; 'und' when no
    * profile matches. Deterministic tie-break by profile order. */
  def langId(tokens: ArrayData): UTF8String = {
    val n = tokens.numElements()
    val counts = new Array[Int](profiles.length)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i).toString
      var p = 0
      while (p < profiles.length) {
        if (profiles(p)._2.contains(t)) counts(p) += 1
        p += 1
      }
      i += 1
    }
    var best = 0
    var p = 1
    while (p < profiles.length) { if (counts(p) > counts(best)) best = p; p += 1 }
    UTF8String.fromString(if (counts(best) == 0) "und" else profiles(best)._1)
  }

  /** Stopword hit count for one profile (exposed so the lang-id score
    * itself is queryable/oracle-checkable). */
  def stopwordHits(tokens: ArrayData, lang: UTF8String): Long = {
    val set = profiles.collectFirst { case (l, s) if l == lang.toString => s }.getOrElse(Set.empty)
    val n = tokens.numElements()
    var c = 0L
    var i = 0
    while (i < n) { if (set.contains(tokens.getUTF8String(i).toString)) c += 1; i += 1 }
    c
  }

  // Rademacher hyperplane weights, lazily memoized per (plane, dim):
  // w(p, j) = +1 if md5_lower64("p_j") has its lowest bit set else -1 —
  // a published ±1 random-projection family, chosen over a float PRNG so
  // the DuckDB oracle derives the identical weight from md5_number_lower.
  private val planeW = new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Double]()
  private def rademacher(p: Int, j: Int): Double = {
    val key = p.toLong * 1000003L + j
    var w = planeW.get(key)
    if (w == null) {
      val bytes = (p.toString + "_" + j.toString).getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      w = java.lang.Double.valueOf(if ((md5Lower64(bytes) & 1L) == 1L) 1.0 else -1.0)
      planeW.putIfAbsent(key, w)
    }
    w.doubleValue()
  }

  /** Random-hyperplane sign bits for an embedding (Charikar LSH for
    * cosine): bit p = sign(<emb, r_p>) with r_p a ±1 Rademacher vector
    * derived from md5 (deterministic across executors, no RNG state;
    * oracle-recomputable). Left-to-right accumulation matches the
    * oracle's list_sum fold. The scale path for ANN: band the bits,
    * bucket-join, exact-verify candidates only. */
  // Dense per-(nbits, dims) hyperplane cache (same reasoning as
  // ivfMatrix below: no boxed CHM get inside the multiply loop).
  private val planeMat = new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()
  private def planeMatrix(nbits: Int, d: Int): Array[Array[Double]] = {
    val key = nbits.toLong << 32 | d.toLong
    var m = planeMat.get(key)
    if (m == null) {
      m = Array.tabulate(nbits, d)((p, j) => rademacher(p, j))
      planeMat.putIfAbsent(key, m)
    }
    m
  }

  def embedSignBits(emb: ArrayData, nbits: Int): Long = {
    val d = emb.numElements()
    val mat = planeMatrix(nbits, d)
    var sig = 0L
    var p = 0
    while (p < nbits) {
      val row = mat(p)
      var acc = 0d
      var j = 0
      while (j < d) {
        acc += emb.getDouble(j) * row(j)
        j += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  // IVF codebook: K Rademacher centroids c[k][j] = ±1 from
  // md5("ivf_k_j") & 1 — a fixed random codebook (cluster-pruned search
  // without a training pass), derivable by the DuckDB oracle exactly
  // like the hyperplanes above.
  private def ivfW(k: Int, j: Int): Double = {
    val key = 0x4000000000000000L + k.toLong * 1000003L + j
    var w = planeW.get(key)
    if (w == null) {
      val bytes = ("ivf_" + k + "_" + j).getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      w = java.lang.Double.valueOf(if ((md5Lower64(bytes) & 1L) == 1L) 1.0 else -1.0)
      planeW.putIfAbsent(key, w)
    }
    w.doubleValue()
  }

  // Dense per-(K, dims) codebook cache: the per-(k, j) CHM lookup above
  // is fine for building, but INSIDE the per-row loop it costs a boxed
  // map get per multiply (K=160, d=64 -> 10k gets/row; measured ~12x
  // slower than the dense walk at sf1). One CHM hit per row fetches the
  // whole primitive matrix instead.
  private val ivfMat = new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()
  private def ivfMatrix(nCells: Int, d: Int): Array[Array[Double]] = {
    val key = nCells.toLong << 32 | d.toLong
    var m = ivfMat.get(key)
    if (m == null) {
      m = Array.tabulate(nCells, d)((k, j) => ivfW(k, j))
      ivfMat.putIfAbsent(key, m)
    }
    m
  }

  private def ivfDots(emb: ArrayData, nCells: Int): Array[Double] = {
    val d = emb.numElements()
    val mat = ivfMatrix(nCells, d)
    val dots = new Array[Double](nCells)
    var k = 0
    while (k < nCells) {
      val row = mat(k)
      var acc = 0d
      var j = 0
      while (j < d) { acc += emb.getDouble(j) * row(j); j += 1 }
      dots(k) = acc
      k += 1
    }
    dots
  }

  /** IVF cell assignment: argmax over centroid dot products
    * (deterministic tie-break on the lower cell id). */
  def ivfCell(emb: ArrayData, nCells: Int): Int = {
    val dots = ivfDots(emb, nCells)
    var best = 0
    var k = 1
    while (k < nCells) { if (dots(k) > dots(best)) best = k; k += 1 }
    best
  }

  /** The nprobe closest cells for a query vector, best first (ties by
    * cell id) — the IVF probe list. */
  def ivfProbes(emb: ArrayData, nCells: Int, nprobe: Int): ArrayData = {
    val dots = ivfDots(emb, nCells)
    val order = (0 until nCells).sortBy(k => (-dots(k), k)).take(nprobe)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      order.map(java.lang.Integer.valueOf(_): Any).toArray)
  }

  /** q100 winnowing (Schleimer et al. 2003, the MOSS fingerprinter):
    * hash every k-gram (md5-lower-64 of the joined gram, so the DuckDB
    * oracle derives identical hashes), slide a window of w hashes, and
    * select each window's LEFTMOST minimum — a deterministic ~2/(w+1)
    * subsample that still guarantees any shared run of length >= w+k-1
    * contributes at least one common fingerprint. (Classic robust
    * winnowing picks the rightmost tie; leftmost keeps the SQL oracle a
    * one-line list_position and preserves the containment guarantee.)
    * Returns the distinct selected hashes. */
  def winnowedFingerprints(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val cnt = tokens.numElements()
    val m = cnt - k + 1
    if (m < w) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      h(i) = md5Lower64(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    val sel = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j <= m - w) {
      var best = j
      var x = j + 1
      while (x < j + w) {
        // unsigned: the oracle's md5_number_lower is UBIGINT, so its
        // list_min compares the full 64-bit value without a sign
        if (java.lang.Long.compareUnsigned(h(x), h(best)) < 0) best = x
        x += 1
      }
      sel.add(h(best))
      j += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** q95 character statistics in one codepoint pass:
    * [n_codepoints, n_distinct, shannon_entropy_bits]. Entropy uses
    * H = log2(N) - sum(n*log2(n))/N with the sum taken in ascending
    * codepoint order — a fixed order keeps the float result stable
    * across runs; the caller still rounds to 6dp before comparing
    * because the DuckDB oracle's group-by accumulates in its own
    * order (differences ~1e-15). */
  def charStats(text: UTF8String): ArrayData = {
    val counts = new java.util.TreeMap[Integer, Integer]()
    val s = text.toString
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    val entropy = if (n == 0) 0.0 else {
      var acc = 0d
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next().doubleValue()
        acc += c * (math.log(c) / math.log(2.0))
      }
      math.log(n.toDouble) / math.log(2.0) - acc / n
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](n.toDouble, counts.size.toDouble, entropy))
  }

  /** q105 Bloom prefilter: the subset of `grams` whose k=3 bloom
    * positions are ALL set in `bits` (a little-endian bitmap whose
    * length fixes m = 8*|bits|, a power of two). Position j of gram g
    * is md5-lower-64 of "bf<j>:<g>" masked to m — the same
    * oracle-replicable hash family as the split/sketch operators, so
    * DuckDB rebuilds the identical filter from the eval grams alone.
    * One kernel pass per document; a miss on any of the 3 probes exits
    * early (the common case: most corpus grams touch no set bit). */
  def bloomHits(bits: Array[Byte], grams: ArrayData): ArrayData = {
    val mask = (bits.length.toLong << 3) - 1L
    val n = grams.numElements()
    val out = Vector.newBuilder[Any]
    var i = 0
    while (i < n) {
      val g = grams.getUTF8String(i)
      var j = 0
      var hit = true
      while (hit && j < 3) {
        val p = md5Lower64(("bf" + j + ":" + g).getBytes(
          java.nio.charset.StandardCharsets.UTF_8)) & mask
        hit = ((bits((p >>> 3).toInt) >>> (p & 7L).toInt) & 1) == 1
        j += 1
      }
      if (hit) out += g
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result())
  }

  /** The multimodal decode STUB: a deterministic 16-bin byte histogram
    * "feature extractor" standing in for a real image/audio decoder
    * (decoder libs are unavailable in this environment — the Spark-side
    * plumbing (binary column in, fixed-width float vector out, batched
    * per partition) is the real, tested part). */
  def byteHistogram16(bytes: Array[Byte]): ArrayData = {
    val counts = new Array[Int](16)
    var i = 0
    while (i < bytes.length) { counts((bytes(i) & 0xff) >> 4) += 1; i += 1 }
    val total = math.max(bytes.length, 1).toFloat
    val out = new Array[Any](16)
    i = 0
    while (i < 16) { out(i) = counts(i) / total; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Integer-count variant of the 16-bin histogram (bin = high nibble):
    * exact long counts so the oracle compare is float-free. */
  def byteHistogramCounts(bytes: Array[Byte]): ArrayData = {
    val counts = new Array[Long](16)
    var i = 0
    while (i < bytes.length) { counts((bytes(i) & 0xff) >> 4) += 1; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      counts.map(java.lang.Long.valueOf(_): Any))
  }

  /** q129's universal-hash permutation constants: a_p/b_p from md5 of
    * "mha:<p>"/"mhb:<p>" masked to 31 bits, a forced nonzero mod the
    * Mersenne prime 2^31-1 — the identical derivation the DuckDB
    * oracle computes in SQL, so signatures match cell-exactly. */
  private val MH_P = 2147483647L
  private val MH_A: Array[Long] = Array.tabulate(64)(p =>
    (md5Lower64(s"mha:$p".getBytes("UTF-8")) & MH_P) % (MH_P - 1) + 1)
  private val MH_B: Array[Long] = Array.tabulate(64)(p =>
    md5Lower64(s"mhb:$p".getBytes("UTF-8")) & MH_P)

  /** BPE merge application (Sennrich et al. 2016 / the GPT-2 apply
    * loop): split `word` into code points, then for each learned merge
    * (lhs(r), rhs(r)) in rank order rewrite the symbol list greedily
    * LEFT-TO-RIGHT — out.last == lhs && next == rhs collapses to
    * lhs+rhs, and because the collapsed symbol no longer equals lhs,
    * overlapping runs merge non-overlapping exactly like the reference
    * algorithm ("aaa" + (a,a) -> ["aa","a"]). The DuckDB oracle
    * reproduces the identical fold as a list_reduce over a
    * space-delimited accumulator (q130). */
  def bpeApply(word: UTF8String, lhs: ArrayData, rhs: ArrayData): ArrayData = {
    val s = word.toString
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      syms.add(s.substring(i, i + n))
      i += n
    }
    val m = lhs.numElements()
    var r = 0
    while (r < m) {
      val a = lhs.getUTF8String(r).toString
      val b = rhs.getUTF8String(r).toString
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        val x = syms.get(j)
        if (!out.isEmpty && out.get(out.size - 1) == a && x == b)
          out.set(out.size - 1, a + b)
        else out.add(x)
        j += 1
      }
      syms = out
      r += 1
    }
    val arr = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { arr(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** 64-component MinHash partial signature over an array of 31-bit
    * shingle hashes: component p = min over h of (a_p*h + b_p) mod
    * (2^31-1). One tight JVM loop — the equivalent 64 higher-order
    * `aggregate()` expressions cost ~2 s at sf0.1 in lambda dispatch
    * (measured round 10); this is the same arithmetic at loop speed.
    * Empty input yields 64 Long.MaxValue sentinels (callers filter
    * empty shingle sets to match the oracle's absent rows). */
  /** Johnson-Lindenstrauss sign projection (q134): out[j] =
    * sum_i signs[j*d + i] * qv[i] over the flattened plan-literal
    * +-1 sign matrix — exact integer sums, one kernel pass per vector
    * (Achlioptas 2003's database-friendly +-1 variant). */
  def jlProject(qv: ArrayData, signs: ArrayData, outDims: Int): ArrayData = {
    val d = qv.numElements()
    val out = new Array[Long](outDims)
    var j = 0
    while (j < outDims) {
      var s = 0L
      var i = 0
      while (i < d) { s += signs.getLong(j * d + i) * qv.getLong(i); i += 1 }
      out(j) = s
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.map(java.lang.Long.valueOf(_): Any))
  }

  /** DSIR document score (q132): sum over tokens of
    * llr[md5('dsir:' ‖ tok) & (|llr|-1)], one kernel pass per document
    * in token order — bit-identical to the transform/aggregate HOF
    * fold it replaces, without the per-token lambda dispatch and
    * Column-tree md5 (measured: the q129 lesson applied to scoring). */
  def dsirSum(toks: ArrayData, llr: ArrayData): Double = {
    val mask = llr.numElements() - 1
    var sum = 0.0d
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = md5Lower64(("dsir:" + toks.getUTF8String(i).toString).getBytes("UTF-8"))
      sum += llr.getDouble((h & mask).toInt)
      i += 1
    }
    sum
  }

  /** Hashed bag-of-words feature vector (q133's classifier features,
    * the fasttext input shape): bucket = md5(salt ‖ tok) & (buckets-1),
    * counts returned as a fixed-length long array. One kernel pass per
    * document; `buckets` must be a power of two. */
  def hashCounts(toks: ArrayData, salt: UTF8String, buckets: Int): ArrayData = {
    val out = new Array[Long](buckets)
    val s = salt.toString
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = md5Lower64((s + toks.getUTF8String(i).toString).getBytes("UTF-8"))
      out((h & (buckets - 1)).toInt) += 1L
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.map(java.lang.Long.valueOf(_): Any))
  }

  def minhashComponents(hs: ArrayData): ArrayData = {
    val out = new Array[Long](64)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var p = 0
      while (p < 64) {
        val v = (MH_A(p) * h + MH_B(p)) % MH_P
        if (v < out(p)) out(p) = v
        p += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.map(java.lang.Long.valueOf(_): Any))
  }
}
