package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MediaKernel is a real file-header parser, not a fixture-only inverse
  * of its own encoder: these specs feed it (1) a canonical real-world
  * 1x1 transparent PNG (the ubiquitous 67-byte tracking pixel, bytes
  * from the wild, not from pngEncode) and (2) hand-written canonical
  * WAV header bytes, plus corruption/truncation cases the chunk walk
  * and CRC check must catch. */
class MediaSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private val realPng: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")

  // canonical 44-byte header: PCM, mono, 8000 Hz, 8-bit
  private val realWav: Array[Byte] =
    ("52 49 46 46 24 00 00 00 57 41 56 45 66 6d 74 20 " + // RIFF$...WAVEfmt_
     "10 00 00 00 01 00 01 00 40 1f 00 00 40 1f 00 00 " + // 16, PCM, 1ch, 8000, 8000
     "01 00 08 00 64 61 74 61 00 00 00 00")               // align 1, 8 bit, data, 0
      .split(" ").map(h => Integer.parseInt(h, 16).toByte)

  private def info(p: Array[Byte]) = {
    val session = spark
    import session.implicits._
    Seq(p).toDF("payload")
      .select(graft.functions.media_info(col("payload")).as("m"))
      .select("m.*").head()
  }

  test("parses a real-world 1x1 PNG (not one built by pngEncode)") {
    val r = info(realPng)
    assert(r.getString(0) == "png")
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L, "1x1")
    assert(r.getLong(3) == 8L, "bit depth")
    assert(r.getLong(4) == 6L, "RGBA color type")
    assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7), "audio fields null")
    assert(r.getBoolean(8), "IHDR CRC-32 validates")
  }

  test("parses canonical hand-written WAV header bytes") {
    val r = info(realWav)
    assert(r.getString(0) == "wav")
    assert(r.getLong(5) == 8000L && r.getLong(6) == 1L && r.getLong(7) == 8L)
    assert(r.isNullAt(1) && r.isNullAt(2), "image fields null")
    assert(r.getBoolean(8))
  }

  test("CRC catches a corrupted IHDR; truncation and junk stay safe") {
    val corrupt = realPng.clone()
    corrupt(18) = (corrupt(18) ^ 0x01).toByte // flip a bit inside IHDR data
    val c = info(corrupt)
    assert(c.getString(0) == "png" && !c.getBoolean(8), "CRC must fail")
    val t = info(realPng.take(20)) // truncated mid-IHDR
    assert(t.getString(0) == "png" && t.isNullAt(1) && !t.getBoolean(8))
    val j = info("not a media file at all".getBytes("UTF-8"))
    assert(j.getString(0) == "unknown" && !j.getBoolean(8) && j.isNullAt(1))
    val e = info(Array.emptyByteArray)
    assert(e.getString(0) == "unknown" && !e.getBoolean(8))
  }

  test("parses a LIVE ImageIO-encoded JPEG (real DQT/DHT/SOS marker stream)") {
    // a genuinely real JPEG: encoded in-process by the JDK's baseline
    // writer, so the marker walk must step over APP0, DQT and any
    // other segments to find SOF0 — nothing about these bytes comes
    // from jpegEncode
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff8040)
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, "jpg", bos)
    assert(ok, "JDK baseline JPEG writer available")
    val r = info(bos.toByteArray)
    assert(r.getString(0) == "jpeg")
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L, "3x2")
    assert(r.getLong(3) == 8L, "precision")
    assert(r.getLong(4) == 3L, "YCbCr components")
    assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7), "audio fields null")
    assert(r.getBoolean(8), "SOF structural check")
    // truncated before SOF: container sniffs as jpeg, no dims, invalid
    val t = info(bos.toByteArray.take(12))
    assert(t.getString(0) == "jpeg" && t.isNullAt(1) && !t.getBoolean(8))
  }

  private def pcmWindows(p: Array[Byte], win: Long): Seq[(Long, Long, Long, Long)] = {
    val a = graft.expressions.MediaKernel.wavPcmWindows(p, win)
    if (a == null) null
    else (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 4)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
  }

  test("wavPcmWindows decodes REAL samples, matching the planted formula") {
    // seed 5 (5 % 7 != 3): plain RIFF/fmt/data layout
    val p = graft.expressions.MediaKernel.wavEncodePcm(16000L, 1L, 70L, 5L)
    // the whole payload still parses as a WAV through the header path
    val m = info(p)
    assert(m.getString(0) == "wav" && m.getLong(5) == 16000L && m.getBoolean(8))
    val got = pcmWindows(p, 32L)
    def sample(seed: Long, k: Long): Long =
      ((seed + k) * 2654435761L) % 65536L - 32768L
    val want = (0L until 70L).map(k => (k / 32L, sample(5L, k)))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (w, ks) =>
        (w, ks.size.toLong, ks.map(_._2).sum, ks.map(t => math.abs(t._2)).max)
      }
    assert(got == want, "independent sample-formula recompute")
    // tail window reports its true n_samples (70 = 32 + 32 + 6)
    assert(got.last._2 == 6L)
  }

  test("LIST chunk before data: RIFF walk required, byte-44 assumption breaks") {
    // seed 10 (10 % 7 == 3): a LIST/INFO chunk sits between fmt and
    // data, so PCM does NOT start at byte 44
    val p = graft.expressions.MediaKernel.wavEncodePcm(8000L, 2L, 40L, 10L)
    def sample(seed: Long, k: Long): Long =
      ((seed + k) * 2654435761L) % 65536L - 32768L
    val got = pcmWindows(p, 64L)
    assert(got.size == 1 && got.head._2 == 40L)
    assert(got.head._3 == (0L until 40L).map(sample(10L, _)).sum)
    // the naive fixed-offset read lands inside the LIST chunk: bytes
    // 44-45 here are 'I','N' of the INFO fourcc, not sample 0
    val naive = ((p(45) & 0xff) << 8 | (p(44) & 0xff)).toShort.toLong
    assert(naive != sample(10L, 0L), "fixed 44-byte offset misreads this file")
  }

  private def zcrWindows(p: Array[Byte], win: Long): Seq[(Long, Long, Long, Long)] = {
    val a = graft.expressions.MediaKernel.wavZcrWindows(p, win)
    if (a == null) null
    else (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 4)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
  }

  test("wavZcrWindows matches a sample-formula recompute (incl. LIST layout)") {
    def sample(seed: Long, k: Long): Long =
      ((seed + k) * 2654435761L) % 65536L - 32768L
    // seed 10 (10 % 7 == 3) exercises the LIST layout; 70 samples at
    // win 32 gives a short tail window and cross-window crossings
    for (seed <- Seq(5L, 10L)) {
      val p = graft.expressions.MediaKernel.wavEncodePcm(8000L, 1L, 70L, seed)
      val got = zcrWindows(p, 32L)
      val want = (0L until 70L).map { k =>
        val cross = k > 0 &&
          (sample(seed, k) >= 0) != (sample(seed, k - 1) >= 0)
        (k / 32L, if (cross) 1L else 0L, math.abs(sample(seed, k)))
      }.groupBy(_._1).toSeq.sortBy(_._1).map { case (w, ks) =>
        (w, ks.size.toLong, ks.map(_._2).sum, ks.map(_._3).sum)
      }
      assert(got == want, s"seed $seed independent recompute")
      assert(got.map(_._3).sum > 0, "planted stride must cross somewhere")
    }
    // same rejection contract as wavPcmWindows
    assert(zcrWindows(realPng, 32L) == null)
    assert(zcrWindows(null, 32L) == null)
    assert(zcrWindows(graft.expressions.MediaKernel.wavEncodePcm(
      8000L, 1L, 8L, 1L), 0L) == null)
    assert(zcrWindows(graft.expressions.MediaKernel.wavEncodePcm(
      8000L, 1L, 0L, 1L), 32L) == Seq.empty)
  }

  test("wavPcmWindows rejects what it cannot decode") {
    // 8-bit PCM header (realWav): not 16-bit -> null
    assert(pcmWindows(realWav, 32L) == null)
    // not a WAV at all / null / nonpositive window -> null
    assert(pcmWindows(realPng, 32L) == null)
    assert(pcmWindows(null, 32L) == null)
    val p = graft.expressions.MediaKernel.wavEncodePcm(8000L, 1L, 8L, 1L)
    assert(pcmWindows(p, 0L) == null)
    // sampleless 16-bit payload -> empty array, not null
    assert(pcmWindows(graft.expressions.MediaKernel.wavEncodePcm(
      8000L, 1L, 0L, 1L), 32L) == Seq.empty)
    // declared chunk size overrunning the payload -> null (wrap guard)
    val trunc = p.take(p.length - 4)
    assert(pcmWindows(trunc, 32L) == null)
  }

  // ── PNG pixel decode (round 13): IDAT inflate + unfilter ──────────

  private def grayOf(p: Array[Byte]): (Int, Int, Array[Int]) =
    graft.expressions.MediaKernel.pngDecodeGray(p)

  private def plantedPixel(seed: Long, idx: Long, bright: Long): Int =
    ((((seed + idx) * 2654435761L) % 256L + bright) % 256L).toInt

  test("pngEncodeGray -> pngDecodeGray round-trips the planted pixel formula") {
    // h = 12 >= 10 means scanline filters y%5 cover all five spec
    // filter types (None/Sub/Up/Average/Paeth) at least twice
    val p = graft.expressions.MediaKernel.pngEncodeGray(20L, 12L, 7L, 0L)
    // the header path still agrees
    val m = info(p)
    assert(m.getString(0) == "png" && m.getLong(1) == 20L &&
      m.getLong(2) == 12L && m.getLong(3) == 8L && m.getLong(4) == 0L &&
      m.getBoolean(8))
    val (w, h, gray) = grayOf(p)
    assert(w == 20 && h == 12)
    for (i <- 0 until w * h)
      assert(gray(i) == plantedPixel(7L, i, 0L), s"pixel $i diverges")
    // brightness offset wraps mod 256
    val (_, _, g2) = grayOf(
      graft.expressions.MediaKernel.pngEncodeGray(20L, 12L, 7L, 5L))
    for (i <- 0 until w * h)
      assert(g2(i) == plantedPixel(7L, i, 5L), s"bright pixel $i diverges")
  }

  test("decodes a LIVE ImageIO-encoded PNG, gray and RGB (real zlib, real filters)") {
    // grayscale: the JDK writer picks its own filter strategy and zlib
    // stream — nothing about these bytes comes from pngEncodeGray
    val gimg = new java.awt.image.BufferedImage(
      11, 9, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 9; x <- 0 until 11)
      gimg.getRaster.setSample(x, y, 0, (x * 23 + y * 71) % 256)
    val gbos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gimg, "png", gbos), "JDK PNG writer")
    val (gw, gh, g) = grayOf(gbos.toByteArray)
    assert(gw == 11 && gh == 9)
    for (y <- 0 until 9; x <- 0 until 11)
      assert(g(y * 11 + x) == (x * 23 + y * 71) % 256, s"gray ($x,$y)")
    // truecolor: luminance collapses as (r+g+b)/3
    val cimg = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 4; x <- 0 until 5)
      cimg.setRGB(x, y, new java.awt.Color(x * 40, y * 50, (x + y) * 20).getRGB)
    val cbos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(cimg, "png", cbos))
    val (cw, ch, c) = grayOf(cbos.toByteArray)
    assert(cw == 5 && ch == 4)
    for (y <- 0 until 4; x <- 0 until 5)
      assert(c(y * 5 + x) == (x * 40 + y * 50 + (x + y) * 20) / 3, s"rgb ($x,$y)")
    // and the real-world RGBA tracking pixel (color type 6) decodes to
    // the same luminance ImageIO itself reads from those bytes
    val (rw, rh, r) = grayOf(realPng)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(realPng)).getRGB(0, 0)
    val want = (((ref >> 16) & 0xff) + ((ref >> 8) & 0xff) + (ref & 0xff)) / 3
    assert(rw == 1 && rh == 1 && r(0) == want)
  }

  test("pngDecodeGray rejects what it cannot decode, without throwing") {
    assert(grayOf(null) == null)
    assert(grayOf(realWav) == null, "not a PNG")
    val p = graft.expressions.MediaKernel.pngEncodeGray(16L, 8L, 1L, 0L)
    assert(grayOf(p.take(40)) == null, "truncated mid-IDAT")
    // corrupt the zlib stream inside IDAT
    val corrupt = p.clone()
    corrupt(45) = (corrupt(45) ^ 0x55).toByte
    assert(grayOf(corrupt) == null || grayOf(corrupt) != null,
      "must not throw") // either null or garbage-tolerant, never an exception
    // header-only PNG from pngEncode (empty IDAT): no pixel data
    assert(grayOf(graft.expressions.MediaKernel.pngEncode(4L, 4L, 8L, 0L)) == null)
    // 16M-pixel bomb guard
    val bomb = graft.expressions.MediaKernel.pngEncode(65536L, 65536L, 8L, 0L)
    assert(grayOf(bomb) == null)
  }

  test("pngRowStats and pngDhash match a direct recompute of the planted grid") {
    val (w, h, seed) = (18, 10, 3L)
    val p = graft.expressions.MediaKernel.pngEncodeGray(w.toLong, h.toLong, seed, 0L)
    val st = graft.expressions.MediaKernel.pngRowStats(p)
    assert(st.numElements() == h)
    for (y <- 0 until h) {
      val row = st.getStruct(y, 5)
      val px = (0 until w).map(x => plantedPixel(seed, y.toLong * w + x, 0L))
      assert(row.getLong(0) == y && row.getLong(1) == w &&
        row.getLong(2) == px.sum && row.getLong(3) == px.min &&
        row.getLong(4) == px.max, s"row $y stats diverge")
    }
    // dhash: recompute the 9x8 block-mean grid independently
    val sums = Array.fill(8, 9)(0L); val cnts = Array.fill(8, 9)(0L)
    for (y <- 0 until h; x <- 0 until w) {
      sums(y * 8 / h)(x * 9 / w) += plantedPixel(seed, y.toLong * w + x, 0L)
      cnts(y * 8 / h)(x * 9 / w) += 1
    }
    var want = 0L
    for (cy <- 0 until 8; cx <- 0 until 8)
      if (sums(cy)(cx) / cnts(cy)(cx) < sums(cy)(cx + 1) / cnts(cy)(cx + 1))
        want |= 1L << (cy * 8 + cx)
    assert(graft.expressions.MediaKernel.pngDhash(p) == want)
    // identical image -> hamming 0; constant brightness shift -> small
    // hamming (comparisons survive except at the mod-256 wrap)
    val pSame = graft.expressions.MediaKernel.pngEncodeGray(w.toLong, h.toLong, seed, 0L)
    assert(graft.expressions.MediaKernel.pngDhash(pSame) == want)
    val pBright = graft.expressions.MediaKernel.pngEncodeGray(w.toLong, h.toLong, seed, 9L)
    val hb = java.lang.Long.bitCount(
      graft.expressions.MediaKernel.pngDhash(pBright) ^ want)
    assert(hb <= 16, s"brightness shift moved $hb dhash bits")
    // smaller than the 9x8 grid -> null
    assert(graft.expressions.MediaKernel.pngDhash(
      graft.expressions.MediaKernel.pngEncodeGray(8L, 8L, 1L, 0L)) == null)
  }

  // ── JPEG pixel decode (round 14): Huffman + dequant + IDCT ────────

  private def jGrayOf(p: Array[Byte]): (Int, Int, Array[Int]) =
    graft.expressions.MediaKernel.jpegDecodeGray(p)

  private def plantedBlock(seed: Long, w: Int, x: Int, y: Int, bright: Long): Int = {
    val bw = (w + 7) / 8
    val bi = (y / 8).toLong * bw + (x / 8)
    val v = (seed + bi) % 32768L
    ((((v * v + v) * 2654435761L) >> 16) % 256L + bright) % 256L
  }.toInt

  test("jpegEncodeGrayFlat -> jpegDecodeGray round-trips the planted block formula EXACTLY") {
    // non-multiple-of-8 dims: 20x12 -> 3x2 blocks, right/bottom clipped
    val p = graft.expressions.MediaKernel.jpegEncodeGrayFlat(20L, 12L, 7L, 0L)
    // the header path still agrees
    val m = info(p)
    assert(m.getString(0) == "jpeg" && m.getLong(1) == 20L &&
      m.getLong(2) == 12L && m.getLong(3) == 8L && m.getLong(4) == 1L &&
      m.getBoolean(8))
    val (w, h, g) = jGrayOf(p)
    assert(w == 20 && h == 12)
    for (y <- 0 until h; x <- 0 until w)
      assert(g(y * w + x) == plantedBlock(7L, w, x, y, 0L),
        s"pixel ($x,$y) diverges")
    // brightness offset wraps mod 256, same as the PNG plant
    val (_, _, g2) = jGrayOf(
      graft.expressions.MediaKernel.jpegEncodeGrayFlat(20L, 12L, 7L, 5L))
    for (y <- 0 until h; x <- 0 until w)
      assert(g2(y * w + x) == plantedBlock(7L, w, x, y, 5L))
    // and the dispatching kernels route JPEG payloads too
    assert(graft.expressions.MediaKernel.imageDhash(p) != null)
    assert(graft.expressions.MediaKernel.imageRowStats(p).numElements() == 12)
  }

  test("jpegEncodeGrayQ plants the scaled DQT; jpegDqt reads it back; inversion recovers q") {
    val MK = graft.expressions.MediaKernel
    // zigzag permutation (T.81 A.6) to compare the natural-order
    // scaled table against the as-stored (zigzag) parse
    val zz = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
    val sumK = MK.JPEG_STD_LUMA.sum
    assert(sumK == 3688, "q246's literal must match the Annex K sum")
    for (q <- 1 to 100) {
      val p = MK.jpegEncodeGrayQ(24L, 16L, 3L, 0L, q.toLong)
      val parsed = MK.jpegDqt(p)
      assert(parsed != null && parsed.numElements() == 64, s"q=$q parse")
      val stored = (0 until 64).map(parsed.getLong)
      val scaled = MK.jpegQuantScaled(q)
      // byte-level proof: the stored table IS the scaled table, zigzagged
      (0 until 64).foreach(i =>
        assert(stored(i) == scaled(zz(i)).toLong, s"q=$q entry $i"))
      // q246's sum-ratio inversion
      val sum = stored.sum
      val sEst = (200L * sum + sumK) / (2L * sumK)
      val qEst = if (sEst >= 100) 5000L / sEst else (200L - sEst) / 2L
      // exact inside the clamp-free planted band, never off by more
      // than 1 across the clamp-free middle
      if (q >= 35 && q <= 90 && q % 5 == 0)
        assert(qEst == q.toLong, s"planted band must invert exactly: $q -> $qEst")
      if (q >= 25 && q <= 92)
        assert(math.abs(qEst - q) <= 1, s"q=$q estimated $qEst")
      // payload stays a decodable baseline JPEG (lossy now — just
      // prove the machinery accepts it)
      assert(MK.imageDecodeGray(p) != null, s"q=$q must stay decodable")
    }
    // non-JPEG and table-free inputs return null, never throw
    assert(MK.jpegDqt(null) == null)
    assert(MK.jpegDqt(Array[Byte](1, 2, 3)) == null)
    assert(MK.jpegDqt(realPng) == null)
  }

  test("jpegDqt parses a LIVE ImageIO JPEG's quant table") {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      img.getRaster.setSample(x, y, 0, 30 + x * 5 + y * 3)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val t = graft.expressions.MediaKernel.jpegDqt(bos.toByteArray)
    assert(t != null && t.numElements() == 64, "real-world DQT must parse")
    val vals = (0 until 64).map(t.getLong)
    assert(vals.forall(v => v >= 1 && v <= 255), s"entries out of range: $vals")
  }

  test("decodes a LIVE ImageIO-encoded JPEG to PIXELS, gray and color 4:2:0") {
    // grayscale: the JDK writer emits its own DQT/DHT (real Annex K
    // style tables), a real quantized entropy stream — nothing about
    // these bytes comes from jpegEncodeGrayFlat. Smooth ramp content
    // keeps quantization error small; assert within tolerance.
    val gw = 21; val gh = 14
    val gimg = new java.awt.image.BufferedImage(
      gw, gh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until gh; x <- 0 until gw)
      gimg.getRaster.setSample(x, y, 0, 40 + x * 6 + y * 4)
    val gbos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gimg, "jpg", gbos), "JDK JPEG writer")
    val (dw, dh, dg) = jGrayOf(gbos.toByteArray)
    assert(dw == gw && dh == gh)
    var maxErr = 0; var sumErr = 0L
    for (y <- 0 until gh; x <- 0 until gw) {
      val e = math.abs(dg(y * gw + x) - (40 + x * 6 + y * 4))
      maxErr = math.max(maxErr, e); sumErr += e
    }
    assert(maxErr <= 24, s"gray max quantization error $maxErr")
    assert(sumErr.toDouble / (gw * gh) <= 6.0, s"gray mean error")
    // cross-check against the JDK's own decode of the same bytes —
    // both sides reconstruct the same Y channel, so they must agree
    // to within IDCT rounding (the JDK uses a scaled-integer IDCT)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gbos.toByteArray))
    for (y <- 0 until gh; x <- 0 until gw) {
      val rv = ref.getRaster.getSample(x, y, 0)
      assert(math.abs(dg(y * gw + x) - rv) <= 2,
        s"vs ImageIO decode at ($x,$y): got ${dg(y * gw + x)}, jdk $rv")
    }
    // color: TYPE_3BYTE_BGR writes a 3-component YCbCr JPEG with 4:2:0
    // subsampling — 2x2-sampled luma MCUs the decoder must interleave
    // with (entropy-decoded, never reconstructed) chroma blocks
    val cw = 19; val ch = 11
    val cimg = new java.awt.image.BufferedImage(
      cw, ch, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until ch; x <- 0 until cw)
      cimg.setRGB(x, y, new java.awt.Color(
        30 + x * 8, 40 + y * 10, 60 + x * 3 + y * 3).getRGB)
    val cbos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(cimg, "jpg", cbos))
    val (cdw, cdh, cdg) = jGrayOf(cbos.toByteArray)
    assert(cdw == cw && cdh == ch)
    for (y <- 0 until ch; x <- 0 until cw) {
      val want = math.round(
        0.299 * (30 + x * 8) + 0.587 * (40 + y * 10) +
          0.114 * (60 + x * 3 + y * 3)).toInt
      assert(math.abs(cdg(y * cw + x) - want) <= 24,
        s"color luma at ($x,$y): got ${cdg(y * cw + x)}, want ~$want")
    }
  }

  test("jpegDecodeGray handles 16-bit DQT and restart markers") {
    // 16-bit quant path: widen the planted encoder's all-ones DQT from
    // pq=0 (64 bytes at offset 7) to pq=1 (128 BE16 bytes) by byte
    // surgery — decode must be identical
    val p = graft.expressions.MediaKernel.jpegEncodeGrayFlat(24L, 16L, 9L, 0L)
    val wide = new java.io.ByteArrayOutputStream()
    wide.write(p, 0, 4)                      // SOI + FFDB
    wide.write(0); wide.write(2 + 1 + 128)   // new segment length
    wide.write(0x10)                         // pq=1 tq=0
    for (_ <- 0 until 64) { wide.write(0); wide.write(1) }
    wide.write(p, 4 + 2 + 1 + 64, p.length - (4 + 2 + 1 + 64))
    val (w16, h16, g16) = jGrayOf(wide.toByteArray)
    val (w8, h8, g8) = jGrayOf(p)
    assert(w16 == w8 && h16 == h8 && g16.sameElements(g8))
    // restart markers: RSTn every 2 MCUs with predictor resets — the
    // pixel field is unchanged
    val pr = graft.expressions.MediaKernel
      .jpegEncodeGrayFlatRst(24L, 16L, 9L, 0L, 2L)
    assert(pr.length > p.length, "DRI + RST markers present")
    val (wr, hr, gr) = jGrayOf(pr)
    assert(wr == w8 && hr == h8 && gr.sameElements(g8))
  }

  test("jpegDecodeGray rejects what it cannot decode, without throwing") {
    assert(jGrayOf(null) == null)
    assert(jGrayOf(realWav) == null, "not a JPEG")
    assert(jGrayOf(realPng) == null, "PNG routes via pngDecodeGray only")
    val p = graft.expressions.MediaKernel.jpegEncodeGrayFlat(16L, 8L, 1L, 0L)
    assert(jGrayOf(p.take(p.length - 6)) == null, "truncated entropy stream")
    assert(jGrayOf(p.take(30)) == null, "truncated mid-marker")
    // progressive: flip SOF0 -> SOF2 (the marker byte follows SOI(2) +
    // the 69-byte DQT segment: index 2+69+1 = 72)
    val prog = p.clone()
    assert((prog(72) & 0xff) == 0xc0, "SOF marker where expected")
    prog(72) = 0xc2.toByte
    assert(jGrayOf(prog) == null, "progressive refused")
    // decompression bomb: patch SOF dims to 65535x65535
    val bomb = p.clone()
    bomb(76) = 0xff.toByte; bomb(77) = 0xff.toByte // height
    bomb(78) = 0xff.toByte; bomb(79) = 0xff.toByte // width
    assert(jGrayOf(bomb) == null, "16M-pixel bomb guard")
    // header-only jpegEncode (no DHT/SOS): refused, not crashed
    assert(jGrayOf(graft.expressions.MediaKernel.jpegEncode(8L, 8L, 1L)) == null)
    // corrupt entropy byte: null or tolerated, never an exception
    val corrupt = p.clone()
    corrupt(p.length - 8) = (corrupt(p.length - 8) ^ 0x55).toByte
    val r = jGrayOf(corrupt)
    assert(r == null || r != null, "must not throw")
  }

  test("encoder output is parser-consistent AND byte-stable") {
    val session = spark
    import session.implicits._
    val r = Seq((640L, 480L, 8L, 2L)).toDF("w", "h", "bd", "ct")
      .select(graft.functions.media_info(
        graft.functions.png_encode(col("w"), col("h"), col("bd"), col("ct"))).as("m"))
      .select("m.*").head()
    assert(r.getString(0) == "png" && r.getLong(1) == 640L && r.getLong(2) == 480L
      && r.getLong(3) == 8L && r.getLong(4) == 2L && r.getBoolean(8))
    val w = Seq((44100L, 2L, 16L)).toDF("sr", "ch", "b")
      .select(graft.functions.media_info(
        graft.functions.wav_encode(col("sr"), col("ch"), col("b"))).as("m"))
      .select("m.*").head()
    assert(w.getString(0) == "wav" && w.getLong(5) == 44100L
      && w.getLong(6) == 2L && w.getLong(7) == 16L && w.getBoolean(8))
    // byte-stability: wavEncode(8000,1,8) reproduces the canonical
    // 44-byte header bit for bit (same for any args — the layout is
    // fully determined), so payload_bytes in q127's oracle is exact
    assert(java.util.Arrays.equals(
      graft.expressions.MediaKernel.wavEncode(8000L, 1L, 8L), realWav))
    assert(graft.expressions.MediaKernel.pngEncode(1L, 1L, 8L, 6L).length == 57)
    // jpeg: encode -> parse round trip, and the two oracle sizes
    val jr = Seq((320L, 200L, 3L)).toDF("w", "h", "n")
      .select(graft.functions.media_info(
        graft.functions.jpeg_encode(col("w"), col("h"), col("n"))).as("m"))
      .select("m.*").head()
    assert(jr.getString(0) == "jpeg" && jr.getLong(1) == 320L
      && jr.getLong(2) == 200L && jr.getLong(3) == 8L && jr.getLong(4) == 3L
      && jr.getBoolean(8))
    assert(graft.expressions.MediaKernel.jpegEncode(1L, 1L, 3L).length == 41)
    assert(graft.expressions.MediaKernel.jpegEncode(1L, 1L, 1L).length == 35)
  }

  // ================= ISO-BMFF / MP4 =================

  private def mp4info(p: Array[Byte]) = {
    val session = spark
    import session.implicits._
    Seq(p).toDF("payload")
      .select(graft.functions.mp4_info(col("payload")).as("m"))
      .select("m.*").head()
  }

  /** Hand-written canonical BMFF bytes (NOT built by mp4Encode): a
    * 20-byte ftyp with one compatible brand, then a size==0 moov
    * (extends to EOF, spec §4.2) holding a VERSION 1 mvhd (64-bit
    * times, 120 bytes) — three layout paths mp4Encode never emits. */
  private val realMp4: Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(20 + 8 + 120)
    def s(x: String): Unit = b.put(x.getBytes("ISO-8859-1"))
    b.putInt(20); s("ftyp"); s("mp42"); b.putInt(0); s("mp42")
    b.putInt(0); s("moov")                       // size 0 = to EOF
    b.putInt(120); s("mvhd"); b.put(1.toByte); b.put(0.toByte)
    b.putShort(0)                                 // version 1, flags 0
    b.putLong(0L); b.putLong(0L)                  // creation/modification
    b.putInt(90000)                               // timescale
    b.putLong(5400000L)                           // duration (64-bit)
    b.putInt(0x10000); b.putShort(0x100.toShort)  // rate, volume
    b.put(new Array[Byte](10))                    // reserved
    b.putInt(0x10000); b.putInt(0); b.putInt(0)   // matrix
    b.putInt(0); b.putInt(0x10000); b.putInt(0)
    b.putInt(0); b.putInt(0); b.putInt(0x40000000)
    b.put(new Array[Byte](24)); b.putInt(1)       // pre_defined, next id
    b.array()
  }

  test("parses hand-written BMFF: size-0 box, mvhd v1 64-bit times") {
    val r = mp4info(realMp4)
    assert(r.getString(0) == "mp42", "brand")
    assert(r.getLong(1) == 90000L && r.getLong(2) == 5400000L, "mvhd v1")
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L && r.getLong(5) == 0L)
    assert(r.getBoolean(6), "clean walk")
  }

  test("largesize (size==1 + 64-bit) box parses; malformed sizes do not") {
    // wrap a free box with largesize 16 between ftyp and moov
    val withLarge = {
      val b = java.nio.ByteBuffer.allocate(realMp4.length + 16)
      b.put(realMp4, 0, 20)
      b.putInt(1); b.put("free".getBytes("ISO-8859-1")); b.putLong(16L)
      b.put(realMp4, 20, realMp4.length - 20)
      b.array()
    }
    assert(mp4info(withLarge).getBoolean(6), "largesize walks clean")
    // size 4 (< its own 8-byte header) in ftyp's size field: malformed
    val bad2 = realMp4.clone(); bad2(3) = 4.toByte
    assert(!mp4info(bad2).getBoolean(6), "size < 8 rejected")
    // a box claiming past EOF is malformed (brand still readable)
    val over = realMp4.clone(); over(3) = 0x7f.toByte
    val o = mp4info(over)
    assert(!o.getBoolean(6) && o.getString(0) == "mp42",
      "overrun rejected, brand from the sniffed header")
    // truncation mid-moov: tiling check fails
    val t = mp4info(java.util.Arrays.copyOf(realMp4, 40))
    assert(!t.getBoolean(6) && t.isNullAt(1), "truncated walk -> nulls")
    // junk and short payloads never throw
    assert(mp4info("notanmp4atall!!".getBytes).getString(0) == null)
    assert(!mp4info(Array[Byte](0, 0, 0, 8, 'f', 't', 'y', 'p')).getBoolean(6))
  }

  test("mp4Encode -> mp4Info round-trips brand table, tracks, times") {
    for ((bi, brand) <- Seq(0L -> "isom", 1L -> "mp42", 2L -> "avc1", 3L -> "qt")) {
      val r = mp4info(graft.expressions.MediaKernel.mp4Encode(bi, 600L, 1200L, 2L, 1L))
      assert(r.getString(0) == brand, s"brand $bi")
      assert(r.getLong(1) == 600L && r.getLong(2) == 1200L)
      assert(r.getLong(3) == 3L && r.getLong(4) == 2L && r.getLong(5) == 1L)
      assert(r.getBoolean(6))
    }
    // zero tracks is a valid (if empty) movie
    val z = mp4info(graft.expressions.MediaKernel.mp4Encode(0L, 1000L, 0L, 0L, 0L))
    assert(z.getBoolean(6) && z.getLong(3) == 0L)
    // q251's corrupt arm: 16-byte prefix sniffs (brand) but fails the walk
    val tr = mp4info(java.util.Arrays.copyOf(
      graft.expressions.MediaKernel.mp4Encode(2L, 600L, 60L, 1L, 0L), 16))
    assert(tr.getString(0) == "avc1" && !tr.getBoolean(6) && tr.isNullAt(3))
    // mediaInfo's container report gains mp4 (q226's readout)
    val m = info(graft.expressions.MediaKernel.mp4Encode(1L, 600L, 60L, 1L, 1L))
    assert(m.getString(0) == "mp4" && m.getBoolean(8))
    assert(m.isNullAt(1) && m.isNullAt(5), "per-track fields stay null")
    val mt = info(java.util.Arrays.copyOf(
      graft.expressions.MediaKernel.mp4Encode(1L, 600L, 60L, 1L, 1L), 16))
    assert(mt.getString(0) == "mp4" && !mt.getBoolean(8))
  }
}
