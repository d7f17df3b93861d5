package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Real (not stubbed) media-container header codec for the multimodal
  * pipeline: a spec-faithful PNG IHDR parser (8-byte signature, big-
  * endian chunk walk, CRC-32 validation per the PNG spec §5.3) and a
  * RIFF/WAVE fmt-chunk parser (little-endian chunk walk with odd-size
  * padding per the RIFF spec). Both walk chunks generically, so they
  * parse any real file's header, not just the fixture-planted payloads
  * (MediaSpec feeds a canonical real-world 1x1 PNG and a 44-byte
  * PCM WAV to pin this).
  *
  * This closes the "decode step stubbed" caveat on q40/q123 (the
  * byte-histogram feature path): the Spark-side plumbing there was
  * always real; this kernel makes the decode itself real for the
  * header-metadata slice a curation pipeline actually needs (dedupe
  * by dimensions, route by sample rate, drop corrupt payloads) —
  * full pixel/sample decode stays out of scope in this container
  * (no image/audio libs), exactly as the brief prescribes.
  *
  * Pure JVM byte loops invoked from whole-stage codegen via
  * StaticInvoke; zero allocation beyond the tiny result row.
  */
object MediaKernel {

  private val PNG_SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
      ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
  private def le32(p: Array[Byte], i: Int): Long =
    (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
  private def be16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(p, 0, 8), PNG_SIG)

  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 &&
      (p(2) & 0xff) == 0xff

  /** Start-of-frame markers carrying dimensions (C0-CF minus DHT C4,
    * JPG C8, DAC CC — ITU T.81 table B.1). */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  private def isWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Parse a payload's container header. Returns
    * (container, width, height, bit_depth, color_type,
    *  sample_rate, channels, bits_per_sample, valid):
    * PNG fills the image fields (nulls for audio), WAV the audio
    * fields (nulls for image), anything else parses as "unknown" with
    * all fields null and valid=false. `valid` additionally asserts the
    * PNG IHDR CRC-32 matches (a truncated/corrupt header flips it
    * false) — the field a cleaning pipeline filters on. */
  def mediaInfo(p: Array[Byte]): InternalRow = {
    val r = new GenericInternalRow(9)
    r.update(0, UTF8String.fromString("unknown"))
    r.setBoolean(8, false)
    if (p == null) return r
    if (isPng(p)) {
      r.update(0, UTF8String.fromString("png"))
      var pos = 8
      while (pos + 8 <= p.length) {
        // chunk length stays a Long: a 32-bit field near Int.MaxValue
        // would wrap `pos + 12 + len` negative as Int, passing the
        // bounds guard and then indexing out of the array. All bounds
        // compare in Long space; the .toInt below is reached only once
        // the chunk is proven to fit inside p.
        val len = be32(p, pos)
        val isIhdr = p(pos + 4) == 'I' && p(pos + 5) == 'H' &&
          p(pos + 6) == 'D' && p(pos + 7) == 'R'
        if (len > p.length.toLong - pos - 12) return r
        if (isIhdr && len >= 13) {
          r.setLong(1, be32(p, pos + 8))       // width
          r.setLong(2, be32(p, pos + 12))      // height
          r.setLong(3, p(pos + 16) & 0xffL)    // bit depth
          r.setLong(4, p(pos + 17) & 0xffL)    // color type
          val crc = new java.util.zip.CRC32()
          crc.update(p, pos + 4, 4 + len.toInt) // chunk type + data
          r.setBoolean(8, crc.getValue == be32(p, pos + 8 + len.toInt))
          return r
        }
        pos += 12 + len.toInt
      }
      r
    } else if (isJpeg(p)) {
      // marker walk per ITU T.81 §B: segments are FF <marker> <be16
      // len including itself>; dimensions live in the first SOF frame
      // header (precision, height, width, component count). Image
      // fields reuse the PNG columns: bit_depth = sample precision,
      // color_type = component count (3 = YCbCr, 1 = grayscale).
      r.update(0, UTF8String.fromString("jpeg"))
      var pos = 2
      while (pos + 2 <= p.length && (p(pos) & 0xff) == 0xff) {
        val m = p(pos + 1) & 0xff
        if (m == 0xd9) return r                       // EOI before SOF
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) pos += 2 // bare
        else if (pos + 4 > p.length) return r
        else {
          // subtraction form: pos + 2 + segLen can wrap Int when pos
          // sits near a ~2 GiB payload's end; p.length - pos - 2 never
          // underflows (pos + 4 <= p.length holds here)
          val segLen = be16(p, pos + 2)
          if (segLen < 2 || segLen > p.length - pos - 2) return r
          if (isSof(m)) {
            if (segLen < 8 || pos > p.length - 10) return r
            val ncomp = p(pos + 9) & 0xffL
            r.setLong(1, be16(p, pos + 7))            // width
            r.setLong(2, be16(p, pos + 5))            // height
            r.setLong(3, p(pos + 4) & 0xffL)          // precision
            r.setLong(4, ncomp)                       // components
            // structural validity: the SOF segment length must carry
            // exactly its component table (corrupt lengths flip false)
            r.setBoolean(8, segLen == 8 + 3 * ncomp)
            return r
          }
          if (m == 0xda) return r                     // SOS: entropy data
          pos += 2 + segLen
        }
      }
      r
    } else if (isWav(p)) {
      r.update(0, UTF8String.fromString("wav"))
      var pos = 12
      while (pos + 8 <= p.length) {
        // Long chunk size for the same Int-wrap reason as the PNG walk.
        val sz = le32(p, pos + 4)
        val isFmt = p(pos) == 'f' && p(pos + 1) == 'm' &&
          p(pos + 2) == 't' && p(pos + 3) == ' '
        if (sz > p.length.toLong - pos - 8) return r
        if (isFmt && sz >= 16) {
          r.setLong(6, le16(p, pos + 10))      // channels
          r.setLong(5, le32(p, pos + 12))      // sample rate
          r.setLong(7, le16(p, pos + 22))      // bits per sample
          r.setBoolean(8, true)
          return r
        }
        pos += 8 + sz.toInt + (sz.toInt & 1)   // RIFF pads odd chunks
      }
      r
    } else if (isMp4(p)) {
      // ISO-BMFF: the triage fields live in [[mp4Info]]'s dedicated
      // struct (brand/timescale/duration/tracks); the generic report
      // carries container + structural validity so a (source,
      // container) health rollup sees video payloads too. Width/
      // height/rate stay null — they're per-track in BMFF, not
      // per-container.
      r.update(0, UTF8String.fromString("mp4"))
      r.setBoolean(8, mp4Info(p).getBoolean(6))
      r
    } else r
  }

  /** Build a spec-valid PNG header: signature, IHDR with real CRC-32,
    * empty IDAT, IEND — parseable by any PNG reader. */
  def pngEncode(width: Long, height: Long, bitDepth: Long, colorType: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    out.write(PNG_SIG, 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = writeChunk(out, typ, data)
    val ihdr = new Array[Byte](13)
    def putBe32(a: Array[Byte], i: Int, v: Long): Unit = {
      a(i) = ((v >>> 24) & 0xff).toByte; a(i + 1) = ((v >>> 16) & 0xff).toByte
      a(i + 2) = ((v >>> 8) & 0xff).toByte; a(i + 3) = (v & 0xff).toByte
    }
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte
    // compression/filter/interlace: the spec's only legal values
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk("IHDR", ihdr)
    chunk("IDAT", Array.emptyByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Build a canonical 44-byte PCM WAV header (+ empty data chunk). */
  def wavEncode(sampleRate: Long, channels: Long, bitsPerSample: Long): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val byteRate = sampleRate * blockAlign
    val b = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36) // riff size: 4 + (8+16) + (8+0)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                                // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate.toInt)
      .putInt(byteRate.toInt)
      .putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(0)
    b.array()
  }

  /** The planted PCM sample stream: sample k of a payload seeded by
    * `seed` is ((seed + k) * 2654435761) mod 65536 - 32768 — a full-
    * range 16-bit value the oracle recomputes arithmetically, so an
    * encode/decode bug cannot cancel out (same posture as q127's
    * header fields). */
  private def pcmSample(seed: Long, k: Long): Int =
    (((seed + k) * 2654435761L) % 65536L - 32768L).toInt

  /** Build a COMPLETE 16-bit PCM WAV: RIFF/WAVE, fmt, `nSamples`
    * deterministic samples ([[pcmSample]]) in a data chunk — the
    * payload [[wavPcmWindows]] decodes for real. Seeds with
    * seed mod 7 == 3 carry a LIST/INFO chunk between fmt and data, so
    * any consumer assuming PCM starts at byte 44 breaks: locating the
    * data chunk requires the generic RIFF walk. */
  def wavEncodePcm(sampleRate: Long, channels: Long, nSamples: Long,
      seed: Long): Array[Byte] = {
    val n = nSamples.toInt
    val dataBytes = n * 2
    val withList = seed % 7 == 3
    val listBytes = if (withList) 8 + 4 else 0
    val riffSize = 4 + (8 + 16) + listBytes + (8 + dataBytes)
    val blockAlign = channels * 2
    val b = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                                // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate.toInt)
      .putInt((sampleRate * blockAlign).toInt)
      .putShort(blockAlign.toShort)
      .putShort(16)
    if (withList)
      b.put("LIST".getBytes("US-ASCII")).putInt(4)
        .put("INFO".getBytes("US-ASCII"))
    b.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var k = 0
    while (k < n) { b.putShort(pcmSample(seed, k).toShort); k += 1 }
    b.array()
  }

  /** REAL sample decode: walk the RIFF chunks (odd-size padding, LIST
    * chunks skipped — byte 44 is NOT assumed), require 16-bit PCM,
    * read the little-endian samples and aggregate them into windows of
    * `win` samples. Per window: (window_id, n_samples, sum_amp,
    * peak_amp) — all exact integers, the frame-level feature a real
    * audio pipeline computes after decimation (q123's stride sampler
    * with the decode made real). Null for anything that isn't a
    * well-formed 16-bit PCM WAV; a sampleless payload yields an empty
    * array. A short tail window reports its true n_samples. */
  /** Shared RIFF walk for the PCM decoders: locate the 16-bit PCM data
    * chunk (odd-size padding, LIST chunks skipped — byte 44 is NOT
    * assumed). Returns (dataPos, nSamples) or null for anything that
    * is not a well-formed 16-bit PCM WAV. */
  private def pcm16Data(p: Array[Byte]): (Int, Int) = {
    if (p == null || !isWav(p)) return null
    var pos = 12
    var bits = -1
    var dataPos = -1
    var dataLen = 0L
    while (pos + 8 <= p.length && dataPos < 0) {
      // Long chunk size: same Int-wrap guard as the mediaInfo walks
      val sz = le32(p, pos + 4)
      if (sz > p.length.toLong - pos - 8) return null
      if (p(pos) == 'f' && p(pos + 1) == 'm' &&
          p(pos + 2) == 't' && p(pos + 3) == ' ') {
        if (sz < 16 || le16(p, pos + 8) != 1) return null // PCM only
        bits = le16(p, pos + 22)
      } else if (p(pos) == 'd' && p(pos + 1) == 'a' &&
          p(pos + 2) == 't' && p(pos + 3) == 'a') {
        dataPos = pos + 8; dataLen = sz
      }
      pos += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (bits != 16 || dataPos < 0) return null
    (dataPos, (dataLen / 2).toInt)
  }

  def wavPcmWindows(p: Array[Byte], win: Long)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    if (win <= 0) return null
    val pd = pcm16Data(p)
    if (pd == null) return null
    val (dataPos, n) = pd
    val w = math.min(win, Int.MaxValue.toLong).toInt
    val nWin = if (n == 0) 0 else (n + w - 1) / w
    val rows = new Array[Any](nWin)
    var widx = 0
    while (widx < nWin) {
      var k = widx * w
      val end = math.min(n, k + w)
      val cnt = end - k
      var sum = 0L
      var peak = 0L
      while (k < end) {
        // sign-extend the LE 16-bit sample
        val v = le16(p, dataPos + 2 * k).toShort.toLong
        sum += v
        if (math.abs(v) > peak) peak = math.abs(v)
        k += 1
      }
      val r = new GenericInternalRow(4)
      r.setLong(0, widx.toLong); r.setLong(1, cnt.toLong)
      r.setLong(2, sum); r.setLong(3, peak)
      rows(widx) = r
      widx += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** Noisiness featurizer over the same decoded PCM stream: per window
    * of `win` samples the exact integer (window_id, n_samples, zcr,
    * sum_abs) — zero-crossing count (a crossing at sample k > 0 iff
    * sign-class(v_k) != sign-class(v_{k-1}) with v >= 0 as the
    * non-negative class; crossings belong to the window holding k,
    * including across a window boundary) and L1 loudness. ZCR is the
    * spectral-free voiced/unvoiced discriminator; with sum_abs it is
    * the triage a silence-trim / noise-filter pass runs before any
    * codec-specific analysis. Same RIFF-walk contract as
    * [[wavPcmWindows]]: null for non-PCM-16 payloads. */
  def wavZcrWindows(p: Array[Byte], win: Long)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    if (win <= 0) return null
    val pd = pcm16Data(p)
    if (pd == null) return null
    val (dataPos, n) = pd
    val w = math.min(win, Int.MaxValue.toLong).toInt
    val nWin = if (n == 0) 0 else (n + w - 1) / w
    val rows = new Array[Any](nWin)
    var widx = 0
    while (widx < nWin) {
      var k = widx * w
      val end = math.min(n, k + w)
      val cnt = end - k
      var zcr = 0L
      var l1 = 0L
      while (k < end) {
        val v = le16(p, dataPos + 2 * k).toShort.toLong
        if (k > 0) {
          val pv = le16(p, dataPos + 2 * (k - 1)).toShort.toLong
          if ((v >= 0) != (pv >= 0)) zcr += 1
        }
        l1 += math.abs(v)
        k += 1
      }
      val r = new GenericInternalRow(4)
      r.setLong(0, widx.toLong); r.setLong(1, cnt.toLong)
      r.setLong(2, zcr); r.setLong(3, l1)
      rows(widx) = r
      widx += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = data.length
    out.write((len >>> 24) & 0xff); out.write((len >>> 16) & 0xff)
    out.write((len >>> 8) & 0xff); out.write(len & 0xff)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(data, 0, len)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    val c = crc.getValue
    out.write(((c >>> 24) & 0xff).toInt); out.write(((c >>> 16) & 0xff).toInt)
    out.write(((c >>> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
  }

  /** PNG spec §9.4 Paeth predictor — exact integer form. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** The planted gray pixel stream: pixel (x, y) of a payload seeded
    * by `seed` is ((seed + y*w + x) * 2654435761) mod 256, plus a
    * brightness offset mod 256 — the same oracle-recomputable
    * construction as [[pcmSample]], so an encode/decode bug cannot
    * cancel out. */
  private def grayPixel(seed: Long, idx: Long, bright: Long): Int =
    ((((seed + idx) * 2654435761L) % 256L + bright) % 256L).toInt

  /** Build a COMPLETE 8-bit grayscale PNG: signature, IHDR, a real
    * zlib-deflated IDAT carrying `width`x`height` deterministic
    * pixels ([[grayPixel]]), IEND. Scanline y is filtered with type
    * y mod 5, so a decoder must implement ALL FIVE spec filters
    * (None/Sub/Up/Average/Paeth) to read any image taller than 4
    * rows — a byte-44-style shortcut cannot work. */
  def pngEncodeGray(width: Long, height: Long, seed: Long,
      bright: Long): Array[Byte] = {
    val w = width.toInt; val h = height.toInt
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 24),
      s"pngEncodeGray: unsupported dims ${w}x$h")
    val raw = new Array[Byte]((1 + w) * h)
    var y = 0
    while (y < h) {
      val rowOff = (1 + w) * y
      val ft = y % 5
      raw(rowOff) = ft.toByte
      var x = 0
      while (x < w) {
        val cur = grayPixel(seed, y.toLong * w + x, bright)
        val left = if (x > 0) grayPixel(seed, y.toLong * w + x - 1, bright) else 0
        val up = if (y > 0) grayPixel(seed, (y - 1).toLong * w + x, bright) else 0
        val ul = if (x > 0 && y > 0)
          grayPixel(seed, (y - 1).toLong * w + x - 1, bright) else 0
        val filtered = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(rowOff + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    while (!deflater.finished())
      zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream(zout.size + 64)
    out.write(PNG_SIG, 0, 8)
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >>> 24) & 0xff).toByte; ihdr(1) = ((w >>> 16) & 0xff).toByte
    ihdr(2) = ((w >>> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >>> 24) & 0xff).toByte; ihdr(5) = ((h >>> 16) & 0xff).toByte
    ihdr(6) = ((h >>> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8; ihdr(9) = 0; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", zout.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** REAL pixel decode: signature + chunk walk (ancillary chunks
    * skipped — tEXt/pHYs from real encoders parse through), IHDR
    * (8-bit depth; gray / truecolor / truecolor-alpha; no interlace),
    * ALL IDAT chunks concatenated and inflated, per-scanline unfilter
    * (all five spec filter types, bpp-aware), then luminance: gray
    * passes through, RGB(A) collapses as (r+g+b)/3 integer division
    * (alpha ignored). Returns (width, height, gray bytes row-major)
    * or null for anything unsupported/corrupt — including images over
    * 16M pixels (decompression-bomb guard: at 100 TB a hostile
    * payload must fail the row, not the executor). */
  private[graft] def pngDecodeGray(p: Array[Byte]): (Int, Int, Array[Int]) = {
    if (p == null || !isPng(p)) return null
    var w = 0; var h = 0; var depth = -1; var color = -1; var interlace = -1
    val idat = new java.io.ByteArrayOutputStream(1024)
    var pos = 8
    var sawIhdr = false
    var done = false
    while (!done && pos + 8 <= p.length) {
      val len = be32(p, pos)
      if (len > p.length.toLong - pos - 12) return null
      val t0 = p(pos + 4); val t1 = p(pos + 5); val t2 = p(pos + 6); val t3 = p(pos + 7)
      if (t0 == 'I' && t1 == 'H' && t2 == 'D' && t3 == 'R') {
        if (len < 13) return null
        w = be32(p, pos + 8).toInt; h = be32(p, pos + 12).toInt
        depth = p(pos + 16) & 0xff; color = p(pos + 17) & 0xff
        interlace = p(pos + 20) & 0xff
        sawIhdr = true
      } else if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T') {
        idat.write(p, pos + 8, len.toInt)
      } else if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') {
        done = true
      }
      pos += 12 + len.toInt
    }
    if (!sawIhdr || depth != 8 || interlace != 0) return null
    val bpp = color match {
      case 0 => 1; case 2 => 3; case 6 => 4; case _ => return null
    }
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return null
    val stride = 1 + w * bpp
    val raw = new Array[Byte](stride * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return null // truncated stream
        got += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    if (got < raw.length) return null
    // unfilter in place (PNG spec §9: per-byte, bpp-offset left refs)
    var y = 0
    while (y < h) {
      val rowOff = stride * y
      val ft = raw(rowOff) & 0xff
      if (ft > 4) return null
      var x = 0
      while (x < w * bpp) {
        val i = rowOff + 1 + x
        val left = if (x >= bpp) raw(i - bpp) & 0xff else 0
        val up = if (y > 0) raw(i - stride) & 0xff else 0
        val ul = if (x >= bpp && y > 0) raw(i - stride - bpp) & 0xff else 0
        val recon = ft match {
          case 0 => raw(i) & 0xff
          case 1 => (raw(i) & 0xff) + left
          case 2 => (raw(i) & 0xff) + up
          case 3 => (raw(i) & 0xff) + (left + up) / 2
          case 4 => (raw(i) & 0xff) + paeth(left, up, ul)
        }
        raw(i) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val gray = new Array[Int](w * h)
    y = 0
    while (y < h) {
      val rowOff = stride * y + 1
      var x = 0
      while (x < w) {
        gray(y * w + x) =
          if (bpp == 1) raw(rowOff + x) & 0xff
          else ((raw(rowOff + x * bpp) & 0xff) + (raw(rowOff + x * bpp + 1) & 0xff) +
            (raw(rowOff + x * bpp + 2) & 0xff)) / 3
        x += 1
      }
      y += 1
    }
    (w, h, gray)
  }

  /** Per-scanline luminance features over a decoded PNG: one row per
    * scanline y — (y, n_px, sum_lum, min_lum, max_lum), all exact
    * integers (the image twin of [[wavPcmWindows]]). Null for
    * anything [[pngDecodeGray]] rejects. */
  def pngRowStats(p: Array[Byte])
      : org.apache.spark.sql.catalyst.util.ArrayData =
    rowStatsOf(pngDecodeGray(p))

  private def rowStatsOf(dec: (Int, Int, Array[Int]))
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    if (dec == null) return null
    val (w, h, gray) = dec
    val rows = new Array[Any](h)
    var y = 0
    while (y < h) {
      var sum = 0L; var mn = 255L; var mx = 0L
      var x = 0
      while (x < w) {
        val v = gray(y * w + x).toLong
        sum += v; if (v < mn) mn = v; if (v > mx) mx = v
        x += 1
      }
      val r = new GenericInternalRow(5)
      r.setLong(0, y.toLong); r.setLong(1, w.toLong)
      r.setLong(2, sum); r.setLong(3, mn); r.setLong(4, mx)
      rows(y) = r
      y += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** Perceptual difference hash (dHash, 64-bit) over a decoded PNG:
    * block-average the image onto a 9x8 luminance grid (cell of pixel
    * (x, y) is ((x*9) DIV w, (y*8) DIV h); mean = sum DIV count — all
    * integer, so an oracle recomputes it exactly), then bit cy*8+cx =
    * 1 iff mean(cx, cy) < mean(cx+1, cy). Brightness-shift tolerant
    * by construction (comparisons survive a constant offset except at
    * the mod-256 wrap), which is what makes it a near-dup key rather
    * than a content hash. Null when the decode fails or the image is
    * smaller than the 9x8 grid. */
  def pngDhash(p: Array[Byte]): java.lang.Long =
    dhashOf(pngDecodeGray(p))

  private def dhashOf(dec: (Int, Int, Array[Int])): java.lang.Long = {
    if (dec == null) return null
    val (w, h, gray) = dec
    if (w < 9 || h < 8) return null
    val sums = new Array[Long](9 * 8)
    val cnts = new Array[Long](9 * 8)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val c = cy * 9 + x * 9 / w
        sums(c) += gray(y * w + x)
        cnts(c) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val a = sums(cy * 9 + cx) / cnts(cy * 9 + cx)
        val b = sums(cy * 9 + cx + 1) / cnts(cy * 9 + cx + 1)
        if (a < b) hash |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    java.lang.Long.valueOf(hash)
  }

  // =====================================================================
  // JPEG baseline-sequential PIXEL decode (ITU T.81 §F.2) — the format
  // real web corpora are made of. Pure JVM: DQT (8/16-bit), generic DHT
  // canonical-Huffman build, SOF0/SOF1 frame parse, interleaved-scan
  // entropy decode with byte stuffing and restart markers, dequantize,
  // per-block double-precision IDCT. LUMA-ONLY reconstruction: chroma
  // blocks are entropy-decoded (the bitstream can't be skipped) but
  // never IDCT'd — the dedup/triage features downstream are luminance
  // features, so at 100 TB this skips ~2/3 of the IDCT work on 4:4:4
  // and ~1/3 on 4:2:0 payloads.
  // =====================================================================

  /** Zigzag position -> natural (row-major) coefficient index,
    * T.81 figure A.6. */
  private val ZIGZAG: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** IDCT basis M(a*8+b) = C(b)/2 * cos((2a+1) b pi / 16), so
    * s = M F M^T — the textbook separable form. */
  private val IDCT_M: Array[Double] = {
    val m = new Array[Double](64)
    var a = 0
    while (a < 8) {
      var b2 = 0
      while (b2 < 8) {
        val c = if (b2 == 0) 1.0 / math.sqrt(2.0) else 1.0
        m(a * 8 + b2) = c / 2.0 * math.cos((2 * a + 1) * b2 * math.Pi / 16.0)
        b2 += 1
      }
      a += 1
    }
    m
  }

  /** Canonical Huffman decode tables per T.81 F.2.2.3 (mincode/
    * maxcode/valptr indexed by code length 1..16). */
  private final class HTab(bits: Array[Int], val vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l) == 0) maxcode(l) = -1
        else {
          valptr(l) = k; mincode(l) = code
          k += bits(l); code += bits(l)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-segment bit reader: MSB-first, 0xFF00 unstuffing, marker
    * capture (a non-stuffed 0xFF xx ends the bit stream and parks the
    * marker for [[expectRst]]). nextBit returns -1 at end-of-data —
    * every caller treats that as a corrupt payload, never an index
    * error. */
  private final class JBits(p: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    var marker = 0
    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (marker != 0 || pos >= p.length) return -1
        var b = p(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= p.length) return -1
          val b2 = p(pos) & 0xff; pos += 1
          if (b2 != 0) { marker = b2; return -1 }
        }
        bitBuf = b; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >>> bitCnt) & 1
    }
    /** T.81 RECEIVE: s raw bits, Int.MinValue on truncation. */
    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) {
        val b = nextBit(); if (b < 0) return Int.MinValue
        v = (v << 1) | b; i += 1
      }
      v
    }
    /** Byte-align and consume the expected RSTn marker (fill 0xFF
      * bytes tolerated per §B.1.1.2). */
    def expectRst(): Boolean = {
      bitCnt = 0
      if (marker == 0) {
        if (pos + 1 >= p.length || (p(pos) & 0xff) != 0xff) return false
        var q = pos + 1
        while (q < p.length && (p(q) & 0xff) == 0xff) q += 1
        if (q >= p.length) return false
        marker = p(q) & 0xff; pos = q + 1
      }
      val ok = marker >= 0xd0 && marker <= 0xd7
      if (ok) marker = 0
      ok
    }
  }

  /** T.81 EXTEND: map s received bits to the signed coefficient. */
  private def jExtend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def huffDecode(bits: JBits, t: HTab): Int = {
    var code = bits.nextBit(); if (code < 0) return -1
    var l = 1
    while (l <= 16 && code > t.maxcode(l)) {
      val b = bits.nextBit(); if (b < 0) return -1
      code = (code << 1) | b; l += 1
    }
    if (l > 16) return -1
    val idx = t.valptr(l) + code - t.mincode(l)
    if (idx < 0 || idx >= t.vals.length) return -1
    t.vals(idx)
  }

  /** Decode one block's coefficients (dequantized, natural order) into
    * `coef`; DC prediction updates in `pred(c)`. False on any
    * truncation/corruption. */
  private def jDecodeBlock(bits: JBits, dct: HTab, act: HTab,
      qtab: Array[Int], pred: Array[Int], c: Int,
      coef: Array[Int]): Boolean = {
    java.util.Arrays.fill(coef, 0)
    val t = huffDecode(bits, dct)
    if (t < 0 || t > 15) return false
    val dv = bits.receive(t)
    if (dv == Int.MinValue) return false
    pred(c) += jExtend(dv, t)
    coef(0) = pred(c) * qtab(0)
    var k = 1
    while (k < 64) {
      val rs = huffDecode(bits, act)
      if (rs < 0) return false
      val r = rs >> 4; val s = rs & 15
      if (s == 0) {
        if (r == 15) k += 16 // ZRL
        else return true     // EOB
      } else {
        k += r
        if (k > 63) return false
        val v = bits.receive(s)
        if (v == Int.MinValue) return false
        coef(ZIGZAG(k)) = jExtend(v, s) * qtab(k)
        k += 1
      }
    }
    true
  }

  /** Separable IDCT + level shift + clamp into `out` (row-major). */
  private def idct8x8(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += IDCT_M(x * 8 + u) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v2 = 0
        while (v2 < 8) { s += IDCT_M(y * 8 + v2) * tmp(v2 * 8 + x); v2 += 1 }
        val px = math.round(s).toInt + 128
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
  }

  /** REAL JPEG pixel decode, baseline/extended sequential Huffman
    * (SOF0/SOF1): full marker parse, canonical Huffman build from DHT,
    * interleaved single-scan entropy decode (byte stuffing, DRI/RSTn
    * with DC-predictor resets), dequantize, IDCT of the LUMA component
    * only (chroma blocks are entropy-decoded to advance the stream,
    * never reconstructed). Returns (width, height, luma bytes
    * row-major) or null for anything unsupported/corrupt: progressive
    * (SOF2+) and arithmetic-coded frames, non-8-bit precision,
    * multi-scan files, frames whose first component is not at maximum
    * sampling, truncated streams, and >16M-pixel decompression bombs
    * (a hostile payload must fail the ROW, not the executor). The
    * grayscale output convention is the Y channel itself (Rec.601 luma
    * for color JPEGs — what the encoder stored), vs the PNG path's
    * (r+g+b)/3 collapse of lossless RGB. */
  private[graft] def jpegDecodeGray(p: Array[Byte]): (Int, Int, Array[Int]) = {
    if (p == null || !isJpeg(p)) return null
    try jpegDecodeGray0(p)
    catch {
      // the marker walk bounds-checks every read, but a hostile
      // payload reaching a missed corner must fail the row, not the
      // task — same posture as pngDecodeGray's DataFormatException arm
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }

  private def jpegDecodeGray0(p: Array[Byte]): (Int, Int, Array[Int]) = {
    val qt = Array.ofDim[Int](4, 64) // zigzag order
    val qtSeen = new Array[Boolean](4)
    val htabs = Array.ofDim[HTab](2, 4)
    var w = 0; var h = 0; var ncomp = 0
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var compQ: Array[Int] = null; var compId: Array[Int] = null
    var scanDc: Array[Int] = null; var scanAc: Array[Int] = null
    var restartInterval = 0
    var sawSof = false
    var sosPos = -1
    var pos = 2
    while (sosPos < 0) {
      if (pos + 2 > p.length) return null
      if ((p(pos) & 0xff) != 0xff) return null
      val m = p(pos + 1) & 0xff
      if (m == 0xff) pos += 1 // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2
      else if (m == 0xd9) return null // EOI before SOS
      else {
        if (pos + 4 > p.length) return null
        val segLen = be16(p, pos + 2)
        if (segLen < 2 || segLen > p.length - pos - 2) return null
        var dp = pos + 4
        val dEnd = pos + 2 + segLen
        if (m == 0xdb) { // DQT
          while (dp < dEnd) {
            val pq = (p(dp) & 0xff) >> 4; val tq = p(dp) & 0x0f
            if (tq > 3 || pq > 1) return null
            val need = if (pq == 0) 64 else 128
            if (dp + 1 + need > dEnd) return null
            var i = 0
            while (i < 64) {
              qt(tq)(i) =
                if (pq == 0) p(dp + 1 + i) & 0xff
                else be16(p, dp + 1 + 2 * i)
              i += 1
            }
            qtSeen(tq) = true
            dp += 1 + need
          }
        } else if (m == 0xc4) { // DHT
          while (dp < dEnd) {
            val tc = (p(dp) & 0xff) >> 4; val th = p(dp) & 0x0f
            if (tc > 1 || th > 3 || dp + 17 > dEnd) return null
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) {
              bits(l) = p(dp + l) & 0xff; total += bits(l); l += 1
            }
            if (total > 256 || dp + 17 + total > dEnd) return null
            val vals = new Array[Int](total)
            var i = 0
            while (i < total) { vals(i) = p(dp + 17 + i) & 0xff; i += 1 }
            htabs(tc)(th) = new HTab(bits, vals)
            dp += 17 + total
          }
        } else if (m == 0xc0 || m == 0xc1) { // SOF0/SOF1
          if (sawSof || segLen < 8) return null
          if ((p(dp) & 0xff) != 8) return null // precision
          h = be16(p, dp + 1); w = be16(p, dp + 3)
          ncomp = p(dp + 5) & 0xff
          if (ncomp < 1 || ncomp > 4 || segLen != 8 + 3 * ncomp) return null
          compH = new Array[Int](ncomp); compV = new Array[Int](ncomp)
          compQ = new Array[Int](ncomp); compId = new Array[Int](ncomp)
          var c = 0
          while (c < ncomp) {
            compId(c) = p(dp + 6 + 3 * c) & 0xff
            val hv = p(dp + 7 + 3 * c) & 0xff
            compH(c) = hv >> 4; compV(c) = hv & 0x0f
            compQ(c) = p(dp + 8 + 3 * c) & 0xff
            if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 ||
              compV(c) > 4 || compQ(c) > 3) return null
            c += 1
          }
          sawSof = true
        } else if (isSof(m)) return null // progressive/arithmetic/lossless
        else if (m == 0xdd) { // DRI
          if (segLen != 4) return null
          restartInterval = be16(p, dp)
        } else if (m == 0xda) { // SOS
          if (!sawSof) return null
          val ns = p(dp) & 0xff
          // one interleaved scan only (what every baseline JFIF
          // encoder, ImageIO included, emits)
          if (ns != ncomp || segLen != 6 + 2 * ns) return null
          scanDc = new Array[Int](ncomp); scanAc = new Array[Int](ncomp)
          var i = 0
          while (i < ns) {
            val cs = p(dp + 1 + 2 * i) & 0xff
            var ci = -1
            var c = 0
            while (c < ncomp) { if (compId(c) == cs) ci = c; c += 1 }
            if (ci != i) return null // components in frame order
            val tdta = p(dp + 2 + 2 * i) & 0xff
            scanDc(ci) = tdta >> 4; scanAc(ci) = tdta & 0x0f
            if (scanDc(ci) > 3 || scanAc(ci) > 3) return null
            i += 1
          }
          sosPos = dEnd
        }
        // else: APPn / COM / unknown — skip
        if (sosPos < 0) pos = dEnd
      }
    }
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return null
    var hmax = 1; var vmax = 1
    var c = 0
    while (c < ncomp) {
      if (compH(c) > hmax) hmax = compH(c)
      if (compV(c) > vmax) vmax = compV(c)
      c += 1
    }
    // luma-only reconstruction requires the first component at full
    // resolution — true of every YCbCr/grayscale JFIF in the wild
    if (compH(0) != hmax || compV(0) != vmax) return null
    c = 0
    while (c < ncomp) {
      if (!qtSeen(compQ(c)) || htabs(0)(scanDc(c)) == null ||
        htabs(1)(scanAc(c)) == null) return null
      c += 1
    }
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val gray = new Array[Int](w * h)
    val bits = new JBits(p, sosPos)
    val pred = new Array[Int](ncomp)
    val coef = new Array[Int](64)
    val blk = new Array[Int](64)
    val totalMcus = mcusX.toLong * mcusY
    var mcu = 0L
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!bits.expectRst()) return null
        java.util.Arrays.fill(pred, 0)
      }
      val my = (mcu / mcusX).toInt; val mx = (mcu % mcusX).toInt
      c = 0
      while (c < ncomp) {
        val qtab = qt(compQ(c))
        val dct = htabs(0)(scanDc(c)); val act = htabs(1)(scanAc(c))
        var bv = 0
        while (bv < compV(c)) {
          var bh = 0
          while (bh < compH(c)) {
            if (!jDecodeBlock(bits, dct, act, qtab, pred, c, coef))
              return null
            if (c == 0) {
              idct8x8(coef, blk)
              val px0 = (mx * compH(0) + bh) * 8
              val py0 = (my * compV(0) + bv) * 8
              var yy = 0
              while (yy < 8) {
                val py = py0 + yy
                if (py < h) {
                  var xx = 0
                  while (xx < 8) {
                    val px = px0 + xx
                    if (px < w) gray(py * w + px) = blk(yy * 8 + xx)
                    xx += 1
                  }
                }
                yy += 1
              }
            }
            bh += 1
          }
          bv += 1
        }
        c += 1
      }
      mcu += 1
    }
    (w, h, gray)
  }

  /** The planted JPEG block stream: 8x8 block bi (raster order) of a
    * payload seeded by `seed` is the FLAT value (((x*x + x) *
    * 2654435761) DIV 65536) mod 256 + bright mod 256 with x =
    * (seed + bi) mod 32768 — flat blocks survive quantize/dequantize
    * EXACTLY under an all-ones table (DC = 8 * (v - 128) is integral;
    * AC all zero), so the decode is oracle-recomputable arithmetically
    * even though JPEG is lossy in general. The QUADRATIC argument
    * matters: any f(seed + bi) with f multiplicative-hash-then-mod
    * steps near-linearly block to block (low byte: exactly +177;
    * bits 16-23: +55/56), which collapses the dHash comparison
    * pattern across seeds — x*x+x decorrelates the steps (verified:
    * zero cross-seed dHash pairs at d <= 12 over the fixture's gid
    * range). The mod-32768 clamp keeps (x*x + x) * 2654435761 inside
    * a signed 64-bit long at ANY corpus scale — both engines must
    * agree, and DuckDB would widen where a Spark long wraps. */
  private def jpegBlockVal(seed: Long, bi: Long, bright: Long): Int = {
    val x = (seed + bi) % 32768L
    ((((x * x + x) * 2654435761L) >> 16) % 256L + bright) % 256L
  }.toInt

  /** MSB-first bit writer with JPEG byte stuffing (0xFF -> 0xFF 0x00)
    * and all-ones final-byte padding (§F.1.2.3). */
  private final class JBitsOut(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def putBit(b: Int): Unit = {
      buf = (buf << 1) | b; cnt += 1
      if (cnt == 8) {
        out.write(buf)
        if (buf == 0xff) out.write(0)
        buf = 0; cnt = 0
      }
    }
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { putBit((v >>> i) & 1); i -= 1 }
    }
    def flush(): Unit = while (cnt != 0) putBit(1)
  }

  /** Build a COMPLETE baseline JPEG: SOI, all-ones DQT, SOF0, minimal
    * canonical DHTs (12 DC categories at length 4; a single length-1
    * EOB code for AC), SOS, a REAL Huffman-coded entropy stream of
    * ceil(w/8)*ceil(h/8) flat [[jpegBlockVal]] blocks (DC
    * differentially coded per the spec, byte stuffing live), EOI.
    * Decoding requires the full baseline machinery — DHT canonical
    * build, DC prediction, EXTEND, dequantize, IDCT — yet the pixel
    * field is exactly the block formula, so an arithmetic oracle can
    * certify the decode end-to-end (the JPEG twin of
    * [[pngEncodeGray]]). */
  def jpegEncodeGrayFlat(width: Long, height: Long, seed: Long,
      bright: Long): Array[Byte] =
    jpegEncodeGrayFlatRst(width, height, seed, bright, 0L)

  /** [[jpegEncodeGrayFlat]] with a restart interval: DRI segment +
    * RSTn markers every `restartInterval` MCUs (predictor resets,
    * 1-padded byte alignment per §F.1.2.3) — exercises the decoder's
    * restart path with a real bitstream (spec-only; the query tier
    * plants restart-free payloads). */
  def jpegEncodeGrayFlatRst(width: Long, height: Long, seed: Long,
      bright: Long, restartInterval: Long): Array[Byte] = {
    val w = width.toInt; val h = height.toInt
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 24),
      s"jpegEncodeGrayFlat: unsupported dims ${w}x$h")
    val rst = restartInterval.toInt
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val out = new java.io.ByteArrayOutputStream(64 + bw * bh * 3)
    def b8(v: Int): Unit = out.write(v & 0xff)
    def be(v: Int): Unit = { b8(v >>> 8); b8(v) }
    b8(0xff); b8(0xd8)                    // SOI
    b8(0xff); b8(0xdb); be(2 + 1 + 64)    // DQT: pq=0 tq=0, all ones
    b8(0x00)
    var i = 0
    while (i < 64) { b8(1); i += 1 }
    b8(0xff); b8(0xc0); be(8 + 3)         // SOF0
    b8(8); be(h); be(w); b8(1)
    b8(1); b8(0x11); b8(0)                // comp 1, 1x1, qtable 0
    b8(0xff); b8(0xc4); be(2 + 1 + 16 + 12) // DHT DC0: 12 codes @ len 4
    b8(0x00)
    var l = 1
    while (l <= 16) { b8(if (l == 4) 12 else 0); l += 1 }
    i = 0
    while (i < 12) { b8(i); i += 1 }
    b8(0xff); b8(0xc4); be(2 + 1 + 16 + 1) // DHT AC0: EOB @ len 1
    b8(0x10)
    l = 1
    while (l <= 16) { b8(if (l == 1) 1 else 0); l += 1 }
    b8(0x00)
    if (rst > 0) { b8(0xff); b8(0xdd); be(4); be(rst) } // DRI
    b8(0xff); b8(0xda); be(6 + 2)         // SOS
    b8(1); b8(1); b8(0x00); b8(0); b8(63); b8(0)
    val bits = new JBitsOut(out)
    var pred = 0
    var bi = 0
    var rstN = 0
    val nBlocks = bw * bh
    while (bi < nBlocks) {
      if (rst > 0 && bi > 0 && bi % rst == 0) {
        bits.flush() // 1-padding byte-aligns; the writer is empty after
        b8(0xff); b8(0xd0 + rstN)
        rstN = (rstN + 1) % 8
        pred = 0
      }
      val v = jpegBlockVal(seed, bi, bright)
      val dc = 8 * (v - 128)
      val diff = dc - pred
      pred = dc
      var s = 0; var ad = math.abs(diff)
      while (ad > 0) { s += 1; ad >>= 1 }
      bits.put(s, 4)                      // canonical len-4 code == s
      if (s > 0)
        bits.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      bits.putBit(0)                      // EOB
      bi += 1
    }
    bits.flush()
    b8(0xff); b8(0xd9)                    // EOI
    out.toByteArray
  }

  /** ITU T.81 Annex K Table K.1 — the standard LUMINANCE quantization
    * table (natural raster order) every libjpeg-lineage encoder scales
    * by its quality knob. Public spec constants. */
  private[graft] val JPEG_STD_LUMA: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** The libjpeg quality->table mapping (jcparam.c's public formula):
    * scale = q < 50 ? 5000/q : 200 - 2q (integer), entry =
    * clamp((K*scale + 50)/100, 1, 255). Natural order. */
  private[graft] def jpegQuantScaled(quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality $quality")
    val s = if (quality < 50) 5000 / quality else 200 - 2 * quality
    JPEG_STD_LUMA.map(k => math.max(1, math.min(255, (k * s + 50) / 100)))
  }

  /** [[jpegEncodeGrayFlat]] with a libjpeg-style quality knob: the DQT
    * carries [[jpegQuantScaled]] (written in zigzag order per the
    * spec) instead of all-ones, and each block's DC coefficient is
    * quantized by entry 0 before entropy coding — the payload is a
    * spec-valid lossy baseline JPEG whose quant table a triage pass
    * (q246) can recover the encoder's quality setting from. */
  def jpegEncodeGrayQ(width: Long, height: Long, seed: Long,
      bright: Long, quality: Long): Array[Byte] = {
    val w = width.toInt; val h = height.toInt
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 24),
      s"jpegEncodeGrayQ: unsupported dims ${w}x$h")
    val tq = jpegQuantScaled(quality.toInt)
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val out = new java.io.ByteArrayOutputStream(64 + bw * bh * 3)
    def b8(v: Int): Unit = out.write(v & 0xff)
    def be(v: Int): Unit = { b8(v >>> 8); b8(v) }
    b8(0xff); b8(0xd8)                    // SOI
    b8(0xff); b8(0xdb); be(2 + 1 + 64)    // DQT: pq=0 tq=0, zigzag order
    b8(0x00)
    var i = 0
    while (i < 64) { b8(tq(ZIGZAG(i))); i += 1 }
    b8(0xff); b8(0xc0); be(8 + 3)         // SOF0
    b8(8); be(h); be(w); b8(1)
    b8(1); b8(0x11); b8(0)                // comp 1, 1x1, qtable 0
    b8(0xff); b8(0xc4); be(2 + 1 + 16 + 12) // DHT DC0: 12 codes @ len 4
    b8(0x00)
    var l = 1
    while (l <= 16) { b8(if (l == 4) 12 else 0); l += 1 }
    i = 0
    while (i < 12) { b8(i); i += 1 }
    b8(0xff); b8(0xc4); be(2 + 1 + 16 + 1) // DHT AC0: EOB @ len 1
    b8(0x10)
    l = 1
    while (l <= 16) { b8(if (l == 1) 1 else 0); l += 1 }
    b8(0x00)
    b8(0xff); b8(0xda); be(6 + 2)         // SOS
    b8(1); b8(1); b8(0x00); b8(0); b8(63); b8(0)
    val bits = new JBitsOut(out)
    var pred = 0
    var bi = 0
    val nBlocks = bw * bh
    while (bi < nBlocks) {
      val v = jpegBlockVal(seed, bi, bright)
      val dc = 8 * (v - 128) / tq(0)      // quantized DC, truncation
      val diff = dc - pred
      pred = dc
      var s = 0; var ad = math.abs(diff)
      while (ad > 0) { s += 1; ad >>= 1 }
      bits.put(s, 4)                      // canonical len-4 code == s
      if (s > 0)
        bits.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      bits.putBit(0)                      // EOB
      bi += 1
    }
    bits.flush()
    b8(0xff); b8(0xd9)                    // EOI
    out.toByteArray
  }

  /** Parse a JPEG's marker stream and return quant table 0 — the
    * luminance table — AS STORED (zigzag order; entry 0 is the DC
    * step in either order), 64 longs. Null for non-JPEG bytes, a
    * missing table, or a malformed segment. The honest byte-level
    * triage input: q246 inverts libjpeg's quality mapping from it. */
  def jpegDqt(p: Array[Byte])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    if (p == null || !isJpeg(p)) return null
    var pos = 2
    while (pos + 4 <= p.length) {
      if ((p(pos) & 0xff) != 0xff) return null
      val m = p(pos + 1) & 0xff
      if (m == 0xff) { pos += 1 }
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2
      else if (m == 0xd9 || m == 0xda) return null // EOI/SOS: no DQT0
      else {
        val segLen = be16(p, pos + 2)
        if (segLen < 2 || segLen > p.length - pos - 2) return null
        var dp = pos + 4
        val dEnd = pos + 2 + segLen
        if (m == 0xdb) {
          while (dp < dEnd) {
            val pq = (p(dp) & 0xff) >> 4; val tq = p(dp) & 0x0f
            if (tq > 3 || pq > 1) return null
            val need = if (pq == 0) 64 else 128
            if (dp + 1 + need > dEnd) return null
            if (tq == 0) {
              val out = new Array[Long](64)
              var i = 0
              while (i < 64) {
                out(i) =
                  if (pq == 0) (p(dp + 1 + i) & 0xff).toLong
                  else be16(p, dp + 1 + 2 * i).toLong
                i += 1
              }
              return org.apache.spark.sql.catalyst.util.ArrayData
                .toArrayData(out)
            }
            dp += 1 + need
          }
        }
        pos = dEnd
      }
    }
    null
  }

  /** Format-dispatching pixel decode: PNG or baseline JPEG by magic
    * bytes, null otherwise — the single entry the image feature
    * kernels route through so a mixed-format corpus needs one plan. */
  private[graft] def imageDecodeGray(p: Array[Byte]): (Int, Int, Array[Int]) =
    if (p == null) null
    else if (isPng(p)) pngDecodeGray(p)
    else if (isJpeg(p)) jpegDecodeGray(p)
    else null

  /** [[pngRowStats]]'s per-scanline features over EITHER format
    * (PNG inflate+unfilter or JPEG Huffman+IDCT luma). */
  def imageRowStats(p: Array[Byte])
      : org.apache.spark.sql.catalyst.util.ArrayData =
    rowStatsOf(imageDecodeGray(p))

  /** [[pngDhash]]'s 64-bit perceptual hash over EITHER format. */
  def imageDhash(p: Array[Byte]): java.lang.Long =
    dhashOf(imageDecodeGray(p))

  /** Build a spec-valid JPEG header: SOI, APP0/JFIF, SOF0 frame header
    * with the dimensions and component count, EOI — the marker
    * structure any JPEG reader's header pass accepts (no entropy
    * stream; 32 + 3*components bytes). */
  def jpegEncode(width: Long, height: Long, components: Long): Array[Byte] = {
    val n = components.toInt
    val b = java.nio.ByteBuffer.allocate(32 + 3 * n) // big-endian default
    b.put(0xff.toByte).put(0xd8.toByte)              // SOI
      .put(0xff.toByte).put(0xe0.toByte).putShort(16)// APP0, len 16
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .put(1.toByte).put(1.toByte)                   // version 1.1
      .put(0.toByte)                                 // units: none
      .putShort(1).putShort(1)                       // aspect 1:1
      .put(0.toByte).put(0.toByte)                   // no thumbnail
      .put(0xff.toByte).put(0xc0.toByte)             // SOF0 (baseline)
      .putShort((8 + 3 * n).toShort)
      .put(8.toByte)                                 // precision
      .putShort(height.toShort).putShort(width.toShort)
      .put(n.toByte)
    var c = 0
    while (c < n) {
      b.put((c + 1).toByte).put(0x11.toByte).put(0.toByte)
      c += 1
    }
    b.put(0xff.toByte).put(0xd9.toByte)              // EOI
    b.array()
  }

  // ===================================================================
  // ISO-BMFF / MP4 container triage (ISO/IEC 14496-12 §4.2 box model):
  // ftyp brand + moov/mvhd timescale+duration + per-trak hdlr handler
  // walk — the q127/q226 header-triage pattern extended to video
  // payloads. Box walk only, no codec work (the brief's multimodal
  // posture: metadata and routing are real, sample decode is out of
  // container scope).
  // ===================================================================

  private[graft] def isMp4(p: Array[Byte]): Boolean =
    p.length >= 12 && p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'

  private def be64(p: Array[Byte], i: Int): Long =
    (be32(p, i) << 32) | be32(p, i + 4)

  /** Full size of the box at `pos` (bounded by `end`), honoring the
    * spec's three size encodings: size==1 -> 64-bit largesize follows
    * the type; size==0 -> box extends to `end`. Returns -1 when the
    * header doesn't fit, the size field is smaller than its own
    * header, or the box overruns `end` — every malformed shape a
    * truncated/corrupt upload produces. All comparisons in Long space
    * (the PNG walk's Int-wrap lesson). */
  private def boxLen(p: Array[Byte], pos: Int, end: Int): Long = {
    if (pos + 8 > end) return -1L
    val sz = be32(p, pos)
    val full: Long =
      if (sz == 1L) {
        if (pos + 16 > end) return -1L
        val l = be64(p, pos + 8)
        if (l < 16L) return -1L else l
      } else if (sz == 0L) (end - pos).toLong
      else if (sz < 8L) return -1L
      else sz
    if (full > end.toLong - pos) -1L else full
  }

  private def boxIs(p: Array[Byte], pos: Int, t: String): Boolean =
    p(pos + 4) == t.charAt(0).toByte && p(pos + 5) == t.charAt(1).toByte &&
      p(pos + 6) == t.charAt(2).toByte && p(pos + 7) == t.charAt(3).toByte

  /** Walk result for the moov subtree: (timescale, duration, nTracks,
    * nVideo, nAudio) or null when any child box is malformed or mvhd
    * is absent. */
  private def walkMoov(p: Array[Byte], start: Int, end: Int): Array[Long] = {
    var pos = start
    var ts = -1L; var dur = -1L
    var nT = 0L; var nV = 0L; var nA = 0L
    while (pos < end) {
      val len = boxLen(p, pos, end)
      if (len < 0) return null
      if (boxIs(p, pos, "mvhd")) {
        // FullBox: version at +8; v0 = 32-bit times, v1 = 64-bit
        if (pos + 9 > end) return null
        val v = p(pos + 8) & 0xff
        if (v == 0) {
          if (len < 28) return null
          ts = be32(p, pos + 20); dur = be32(p, pos + 24)
        } else if (v == 1) {
          if (len < 40) return null
          ts = be32(p, pos + 28); dur = be64(p, pos + 32)
        } else return null
      } else if (boxIs(p, pos, "trak")) {
        nT += 1
        val h = walkTrak(p, pos + 8, pos + len.toInt)
        if (h == null) return null
        if (h == "vide") nV += 1 else if (h == "soun") nA += 1
      }
      pos += len.toInt
    }
    if (pos != end || ts < 0) null else Array(ts, dur, nT, nV, nA)
  }

  /** Handler type ("vide"/"soun"/other 4cc, "" when the trak carries
    * no hdlr) of one trak subtree; null on a malformed child box. */
  private def walkTrak(p: Array[Byte], start: Int, end: Int): String = {
    var pos = start
    var handler = ""
    while (pos < end) {
      val len = boxLen(p, pos, end)
      if (len < 0) return null
      if (boxIs(p, pos, "mdia")) {
        var mp = pos + 8
        val mend = pos + len.toInt
        while (mp < mend) {
          val ml = boxLen(p, mp, mend)
          if (ml < 0) return null
          // hdlr FullBox: vf(4) pre_defined(4) handler_type(4)
          if (boxIs(p, mp, "hdlr")) {
            if (ml < 20) return null
            handler = new String(p, mp + 16, 4, "ISO-8859-1")
          }
          mp += ml.toInt
        }
        if (mp != mend) return null
      }
      pos += len.toInt
    }
    if (pos != end) null else handler
  }

  /** MP4 triage struct (brand, timescale, duration, n_tracks, n_video,
    * n_audio, valid). The brand is readable from the sniffed ftyp
    * header even when the box walk rejects a truncated payload;
    * every other field is populated only from a CLEAN walk (top-level
    * boxes tile the payload exactly, moov children tile moov, mvhd
    * present) — the corrupt-upload arm reports brand + valid=false +
    * nulls, exactly mediaInfo's posture. */
  def mp4Info(p: Array[Byte]): InternalRow = {
    val r = new GenericInternalRow(7)
    r.setBoolean(6, false)
    if (p == null || !isMp4(p)) return r
    r.update(0, UTF8String.fromString(new String(p, 8, 4, "ISO-8859-1").trim))
    var pos = 0
    var moov: Array[Long] = null
    var sawMoov = false
    while (pos < p.length) {
      val len = boxLen(p, pos, p.length)
      if (len < 0) return r
      if (boxIs(p, pos, "moov")) {
        sawMoov = true
        moov = walkMoov(p, pos + 8, pos + len.toInt)
        if (moov == null) return r
      }
      pos += len.toInt
    }
    if (pos != p.length || !sawMoov) return r
    r.setLong(1, moov(0)); r.setLong(2, moov(1))
    r.setLong(3, moov(2)); r.setLong(4, moov(3)); r.setLong(5, moov(4))
    r.setBoolean(6, true)
    r
  }

  /** Build a spec-valid minimal MP4: ftyp (brand from a 4-entry table)
    * + moov{mvhd v0, per-track trak{tkhd, mdia{mdhd, hdlr}}} — video
    * tracks first, then audio; every box size exact so the triage
    * walk's tiling check holds. No mdat: header-only, the same
    * "metadata real, samples out of scope" posture as pngEncode. */
  def mp4Encode(brandIdx: Long, timescale: Long, duration: Long,
      nVideo: Long, nAudio: Long): Array[Byte] = {
    val brands = Array("isom", "mp42", "avc1", "qt  ")
    val brand = brands(((brandIdx % 4 + 4) % 4).toInt)
    val nT = nVideo + nAudio
    val out = new java.io.ByteArrayOutputStream(256)
    def w32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def w16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def str(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def zeros(n: Int): Unit = { var i = 0; while (i < n) { out.write(0); i += 1 } }
    def matrix(): Unit = {
      w32(0x10000L); w32(0); w32(0); w32(0); w32(0x10000L); w32(0)
      w32(0); w32(0); w32(0x40000000L)
    }
    // ftyp (24): major brand, minor version, two compatible brands
    w32(24); str("ftyp"); str(brand); w32(0x200L); str(brand); str("isom")
    val trakSize = 8 + 92 + (8 + 32 + 33)            // tkhd + mdia{mdhd,hdlr}
    w32(8 + 108 + nT * trakSize); str("moov")
    // mvhd v0 (108): vf, times, timescale, duration, rate, volume,
    // reserved(10), matrix, pre_defined(24), next_track_ID
    w32(108); str("mvhd"); w32(0); w32(0); w32(0)
    w32(timescale); w32(duration)
    w32(0x10000L); w16(0x100); zeros(10); matrix(); zeros(24); w32(nT + 1)
    var i = 0L
    while (i < nT) {
      val isVid = i < nVideo
      w32(trakSize); str("trak")
      // tkhd v0 (92): vf(flags=3 enabled+in-movie), times, id,
      // reserved, duration, reserved(8), layer/alt/volume/reserved,
      // matrix, fixed-point width/height (320x240 for video, 0 audio)
      w32(92); str("tkhd"); w32(3); w32(0); w32(0); w32(i + 1); w32(0)
      w32(duration); zeros(8); w16(0); w16(0)
      w16(if (isVid) 0 else 0x100); w16(0); matrix()
      w32(if (isVid) 0x01400000L else 0L); w32(if (isVid) 0x00F00000L else 0L)
      w32(8 + 32 + 33); str("mdia")
      // mdhd v0 (32): vf, times, timescale, duration, language 'und'
      w32(32); str("mdhd"); w32(0); w32(0); w32(0)
      w32(timescale); w32(duration); w16(0x55c4); w16(0)
      // hdlr (33): vf, pre_defined, handler, reserved(12), empty name
      w32(33); str("hdlr"); w32(0); w32(0)
      str(if (isVid) "vide" else "soun"); zeros(12); out.write(0)
      i += 1
    }
    out.toByteArray
  }
}
