package graft

import graft.expressions.SketchKernel
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-10 kernels, each checked against an
  * independent naive Scala implementation over generated inputs (the
  * JsonAlgebraPropSpec pattern: ScalaCheck generators driven
  * directly). */
class KernelPropSpec extends AnyFunSuite {

  private def check[T](gen: Gen[T], n: Int = 300)(f: T => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(f)

  private def strArr(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString(_): Any).toArray)
  private def longArr(xs: Seq[Long]): ArrayData =
    new GenericArrayData(xs.map(java.lang.Long.valueOf(_): Any).toArray)

  private val genWord = Gen.listOf(Gen.oneOf("a", "b", "c", "的")).map(_.mkString)
  private val genMerges = Gen.listOf(for {
    a <- Gen.oneOf("a", "b", "c", "ab", "aa", "bc")
    b <- Gen.oneOf("a", "b", "c", "ab", "aa", "bc")
  } yield (a, b)).map(_.take(6))

  /** The reference BPE apply loop, naively: per merge rank, one greedy
    * left-to-right pass. */
  private def naiveBpe(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: List[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toList
    for ((a, b) <- merges) {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      for (x <- syms) {
        if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
        else out += x
      }
      syms = out.toList
    }
    syms
  }

  test("bpeApply == naive greedy fold; segments concatenate to the word") {
    check(for (w <- genWord; m <- genMerges) yield (w, m)) { case (w, ms) =>
      val got = SketchKernel.bpeApply(UTF8String.fromString(w),
        strArr(ms.map(_._1)), strArr(ms.map(_._2)))
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(got == naiveBpe(w, ms), s"word=$w merges=$ms")
      assert(got.mkString == w, "segmentation must preserve the word")
    }
  }

  test("hashCounts: totals preserved, buckets match the naive hash") {
    val genToks = Gen.listOf(Gen.oneOf("x", "y", "zz", "", "word", "的"))
    check(genToks) { toks =>
      val got = SketchKernel.hashCounts(strArr(toks), UTF8String.fromString("s:"), 64)
        .toLongArray()
      assert(got.length == 64 && got.sum == toks.length)
      val naive = new Array[Long](64)
      toks.foreach { t =>
        naive((SketchKernel.md5Lower64(("s:" + t).getBytes("UTF-8")) & 63L).toInt) += 1
      }
      assert(got.toSeq == naive.toSeq)
    }
  }

  test("jlProject: matches naive dots and is linear in the input") {
    val genVec = Gen.listOfN(8, Gen.choose(-1000L, 1000L))
    val signs = Seq.tabulate(4 * 8)(k => if (k % 3 == 0) 1L else -1L)
    def naive(v: Seq[Long]): Seq[Long] =
      (0 until 4).map(j => (0 until 8).map(i => signs(j * 8 + i) * v(i)).sum)
    check(for (x <- genVec; y <- genVec) yield (x, y)) { case (x, y) =>
      val px = SketchKernel.jlProject(longArr(x), longArr(signs), 4).toLongArray()
      assert(px.toSeq == naive(x))
      val pxy = SketchKernel.jlProject(
        longArr(x.zip(y).map { case (a, b) => a + b }), longArr(signs), 4).toLongArray()
      assert(pxy.toSeq == px.zip(
        SketchKernel.jlProject(longArr(y), longArr(signs), 4).toLongArray())
        .map { case (a, b) => a + b }.toSeq, "projection must be linear")
    }
  }

  test("mediaInfo: never throws on random bytes or truncated real payloads") {
    import graft.expressions.MediaKernel
    val genJunk = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    check(genJunk) { bytes =>
      MediaKernel.mediaInfo(bytes) // parser must be total on junk
    }
    // every prefix of every valid encode parses without throwing, and
    // only the full payload may claim valid
    val payloads = Seq(
      MediaKernel.pngEncode(640, 480, 8, 2),
      MediaKernel.wavEncode(44100, 2, 16),
      MediaKernel.jpegEncode(320, 200, 3))
    for (p <- payloads; n <- 0 to p.length) {
      val r = MediaKernel.mediaInfo(p.take(n))
      if (n == p.length) assert(r.getBoolean(8), "full payload validates")
    }
    // single-byte corruptions parse without throwing
    val genIdx = for {
      p <- Gen.oneOf(payloads); i <- Gen.choose(0, p.length - 1)
      b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    } yield (p, i, b)
    check(genIdx) { case (p, i, b) =>
      val c = p.clone(); c(i) = b
      MediaKernel.mediaInfo(c)
    }
    // adversarial 4-byte length fields near Int.MaxValue: random/
    // 1-byte corruption can't reach the Int-overflow window where
    // pos + 12 + len wraps negative and passes an Int bounds guard.
    // Each of these must parse as invalid, not throw.
    def be(v: Long) = Array[Byte](((v >>> 24) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def le(v: Long) = be(v).reverse
    for (len <- Seq(0x7ffffff0L, 0x7fffffffL, 0x80000000L, 0xfffffff0L)) {
      // PNG: IHDR claiming a huge chunk length
      val pngHuge = MediaKernel.pngEncode(1, 1, 8, 0)
      System.arraycopy(be(len), 0, pngHuge, 8, 4)
      assert(!MediaKernel.mediaInfo(pngHuge).getBoolean(8))
      // PNG: huge-length NON-IHDR chunk before anything else
      val pad = be(len) ++ "zTXt".getBytes("US-ASCII") ++ new Array[Byte](8)
      val pngPad = MediaKernel.pngEncode(1, 1, 8, 0)
      assert(!MediaKernel.mediaInfo(pngPad.take(8) ++ pad).getBoolean(8))
      // WAV: fmt chunk claiming a huge size
      val wavHuge = MediaKernel.wavEncode(44100, 1, 16)
      System.arraycopy(le(len), 0, wavHuge, 16, 4)
      assert(!MediaKernel.mediaInfo(wavHuge).getBoolean(8))
      // WAV: huge-size unknown chunk before fmt
      val junkChunk = "JUNK".getBytes("US-ASCII") ++ le(len) ++ new Array[Byte](4)
      val wavPad = MediaKernel.wavEncode(44100, 1, 16)
      assert(!MediaKernel.mediaInfo(wavPad.take(12) ++ junkChunk).getBoolean(8))
    }
  }

  test("dsirSum: equals the naive token-order fold") {
    val llr = Seq.tabulate(256)(i => (i - 128) / 17.0)
    val genToks = Gen.listOf(Gen.oneOf("p", "q", "rr", "sss", ""))
    check(genToks) { toks =>
      val got = SketchKernel.dsirSum(strArr(toks), new GenericArrayData(
        llr.map(java.lang.Double.valueOf(_): Any).toArray))
      var naive = 0.0d
      toks.foreach { t =>
        naive += llr((SketchKernel.md5Lower64(("dsir:" + t).getBytes("UTF-8")) & 255L).toInt)
      }
      assert(got == naive, "bit-identical left-to-right fold")
    }
  }
}
