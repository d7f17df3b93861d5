package graft.expressions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.{CodingErrorAction, StandardCharsets}

/** Go-`strings`-parity kernel for the reference's strings library
  * (/root/reference/lib/strings.go). Only the functions whose semantics
  * Spark builtins cannot express exactly live here; the rest are mapped
  * to `org.apache.spark.sql.functions` in [[graft.functions]].
  *
  * Index contract: Go returns BYTE offsets; on the JVM we return Unicode
  * CODE POINT offsets and document the divergence (SURVEY.md §7.4 —
  * "fix the contract per function"). Substring is code-point based with
  * Go's strict bounds semantics (strings.go:857-902).
  */
object StringKernel {
  private def s(u: UTF8String): String = u.toString
  private def u(x: String): UTF8String = UTF8String.fromString(x)
  private def arr(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(u).toArray[Any])

  /** strings.Compare. strings.go:588 */
  def compareStr(a: UTF8String, b: UTF8String): Int = {
    val c = s(a).compareTo(s(b)); if (c < 0) -1 else if (c > 0) 1 else 0
  }

  /** strings.ContainsAny. strings.go:612 */
  def containsAny(str: UTF8String, chars: UTF8String): Boolean = {
    val cs = s(chars).codePoints().toArray.toSet
    s(str).codePoints().toArray.exists(cs.contains)
  }

  /** strings.Count: non-overlapping; empty substr -> rune count + 1.
    * strings.go:624 */
  def countSubstr(str: UTF8String, sub: UTF8String): Long = {
    val S = s(str); val t = s(sub)
    if (t.isEmpty) S.codePointCount(0, S.length).toLong + 1L
    else {
      var n = 0L; var i = S.indexOf(t)
      while (i >= 0) { n += 1; i = S.indexOf(t, i + t.length) }
      n
    }
  }

  /** strings.EqualFold (simple case folding). strings.go:636 */
  def equalFold(a: UTF8String, b: UTF8String): Boolean = s(a).equalsIgnoreCase(s(b))

  /** strings.Fields: split around runs of Unicode whitespace. strings.go:648 */
  def fields(str: UTF8String): ArrayData =
    arr(s(str).split("\\s+").filter(_.nonEmpty).toSeq)

  /** strings.Index, code-point offset (-1 if absent). strings.go:680 */
  def indexOf(str: UTF8String, sub: UTF8String): Long = {
    val i = s(str).indexOf(s(sub))
    if (i < 0) -1L else s(str).codePointCount(0, i).toLong
  }

  /** strings.IndexAny. strings.go:692 */
  def indexAny(str: UTF8String, chars: UTF8String): Long = {
    val cs = s(chars).codePoints().toArray.toSet
    val cps = s(str).codePoints().toArray
    val i = cps.indexWhere(cs.contains)
    i.toLong
  }

  /** strings.LastIndex. strings.go:716 */
  def lastIndexOf(str: UTF8String, sub: UTF8String): Long = {
    val i = s(str).lastIndexOf(s(sub))
    if (i < 0) -1L else s(str).codePointCount(0, i).toLong
  }

  /** strings.LastIndexAny. strings.go:728 */
  def lastIndexAny(str: UTF8String, chars: UTF8String): Long = {
    val cs = s(chars).codePoints().toArray.toSet
    val cps = s(str).codePoints().toArray
    cps.lastIndexWhere(cs.contains).toLong
  }

  /** strings.Replace with count n (n<0 = all). strings.go:752 */
  def replaceN(str: UTF8String, old: UTF8String, nw: UTF8String, n: Long): UTF8String = {
    val S = s(str); val o = s(old); val w = s(nw)
    if (n == 0 || o == w) return u(S)
    val sb = new StringBuilder
    var i = 0; var done = 0L
    if (o.isEmpty) {
      // Go: replaces at each rune boundary, including start
      val cps = S.codePoints().toArray
      var k = 0
      sb.append(w); done = 1
      while (k < cps.length) {
        sb.appendAll(Character.toChars(cps(k)))
        if (n < 0 || done < n) { sb.append(w); done += 1 }
        k += 1
      }
      return u(sb.toString)
    }
    while (i < S.length) {
      val j = S.indexOf(o, i)
      if (j < 0 || (n >= 0 && done >= n)) { sb.append(S.substring(i)); i = S.length }
      else { sb.append(S.substring(i, j)); sb.append(w); i = j + o.length; done += 1 }
    }
    u(sb.toString)
  }

  /** strings.SplitAfter (keep separator). strings.go:806 */
  def splitAfter(str: UTF8String, sep: UTF8String): ArrayData = splitAfterN(str, sep, -1L)

  /** strings.SplitAfterN. strings.go:818 */
  def splitAfterN(str: UTF8String, sep: UTF8String, n: Long): ArrayData = {
    val S = s(str); val sp = s(sep)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    if (sp.isEmpty) return arr(S.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp))))
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i <= S.length) {
      val j = S.indexOf(sp, i)
      if (j < 0 || (n > 0 && parts.length == n - 1)) { parts += S.substring(i); i = S.length + 1 }
      else { parts += S.substring(i, j + sp.length); i = j + sp.length }
    }
    arr(parts.toSeq)
  }

  /** strings.SplitN. strings.go:837 */
  def splitN(str: UTF8String, sep: UTF8String, n: Long): ArrayData = {
    val S = s(str); val sp = s(sep)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    if (sp.isEmpty) return arr(S.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp))))
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i <= S.length) {
      val j = S.indexOf(sp, i)
      if (j < 0 || (n > 0 && parts.length == n - 1)) { parts += S.substring(i); i = S.length + 1 }
      else { parts += S.substring(i, j); i = j + sp.length }
    }
    arr(parts.toSeq)
  }

  /** mito substring: code-point slice with strict bounds (errors instead
    * of saturating); error messages match strings.go:857-902 exactly. */
  def substrRunes(str: UTF8String, start: Long, end: Long): UTF8String = {
    val S = s(str)
    val n = S.codePointCount(0, S.length)
    if (start < 0)
      throw new IllegalArgumentException(s"substring: start out of range: $start < 0")
    if (end < start)
      throw new IllegalArgumentException(s"substring: end out of range: $end < $start")
    if (start > n)
      throw new IllegalArgumentException(s"substring: start out of range: $start > $n")
    if (end > n)
      throw new IllegalArgumentException(s"substring: end out of range: $end > $n")
    val a = S.offsetByCodePoints(0, start.toInt)
    val b = S.offsetByCodePoints(0, end.toInt)
    u(S.substring(a, b))
  }

  /** strings.ToTitle: ALL characters to title case. strings.go:912 */
  def toTitle(str: UTF8String): UTF8String =
    u(s(str).codePoints().toArray
      .flatMap(cp => Character.toChars(Character.toTitleCase(cp))).mkString)

  /** strings.ToValidUTF8 on bytes: each RUN of invalid bytes becomes one
    * replacement (Go semantics; CharsetDecoder.replaceWith can't express
    * multi-char replacements). strings.go:928 */
  def toValidUTF8(bytes: Array[Byte], replacement: UTF8String): UTF8String = {
    val rep = s(replacement)
    val sb = new StringBuilder
    var i = 0
    var inBad = false
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val len =
        if (b < 0x80) 1
        else if ((b & 0xe0) == 0xc0) 2
        else if ((b & 0xf0) == 0xe0) 3
        else if ((b & 0xf8) == 0xf0) 4
        else -1
      val ok = len > 0 && i + len <= bytes.length &&
        (1 until len).forall(k => (bytes(i + k) & 0xc0) == 0x80) && {
          len == 1 || {
            val cp = new String(bytes, i, len, StandardCharsets.UTF_8).codePointAt(0)
            // reject overlong/surrogate encodings (round-trip check)
            new String(Character.toChars(cp)).getBytes(StandardCharsets.UTF_8).length == len
          }
        }
      if (ok) {
        sb.append(new String(bytes, i, len, StandardCharsets.UTF_8))
        inBad = false
        i += len
      } else {
        if (!inBad) { sb.append(rep); inBad = true }
        i += 1
      }
    }
    u(sb.toString)
  }

  /** utf8.Valid on bytes. strings.go:1008 */
  def validUTF8(bytes: Array[Byte]): Boolean = {
    val dec = StandardCharsets.UTF_8.newDecoder()
    try { dec.decode(java.nio.ByteBuffer.wrap(bytes)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
  }

  private def inCutset(cp: Int, cutset: String): Boolean =
    cutset.codePoints().toArray.contains(cp)

  /** strings.Trim(cutset). strings.go:940 */
  def trimCutset(str: UTF8String, cutset: UTF8String): UTF8String =
    trimRightCutset(trimLeftCutset(str, cutset), cutset)

  /** strings.TrimLeft(cutset). strings.go:952 */
  def trimLeftCutset(str: UTF8String, cutset: UTF8String): UTF8String = {
    val S = s(str); val c = s(cutset)
    var i = 0
    while (i < S.length && inCutset(S.codePointAt(i), c)) i = S.offsetByCodePoints(i, 1)
    u(S.substring(i))
  }

  /** strings.TrimRight(cutset). strings.go:976 */
  def trimRightCutset(str: UTF8String, cutset: UTF8String): UTF8String = {
    val S = s(str); val c = s(cutset)
    var i = S.length
    while (i > 0) {
      val prev = S.offsetByCodePoints(i, -1)
      if (inCutset(S.codePointAt(prev), c)) i = prev else return u(S.substring(0, i))
    }
    u(S.substring(0, i))
  }

  /** strings.TrimPrefix. strings.go:964 */
  def trimPrefix(str: UTF8String, prefix: UTF8String): UTF8String = {
    val S = s(str); val p = s(prefix)
    if (S.startsWith(p)) u(S.substring(p.length)) else u(S)
  }

  /** strings.TrimSuffix. strings.go:996 */
  def trimSuffix(str: UTF8String, suffix: UTF8String): UTF8String = {
    val S = s(str); val p = s(suffix)
    if (p.nonEmpty && S.endsWith(p)) u(S.substring(0, S.length - p.length)) else u(S)
  }

  // Regexp patterns come from a small plan-time registry, so the compiled
  // cache stays bounded by the number of named patterns.
  private val patCache = new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private def pat(p: String): java.util.regex.Pattern =
    patCache.computeIfAbsent(p, java.util.regex.Pattern.compile(_))

  /** regexp.FindAllStringSubmatch (re.go): every match with its capture
    * groups, computed POSITIONALLY against the original string — correct
    * for anchors, lookaround, and word boundaries, unlike re-matching the
    * extracted full-match text in isolation. Unmatched groups render as
    * "" (Go's convention for the submatch string form). */
  def findAllSubmatch(str: UTF8String, pattern: UTF8String): ArrayData = {
    val m = pat(s(pattern)).matcher(s(str))
    val b = Vector.newBuilder[Any]
    while (m.find())
      b += arr((0 to m.groupCount()).map(g => Option(m.group(g)).getOrElse("")))
    new GenericArrayData(b.result().toArray[Any])
  }
}
