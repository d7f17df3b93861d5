package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rate-limit header interpretation (pure functions) matching the
  * reference's limit library (/root/reference/lib/limit.go): Okta
  * (:214-258), draft (:295-382 incl. quota policies :384-413), and the
  * generalized 6-arg form (:451-512).
  *
  * Determinism: the reference computes `time.Until(reset)` against wall
  * clock; here `nowMicros` is an explicit argument (callers pass the
  * per-batch `now`), so results are replayable — required for Spark
  * retries and for use inside the HTTP source's admission control.
  *
  * Output struct: (rate, next, burst, reset, headers, error); fields are
  * null when the reference omits them from the result map.
  */
object LimitKernel {

  val resultType: StructType = StructType(Seq(
    StructField("rate", DoubleType),
    StructField("next", DoubleType),
    StructField("burst", LongType),
    StructField("reset", TimestampType),
    StructField("headers", StringType),
    StructField("error", StringType)))

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  /** Go %q rendering of a header value (strconv.Quote): inner quotes
    * and backslashes escape, so a policy like `policy="leaky bucket"`
    * echoes as policy=\"leaky bucket\". */
  private def goQ(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\t' => sb.append("\\t")
      case '\r' => sb.append("\\r")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private def quoted(kvs: (String, String)*): String =
    kvs.map { case (k, v) => s"$k=${goQ(v)}" }.mkString(" ")

  private def row(rate: Any, next: Any, burst: Any, resetMicros: Any,
      headers: String, error: String): InternalRow =
    InternalRow(rate, next, burst, resetMicros, u(headers),
      if (error == null) null else u(error))

  /** Go time.Time.Sub saturates at +-2^63 ns (a year-9999 reset header
    * yields rate = rem / 9.223372036854776e9, not rem / 2.5e11) and
    * Duration.Seconds() divides the NANOsecond count as float64 —
    * mirror both so the reference's limit goldens replay bit-exactly. */
  private def goUntilSeconds(deltaMicros: Long): Double =
    if (deltaMicros >= Long.MaxValue / 1000L) Long.MaxValue.toDouble / 1e9
    else if (deltaMicros <= Long.MinValue / 1000L) Long.MinValue.toDouble / 1e9
    else (deltaMicros * 1000L).toDouble / 1e9

  // Go strconv error renderings (err.Error() lands in the result map)
  private def parseFloatErr(s: String) =
    s"""strconv.ParseFloat: parsing "$s": invalid syntax"""
  private def parseIntErr(s: String) =
    s"""strconv.ParseInt: parsing "$s": invalid syntax"""
  private def atoiErr(s: String) =
    s"""strconv.Atoi: parsing "$s": invalid syntax"""

  /** rate_limit(h, 'okta', window) — limit.go:214-258. */
  def okta(headers: MapData, windowMicros: Long, nowMicros: Long): InternalRow = {
    val limit = HttpKernel.headerGet(headers, "X-Rate-Limit-Limit")
    val remaining = HttpKernel.headerGet(headers, "X-Rate-Limit-Remaining")
    val reset = HttpKernel.headerGet(headers, "X-Rate-Limit-Reset")
    val hdr = quoted("X-Rate-Limit-Limit" -> limit,
      "X-Rate-Limit-Remaining" -> remaining, "X-Rate-Limit-Reset" -> reset)
    if (limit.isEmpty || remaining.isEmpty || reset.isEmpty)
      return row(null, null, null, null, hdr, null)
    val lim = try limit.toDouble catch { case _: NumberFormatException =>
      return row(null, null, null, null, hdr, parseFloatErr(limit)) }
    val rem = try remaining.toDouble catch { case _: NumberFormatException =>
      return row(null, null, null, null, hdr, parseFloatErr(remaining)) }
    val rst = try reset.toLong catch { case _: NumberFormatException =>
      return row(null, null, null, null, hdr, parseIntErr(reset)) }
    val resetMicros = rst * 1000000L
    val per = goUntilSeconds(resetMicros - nowMicros)
    row(rem / per, lim / (windowMicros / 1e6), 1L, resetMicros, hdr, null)
  }

  /** rate_limit(h, 'draft', window) — limit.go:295-382 with quota-policy
    * parsing (:384-413). */
  def draft(headers: MapData, windowMicros: Long, nowMicros: Long): InternalRow = {
    val limit = HttpKernel.headerGet(headers, "Rate-Limit-Limit")
    val remaining = HttpKernel.headerGet(headers, "Rate-Limit-Remaining")
    val reset = HttpKernel.headerGet(headers, "Rate-Limit-Reset")
    val hdr = quoted("Rate-Limit-Limit" -> limit,
      "Rate-Limit-Remaining" -> remaining, "Rate-Limit-Reset" -> reset)
    if (limit.isEmpty || remaining.isEmpty || reset.isEmpty)
      return row(null, null, null, null, hdr, null)

    val rem = try remaining.toDouble catch {
      case _: NumberFormatException =>
        return row(null, null, null, null, hdr, parseFloatErr(remaining))
    }
    // reset: delta seconds, or HTTP-date/RFC1123 timestamp. Go computes
    // the reset time as now + time.Duration(d)*time.Second — d is
    // TRUNCATED to whole seconds — and saturates time.Until.
    val (per, resetMicros) =
      try { val d = reset.toDouble; (d, nowMicros + d.toLong * 1000000L) }
      catch {
        case _: NumberFormatException =>
          try {
            val t = TimeKernel.parseTime(u(reset), u(TimeKernel.namedLayouts("HTTP")))
            (goUntilSeconds(t - nowMicros), t)
          } catch {
            case _: Exception =>
              try {
                val t = TimeKernel.parseTime(u(reset), u(TimeKernel.namedLayouts("RFC1123")))
                (goUntilSeconds(t - nowMicros), t)
              } catch {
                case _: Exception =>
                  return row(null, null, null, null, hdr,
                    s"""could not parse "$reset" as number or timestamp""")
              }
          }
      }

    var burst = 1L
    val limFields = limit.split(",")
    // Go Atoi(limFields[0]) is untrimmed: " 100" is invalid syntax
    val quota = try limFields.head.toInt catch {
      case _: NumberFormatException =>
        return row(null, null, null, null, hdr, atoiErr(limFields.head))
    }
    var win = windowMicros / 1e6
    // quota policies: "100, 100;window=60;burst=10, 5000;window=3600"
    var i = 1
    var break = false
    while (i < limFields.length && !break) {
      val p = limFields(i).trim
      val semi = p.indexOf(';')
      if (semi < 0) return row(null, null, null, null, hdr, s"""invalid policy: "$p"""")
      val qs = p.substring(0, semi)
      val q = try qs.toInt catch {
        case _: NumberFormatException =>
          return row(null, null, null, null, hdr, atoiErr(qs))
      }
      if (q > quota) break = true
      else {
        // details(): window applied only when >= 0, burst when > 0
        var w = -1L; var b = -1L
        p.split(";").map(_.trim).foreach { f =>
          if (f.startsWith("window=")) {
            val ws = f.stripPrefix("window=")
            w = try ws.toInt.toLong catch { case _: NumberFormatException =>
              return row(null, null, null, null, hdr, atoiErr(ws)) }
          } else if (f.startsWith("burst=")) {
            val bs = f.stripPrefix("burst=")
            b = try bs.toInt.toLong catch { case _: NumberFormatException =>
              return row(null, null, null, null, hdr, atoiErr(bs)) }
          }
        }
        if (w >= 0) win = w.toDouble
        if (b > 0) burst = b
      }
      i += 1
    }
    row(rem / per, quota.toDouble / win, burst, resetMicros, hdr, null)
  }

  /** Generalized rate_limit(h, prefix, canonical, delta, window, burst)
    * — limit.go:451-512. (canonical affects only Go header-map key
    * casing; our lookup is case-insensitive either way.) */
  def general(headers: MapData, prefix: UTF8String, delta: Boolean,
      windowMicros: Long, burstIn: Long, nowMicros: Long): InternalRow = {
    val pre = prefix.toString
    val limitKey = pre + "-Limit"
    val remainingKey = pre + "-Remaining"
    val resetKey = pre + "-Reset"
    val limit = HttpKernel.headerGet(headers, limitKey)
    val remaining = HttpKernel.headerGet(headers, remainingKey)
    val reset = HttpKernel.headerGet(headers, resetKey)
    val hdr = quoted(limitKey -> limit, remainingKey -> remaining, resetKey -> reset)
    if (limit.isEmpty || remaining.isEmpty || reset.isEmpty)
      return row(null, null, null, null, hdr, null)
    val lim = try limit.toDouble catch { case _: NumberFormatException =>
      return row(null, null, null, null, hdr, parseFloatErr(limit)) }
    val rem = try remaining.toDouble catch { case _: NumberFormatException =>
      return row(null, null, null, null, hdr, parseFloatErr(remaining)) }

    val (per0, resetMicros) =
      try {
        val d = reset.toLong
        if (delta) (d.toDouble, nowMicros + d * 1000000L)
        else (goUntilSeconds(d * 1000000L - nowMicros), d * 1000000L)
      } catch {
        case _: NumberFormatException =>
          try {
            val t = TimeKernel.parseTime(u(reset), u(TimeKernel.namedLayouts("HTTP")))
            (goUntilSeconds(t - nowMicros), t)
          } catch {
            case _: Exception =>
              try {
                val t = TimeKernel.parseTime(u(reset), u(TimeKernel.namedLayouts("RFC1123")))
                (goUntilSeconds(t - nowMicros), t)
              } catch {
                case _: Exception =>
                  return row(null, null, null, null, hdr,
                    s"""could not parse "$reset" as number or timestamp""")
              }
          }
      }
    val winSecs = windowMicros / 1e6
    val per = per0 * winSecs
    val burst = if (burstIn < 1) 1L else burstIn
    row(rem / per, lim / winSecs, burst, resetMicros, hdr, null)
  }
}
