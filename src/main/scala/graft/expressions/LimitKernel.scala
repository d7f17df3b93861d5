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
  private def quoted(kvs: (String, String)*): String =
    kvs.map { case (k, v) => s"""$k="$v"""" }.mkString(" ")

  private def row(rate: Any, next: Any, burst: Any, resetMicros: Any,
      headers: String, error: String): InternalRow =
    InternalRow(rate, next, burst, resetMicros, u(headers),
      if (error == null) null else u(error))

  /** rate_limit(h, 'okta', window) — limit.go:214-258. */
  def okta(headers: MapData, windowMicros: Long, nowMicros: Long): InternalRow = {
    val limit = HttpKernel.headerGet(headers, "X-Rate-Limit-Limit")
    val remaining = HttpKernel.headerGet(headers, "X-Rate-Limit-Remaining")
    val reset = HttpKernel.headerGet(headers, "X-Rate-Limit-Reset")
    val hdr = quoted("X-Rate-Limit-Limit" -> limit,
      "X-Rate-Limit-Remaining" -> remaining, "X-Rate-Limit-Reset" -> reset)
    if (limit.isEmpty || remaining.isEmpty || reset.isEmpty)
      return row(null, null, null, null, hdr, null)
    try {
      val lim = limit.toDouble
      val rem = remaining.toDouble
      val rst = reset.toLong
      val resetMicros = rst * 1000000L
      val per = (resetMicros - nowMicros) / 1e6
      row(rem / per, lim / (windowMicros / 1e6), 1L, resetMicros, hdr, null)
    } catch {
      case e: NumberFormatException => row(null, null, null, null, hdr, e.getMessage)
    }
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
      case e: NumberFormatException => return row(null, null, null, null, hdr, e.getMessage)
    }
    // reset: delta seconds, or HTTP-date/RFC1123 timestamp
    val (per, resetMicros) =
      try { val d = reset.toDouble; (d, nowMicros + (d * 1e6).toLong) }
      catch {
        case _: NumberFormatException =>
          try {
            val t = TimeKernel.parseTime(u(reset), u(TimeKernel.namedLayouts("HTTP")))
            ((t - nowMicros) / 1e6, t)
          } catch {
            case _: Exception =>
              try {
                val t = TimeKernel.parseTime(u(reset), u(TimeKernel.namedLayouts("RFC1123")))
                ((t - nowMicros) / 1e6, t)
              } catch {
                case _: Exception =>
                  return row(null, null, null, null, hdr,
                    s"""could not parse "$reset" as number or timestamp""")
              }
          }
      }

    var burst = 1L
    val limFields = limit.split(",")
    val quota = try limFields.head.trim.toInt catch {
      case e: NumberFormatException => return row(null, null, null, null, hdr, e.getMessage)
    }
    var win = windowMicros / 1e6
    // quota policies: "100, 100;window=60;burst=10, 5000;window=3600"
    var i = 1
    var break = false
    while (i < limFields.length && !break) {
      val p = limFields(i).trim
      val semi = p.indexOf(';')
      if (semi < 0) return row(null, null, null, null, hdr, s"""invalid policy: "$p"""")
      val q = try p.substring(0, semi).toInt catch {
        case e: NumberFormatException => return row(null, null, null, null, hdr, e.getMessage)
      }
      if (q > quota) break = true
      else {
        p.split(";").map(_.trim).foreach { f =>
          try {
            if (f.startsWith("window=")) win = f.stripPrefix("window=").toInt.toDouble
            else if (f.startsWith("burst=")) burst = f.stripPrefix("burst=").toLong
          } catch {
            case e: NumberFormatException => return row(null, null, null, null, hdr, e.getMessage)
          }
        }
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
    val (lim, rem) =
      try (limit.toDouble, remaining.toDouble)
      catch { case e: NumberFormatException => return row(null, null, null, null, hdr, e.getMessage) }

    val (per0, resetMicros) =
      try {
        val d = reset.toLong
        if (delta) (d.toDouble, nowMicros + d * 1000000L)
        else (((d * 1000000L) - nowMicros) / 1e6, d * 1000000L)
      } catch {
        case _: NumberFormatException =>
          try {
            val t = TimeKernel.parseTime(u(reset), u(TimeKernel.namedLayouts("HTTP")))
            ((t - nowMicros) / 1e6, t)
          } catch {
            case _: Exception =>
              try {
                val t = TimeKernel.parseTime(u(reset), u(TimeKernel.namedLayouts("RFC1123")))
                ((t - nowMicros) / 1e6, t)
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
