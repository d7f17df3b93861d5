package graft.expressions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

import java.time._
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.{ChronoField, TemporalAccessor}
import java.util.Locale
import java.util.concurrent.ConcurrentHashMap

/** Go-reference-layout time kernel for the reference's time library
  * (/root/reference/lib/time.go:201-248). Translates Go layouts
  * ("2006-01-02 15:04:05") into `DateTimeFormatter`s, cached per layout.
  *
  * Timestamps cross this boundary as epoch MICROS (Spark TimestampType's
  * physical representation), so `StaticInvoke` calls stay primitive.
  */
object TimeKernel {

  /** Named layouts exported by the reference as the `time_layout` global
    * (lib/time.go:151-172) — values are the Go stdlib layout strings. */
  val namedLayouts: Map[String, String] = Map(
    "Layout"      -> "01/02 03:04:05PM '06 -0700",
    "ANSIC"       -> "Mon Jan _2 15:04:05 2006",
    "UnixDate"    -> "Mon Jan _2 15:04:05 MST 2006",
    "RubyDate"    -> "Mon Jan 02 15:04:05 -0700 2006",
    "RFC822"      -> "02 Jan 06 15:04 MST",
    "RFC822Z"     -> "02 Jan 06 15:04 -0700",
    "RFC850"      -> "Monday, 02-Jan-06 15:04:05 MST",
    "RFC1123"     -> "Mon, 02 Jan 2006 15:04:05 MST",
    "RFC1123Z"    -> "Mon, 02 Jan 2006 15:04:05 -0700",
    "RFC3339"     -> "2006-01-02T15:04:05Z07:00",
    "RFC3339Nano" -> "2006-01-02T15:04:05.999999999Z07:00",
    "Kitchen"     -> "3:04PM",
    "Stamp"       -> "Jan _2 15:04:05",
    "StampMilli"  -> "Jan _2 15:04:05.000",
    "StampMicro"  -> "Jan _2 15:04:05.000000",
    "StampNano"   -> "Jan _2 15:04:05.000000000",
    "HTTP"        -> "Mon, 02 Jan 2006 15:04:05 GMT")

  // Go layout token -> action on the formatter builder. Ordered:
  // longest-first so e.g. "2006" wins over "06"/"2", "January" over "Jan".
  private sealed trait Tok
  private case class Pat(p: String) extends Tok
  private case class Frac(digits: Int, fixed: Boolean) extends Tok

  private val tokens: Seq[(String, Tok)] = Seq(
    ".999999999" -> Frac(9, fixed = false),
    ".000000000" -> Frac(9, fixed = true),
    ".999999"    -> Frac(6, fixed = false),
    ".000000"    -> Frac(6, fixed = true),
    "January"    -> Pat("MMMM"),
    "Monday"     -> Pat("EEEE"),
    "Z07:00"     -> Pat("XXX"),
    "-07:00"     -> Pat("xxx"),
    ".999"       -> Frac(3, fixed = false),
    ".000"       -> Frac(3, fixed = true),
    "Z0700"      -> Pat("XX"),
    "-0700"      -> Pat("xx"),
    "2006"       -> Pat("uuuu"),
    "15"         -> Pat("HH"),
    "Jan"        -> Pat("MMM"),
    "Mon"        -> Pat("EEE"),
    "MST"        -> Pat("zzz"),
    "Z07"        -> Pat("X"),
    "-07"        -> Pat("x"),
    "01"         -> Pat("MM"),
    "02"         -> Pat("dd"),
    "03"         -> Pat("hh"),
    "04"         -> Pat("mm"),
    "05"         -> Pat("ss"),
    "06"         -> Pat("yy"),
    "_2"         -> Pat("ppd"),
    "PM"         -> Pat("a"),
    "pm"         -> Pat("a"),
    "1"          -> Pat("M"),
    "2"          -> Pat("d"),
    "3"          -> Pat("h"),
    "4"          -> Pat("m"),
    "5"          -> Pat("s"))

  private val cache = new ConcurrentHashMap[String, DateTimeFormatter]()

  def formatter(goLayout: String): DateTimeFormatter =
    cache.computeIfAbsent(resolveLayout(goLayout), build)

  private def build(layout: String): DateTimeFormatter = {
    val b = new DateTimeFormatterBuilder().parseCaseInsensitive()
    val pat = new StringBuilder
    def flushPat(): Unit = { if (pat.nonEmpty) { b.appendPattern(pat.toString); pat.clear() } }
    var i = 0
    // literal letters must share ONE quote run: 'G''M''T' would render
    // G'M'T (doubled quotes are literal apostrophes in java.time)
    var inLiteralRun = false
    while (i < layout.length) {
      tokens.find { case (t, _) => layout.startsWith(t, i) } match {
        case Some((t, Pat(p))) => inLiteralRun = false; pat.append(p); i += t.length
        case Some((t, Frac(d, fixed))) =>
          inLiteralRun = false
          flushPat()
          b.appendLiteral('.')
          b.appendFraction(ChronoField.NANO_OF_SECOND, if (fixed) d else 0, d, false)
          i += t.length
        case None =>
          val c = layout.charAt(i)
          if (c.isLetter) {
            if (inLiteralRun && pat.nonEmpty && pat.last == '\'') {
              pat.setLength(pat.length - 1); pat.append(c).append('\'')
            } else pat.append('\'').append(c).append('\'')
            inLiteralRun = true
          } else if (c == '\'') { inLiteralRun = false; pat.append("''") }
          else { inLiteralRun = false; pat.append(c) }
          i += 1
      }
    }
    flushPat()
    // no parseDefaulting here: defaults for absent fields are applied in
    // toMicros (a HOUR_OF_DAY default would conflict with am/pm layouts
    // like Kitchen during resolution)
    b.toFormatter(Locale.US)
  }

  private def toMicros(t: TemporalAccessor): Long = {
    val zone: ZoneId =
      if (t.isSupported(ChronoField.OFFSET_SECONDS) && t.query(TemporalQueries.offset) != null)
        t.query(TemporalQueries.offset)
      else Option(t.query(TemporalQueries.zone)).getOrElse(ZoneOffset.UTC)
    def f(field: ChronoField, default: Int): Int =
      if (t.isSupported(field)) t.get(field) else default
    // Go time.Parse defaults absent date fields to Jan 1 of year 0
    // (testdata/parse_time.txt golden: "0000-01-01T11:17:00Z")
    val year =
      if (t.isSupported(ChronoField.YEAR)) t.get(ChronoField.YEAR)
      else if (t.isSupported(ChronoField.YEAR_OF_ERA)) t.get(ChronoField.YEAR_OF_ERA)
      else 0
    val ldt = LocalDateTime.of(
      year, f(ChronoField.MONTH_OF_YEAR, 1), f(ChronoField.DAY_OF_MONTH, 1),
      f(ChronoField.HOUR_OF_DAY, 0), f(ChronoField.MINUTE_OF_HOUR, 0),
      f(ChronoField.SECOND_OF_MINUTE, 0), f(ChronoField.NANO_OF_SECOND, 0))
    val inst = ldt.atZone(zone).toInstant
    Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L), inst.getNano / 1000L)
  }

  private object TemporalQueries {
    val offset = java.time.temporal.TemporalQueries.offset()
    val zone   = java.time.temporal.TemporalQueries.zoneId()
  }

  /** ts.format(layout) — lib/time.go:201-211. Input epoch micros (UTC). */
  def formatTime(micros: Long, layout: UTF8String): UTF8String = {
    val inst = Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      Math.floorMod(micros, 1000000L) * 1000L)
    UTF8String.fromString(formatter(layout.toString).format(inst.atZone(ZoneOffset.UTC)))
  }

  /** s.parse_time(layout) — lib/time.go:213-227. Returns epoch micros. */
  def parseTime(s: UTF8String, layout: UTF8String): Long = {
    val resolved = resolveLayout(layout.toString)
    // Go's RFC3339 parse accepts optional fractional seconds regardless
    // of whether the layout spells them; use the ISO parser for those.
    if (resolved == namedLayouts("RFC3339") || resolved == namedLayouts("RFC3339Nano")) {
      val odt = java.time.OffsetDateTime.parse(s.toString,
        DateTimeFormatter.ISO_OFFSET_DATE_TIME)
      val inst = odt.toInstant
      Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L), inst.getNano / 1000L)
    } else toMicros(formatter(resolved).parse(s.toString))
  }

  /** s.parse_time(list<layout>) first-success — lib/time.go:229-248. */
  def parseTimeMulti(s: UTF8String, layouts: ArrayData): Long = {
    val n = layouts.numElements()
    var i = 0
    while (i < n) {
      try return parseTime(s, layouts.getUTF8String(i))
      catch { case _: Exception => }
      i += 1
    }
    throw new IllegalArgumentException(
      s"failed to parse $s with any provided layout")
  }

  /** Resolve a named layout ("RFC3339") or pass a raw Go layout through. */
  def resolveLayout(l: String): String = namedLayouts.getOrElse(l, l)

  // -------------------------------------------------------------------
  // Go duration strings (CEL `duration("1h2m3.5s")`) <-> micros.
  // CEL's duration type maps to DayTimeIntervalType (SURVEY §1.2);
  // micros is its physical representation.
  // -------------------------------------------------------------------
  private val unitMicros: Seq[(String, Double)] = Seq(
    "ns" -> 0.001, "us" -> 1.0, "µs" -> 1.0, "μs" -> 1.0,
    "ms" -> 1000.0, "s" -> 1e6, "m" -> 6e7, "h" -> 3.6e9)

  /** Parse a Go duration ("300ms", "-1.5h", "2h45m") to micros. */
  def parseDuration(s: UTF8String): Long = {
    var str = s.toString
    if (str.isEmpty) throw new IllegalArgumentException("invalid duration: empty")
    var sign = 1L
    if (str.startsWith("-")) { sign = -1; str = str.substring(1) }
    else if (str.startsWith("+")) str = str.substring(1)
    if (str == "0") return 0L
    var total = 0d
    var i = 0
    while (i < str.length) {
      val numStart = i
      while (i < str.length && (str.charAt(i).isDigit || str.charAt(i) == '.')) i += 1
      if (i == numStart) throw new IllegalArgumentException(s"invalid duration: $s")
      val num = str.substring(numStart, i).toDouble
      val unitStart = i
      while (i < str.length && !str.charAt(i).isDigit) i += 1
      val unit = str.substring(unitStart, i)
      val mult = unitMicros.collectFirst { case (u2, m) if u2 == unit => m }
        .getOrElse(throw new IllegalArgumentException(s"unknown unit $unit in duration $s"))
      total += num * mult
    }
    sign * total.round
  }

  /** Render micros as a Go duration string (time.Duration.String rules:
    * "1h2m3.5s", sub-second uses ms/us/ns units, zero is "0s"). */
  def formatDuration(micros: Long): UTF8String = {
    var v = micros
    val sb = new StringBuilder
    if (v < 0) { sb.append('-'); v = -v }
    if (v == 0) return UTF8String.fromString("0s")
    if (v < 1000L) { sb.append(v).append("µs") }         // Go prints e.g. 500µs
    else if (v < 1000000L) {
      val ms = v / 1000.0
      sb.append(trimNum(ms)).append("ms")
    } else {
      val h = v / 3600000000L
      val m = (v % 3600000000L) / 60000000L
      val s2 = (v % 60000000L) / 1e6
      // Go Duration.String(): above the seconds unit, every lower unit
      // is always printed — 9m -> "9m0s", 1h -> "1h0m0s"
      if (h > 0) sb.append(h).append('h')
      if (m > 0 || h > 0) sb.append(m).append('m')
      sb.append(trimNum(s2)).append('s')
    }
    UTF8String.fromString(sb.toString)
  }

  private def trimNum(d: Double): String =
    if (d == d.floor) d.toLong.toString
    else BigDecimal(d).underlying().stripTrailingZeros().toPlainString
}
