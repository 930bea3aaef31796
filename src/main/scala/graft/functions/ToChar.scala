package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PG-style `to_char(numeric, fmt)` (reference
  * `src/backend/utils/adt/formatting.c`) — the numeric-template subset:
  * `9` digit-or-space, `0` forced digit, `.` decimal point, `,` grouping,
  * `$` currency, `FM` fill-mode (strip padding), `MI` trailing sign.
  * Non-FM output is right-aligned with a leading sign column, matching
  * PG. Overflowing the integer template yields '#' fill, as PG does.
  */
object ToCharFmt {

  /** Template shape, compiled once per distinct format string and
    * memoized — the FM/MI/$ stripping and digit counting used to run
    * per ROW (see ToNumberFmt for the same move on the parse side). */
  private final case class Spec(fm: Boolean, mi: Boolean, dollar: Boolean,
                                intTpl: String, fracDigits: Int,
                                intDigitsMax: Int, leftZero: Int,
                                hasLiteral: Boolean, overflowFill: String)

  private val specs = new java.util.concurrent.ConcurrentHashMap[String, Spec]()

  private def compile(fmt: String): Spec = {
    var f = fmt
    val fm = f.contains("FM")
    if (fm) f = f.replace("FM", "")
    val mi = f.endsWith("MI")
    if (mi) f = f.substring(0, f.length - 2)
    val dollar = f.contains("$")
    if (dollar) f = f.replace("$", "")
    val dot = f.indexOf('.')
    val intTpl = if (dot >= 0) f.substring(0, dot) else f
    val fracTpl = if (dot >= 0) f.substring(dot + 1) else ""
    // templates with interior LITERAL chars ('999E99' — 'E' is not a
    // NUM keyword, formatting.c copies it through): PG writes the
    // sign column immediately BEFORE the first digit
    // (NUM_numpart_to_char sign_wrote at num_curr >= out_pre_spaces),
    // so blanks stay left of the literal — '    E 10', not ' E10'
    val hasLiteral = !dollar &&
      intTpl.exists(c => c != '9' && c != '0' && c != ',')
    Spec(fm, mi, dollar, intTpl,
      fracTpl.count(c => c == '9' || c == '0'),
      intTpl.count(c => c == '9' || c == '0'),
      intTpl.indexOf('0'), hasLiteral,
      f.map(c => if (c == ',' || c == '.') c else '#'))
  }

  private def spec(fmt: String): Spec =
    if (specs.size > 1024) compile(fmt) // adversarial-template cap
    else specs.computeIfAbsent(fmt, compile(_))

  def toChar(value: Double, fmt: String): UTF8String = {
    val sp = spec(fmt)
    val fm = sp.fm; val mi = sp.mi; val dollar = sp.dollar
    val intTpl = sp.intTpl
    val fracDigits = sp.fracDigits
    val intDigitsMax = sp.intDigitsMax

    val neg = value < 0
    val bd = new java.math.BigDecimal(math.abs(value))
      .setScale(fracDigits, java.math.RoundingMode.HALF_UP)
    // indexOf, not split("\\.") — String.split compiles a regex per call
    // (two-char pattern misses the single-literal fast path); this runs
    // once per row
    val plain = bd.toPlainString
    val dotAt = plain.indexOf('.')
    val intStr0 = if (dotAt < 0) plain else plain.substring(0, dotAt)
    if (intStr0.length > intDigitsMax)
      return UTF8String.fromString(sp.overflowFill)

    // walk the integer template right-to-left; a '0' forces digit fill at
    // its own position and every position to its right
    val leftZero = sp.leftZero
    val sb = new java.lang.StringBuilder
    // a lone zero integer digit is a LEADING zero when a fraction
    // follows: 9-masks blank it (to_char(0.5,'9.9') = " .5"; an
    // explicit 0 mask keeps it — the PG docs' 9.9-vs-0.9 pair)
    val suppressLoneZero = intStr0 == "0" && fracDigits > 0 && leftZero < 0
    var di = if (suppressLoneZero) -1 else intStr0.length - 1
    var i = intTpl.length - 1
    while (i >= 0) {
      val zeroForced = leftZero >= 0 && i >= leftZero
      intTpl.charAt(i) match {
        case '0' =>
          sb.append(if (di >= 0) intStr0.charAt(di) else '0'); di -= 1
        case '9' =>
          if (di >= 0) { sb.append(intStr0.charAt(di)); di -= 1 }
          else if (zeroForced) sb.append('0')
          else if (!fm) sb.append(' ')
        case ',' =>
          if (di >= 0 || zeroForced) sb.append(',')
          else if (!fm) sb.append(' ')
        case c => sb.append(c)
      }
      i -= 1
    }
    var intPart = sb.reverse.toString
    if (intPart.replace(" ", "").isEmpty && fracDigits == 0)
      intPart = intPart.drop(1) + "0"

    val frac = if (fracDigits > 0) "." + plain.substring(dotAt + 1) else ""
    val core = (if (dollar) "$" else "") + intPart.trim + frac
    val hasLiteral = sp.hasLiteral
    val out =
      if (mi) core + (if (neg) "-" else if (fm) "" else " ")
      else if (fm) (if (neg) "-" else "") + core
      else if (hasLiteral) {
        val idx = intPart.indexWhere(_.isDigit)
        val signCh = if (neg) "-" else " "
        (if (idx >= 0)
          intPart.substring(0, idx) + signCh + intPart.substring(idx)
        else signCh + intPart) + frac
      } else {
        val signed = (if (neg) "-" else " ") + core
        val pad = intTpl.length + 1 + (if (dollar) 1 else 0) - (signed.length - frac.length)
        (" " * math.max(0, pad)) + signed
      }
    UTF8String.fromString(out)
  }
}

/** PG `to_char(timestamp, fmt)` DCH templates (formatting.c:35-100) —
  * the date/time subset: YYYY YY MM DD HH24 HH12 HH MI SS MS US, names
  * Mon/Month/Day/Dy in all three case styles (PG blank-pads Month/Day to
  * 9 chars unless FM), DDD D ID IW WW Q J, AM/PM, double-quoted
  * literals, and the FM prefix modifier (applies to the next element,
  * as in PG). English month/day names, as PG's C locale produces.
  */
object ToCharDtFmt {

  private val monAbbr = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val monFull = Array("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November",
    "December")
  private val dayAbbr = Array("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
  private val dayFull = Array("Monday", "Tuesday", "Wednesday", "Thursday",
    "Friday", "Saturday", "Sunday")

  // manual zero-pad: an f-interpolator builds a java.util.Formatter and
  // re-parses its pattern PER CALL — several million instantiations per
  // scan on a template-heavy projection (q108's eight templates × rows)
  private def zeroPad(n: Int, width: Int): String = {
    val s = n.toString
    if (s.length >= width) s
    else {
      val sb = new java.lang.StringBuilder(width)
      var i = s.length
      while (i < width) { sb.append('0'); i += 1 }
      sb.append(s).toString
    }
  }

  private def pad2(n: Int, fm: Boolean): String =
    if (fm) n.toString else zeroPad(n, 2)

  private def blankPad9(s: String, fm: Boolean): String =
    if (fm) s else s.padTo(9, ' ')

  // compiled template ops — the per-row regionMatches keyword cascade
  // used to re-scan the format string for every row; templates are
  // compiled once and memoized (same trick as ToNumberFmt)
  private final val OpYYYY = 0; private final val OpYY = 1
  private final val OpMonth = 2; private final val OpMon = 3
  private final val OpMM = 4; private final val OpDay = 5
  private final val OpDy = 6; private final val OpDDD = 7
  private final val OpDD = 8; private final val OpHH24 = 9
  private final val OpHH12 = 10; private final val OpMI = 11
  private final val OpSSSS = 12; private final val OpSS = 13
  private final val OpMS = 14; private final val OpUS = 15
  private final val OpAMPM = 16; private final val OpIW = 17
  private final val OpID = 18; private final val OpWW = 19
  private final val OpD = 20; private final val OpQ = 21
  private final val OpJ = 22; private final val OpLit = 23

  /** op; fm active for this element; caze 0=UPPER 1=Capitalized 2=lower
    * (names/meridiem); lit payload for OpLit. */
  private final case class Tok(op: Int, fm: Boolean, caze: Int, lit: String)

  private val compiled =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Tok]]()

  private def compile(fmt: String): Array[Tok] = {
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    var fm = false
    var i = 0
    val n = fmt.length
    def at(pat: String): Boolean = fmt.regionMatches(false, i, pat, 0, pat.length)
    def add(op: Int, consumed: Int, caze: Int = 0, lit: String = null): Int = {
      toks += Tok(op, fm, caze, lit); consumed
    }
    while (i < n) {
      val c = fmt.charAt(i)
      if (c == '"') { // quoted literal
        val close = fmt.indexOf('"', i + 1)
        val end = if (close < 0) n else close
        toks += Tok(OpLit, fm, 0, fmt.substring(i + 1, end))
        i = if (close < 0) n else close + 1
      } else if (at("FM")) { fm = true; i += 2 }
      else {
        val consumed: Int =
          if (at("YYYY")) add(OpYYYY, 4)
          else if (at("YY")) add(OpYY, 2)
          else if (at("MONTH")) add(OpMonth, 5, 0)
          else if (at("Month")) add(OpMonth, 5, 1)
          else if (at("month")) add(OpMonth, 5, 2)
          else if (at("MON")) add(OpMon, 3, 0)
          else if (at("Mon")) add(OpMon, 3, 1)
          else if (at("mon")) add(OpMon, 3, 2)
          else if (at("MM")) add(OpMM, 2)
          else if (at("DAY")) add(OpDay, 3, 0)
          else if (at("Day")) add(OpDay, 3, 1)
          else if (at("day")) add(OpDay, 3, 2)
          else if (at("DY")) add(OpDy, 2, 0)
          else if (at("Dy")) add(OpDy, 2, 1)
          else if (at("dy")) add(OpDy, 2, 2)
          else if (at("DDD")) add(OpDDD, 3)
          else if (at("DD")) add(OpDD, 2)
          else if (at("HH24")) add(OpHH24, 4)
          else if (at("HH12")) add(OpHH12, 4)
          else if (at("HH")) add(OpHH12, 2)
          else if (at("MI")) add(OpMI, 2)
          else if (at("SSSS")) add(OpSSSS, 4)
          else if (at("SS")) add(OpSS, 2)
          else if (at("MS")) add(OpMS, 2)
          else if (at("US")) add(OpUS, 2)
          else if (at("AM") || at("PM")) add(OpAMPM, 2, 0)
          else if (at("am") || at("pm")) add(OpAMPM, 2, 2)
          else if (at("IW")) add(OpIW, 2)
          else if (at("ID")) add(OpID, 2)
          else if (at("WW")) add(OpWW, 2)
          else if (at("D")) add(OpD, 1)
          else if (at("Q")) add(OpQ, 1)
          else if (at("J")) add(OpJ, 1)
          else add(OpLit, 1, 0, String.valueOf(c))
        if (c.isLetter) fm = false // FM spent on this element
        i += consumed
      }
    }
    toks.toArray
  }

  private def toks(fmt: String): Array[Tok] =
    if (compiled.size > 1024) compile(fmt) // adversarial-template cap
    else compiled.computeIfAbsent(fmt, compile(_))

  private def cased(s: String, caze: Int): String = caze match {
    case 0 => s.toUpperCase
    case 1 => s
    case _ => s.toLowerCase
  }

  def toCharDt(us: Long, fmt: String): UTF8String = {
    val ts = toks(fmt)
    val d = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val sb = new java.lang.StringBuilder
    var ti = 0
    while (ti < ts.length) {
      val t = ts(ti)
      val fm = t.fm
      t.op match {
        case OpYYYY => sb.append(if (fm) d.getYear.toString else zeroPad(d.getYear, 4))
        case OpYY => sb.append(zeroPad(d.getYear % 100, 2))
        case OpMonth => sb.append(blankPad9(cased(monFull(d.getMonthValue - 1), t.caze), fm))
        case OpMon => sb.append(cased(monAbbr(d.getMonthValue - 1), t.caze))
        case OpMM => sb.append(pad2(d.getMonthValue, fm))
        case OpDay => sb.append(blankPad9(cased(dayFull(d.getDayOfWeek.getValue - 1), t.caze), fm))
        case OpDy => sb.append(cased(dayAbbr(d.getDayOfWeek.getValue - 1), t.caze))
        case OpDDD => sb.append(if (fm) d.getDayOfYear.toString else zeroPad(d.getDayOfYear, 3))
        case OpDD => sb.append(pad2(d.getDayOfMonth, fm))
        case OpHH24 => sb.append(pad2(d.getHour, fm))
        case OpHH12 =>
          val h = { val x = d.getHour % 12; if (x == 0) 12 else x }
          sb.append(pad2(h, fm))
        case OpMI => sb.append(pad2(d.getMinute, fm))
        case OpSSSS => sb.append((d.getHour * 3600 + d.getMinute * 60 + d.getSecond).toString)
        case OpSS => sb.append(pad2(d.getSecond, fm))
        case OpMS => sb.append(zeroPad(d.getNano / 1000000, 3))
        case OpUS => sb.append(zeroPad(d.getNano / 1000, 6))
        case OpAMPM =>
          sb.append(if (t.caze == 0) { if (d.getHour < 12) "AM" else "PM" }
                    else { if (d.getHour < 12) "am" else "pm" })
        case OpIW =>
          sb.append(pad2(d.get(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR), fm))
        case OpID => sb.append(d.getDayOfWeek.getValue.toString)
        case OpWW => sb.append(pad2(1 + (d.getDayOfYear - 1) / 7, fm))
        case OpD => sb.append((d.getDayOfWeek.getValue % 7 + 1).toString)
        case OpQ => sb.append(((d.getMonthValue - 1) / 3 + 1).toString)
        case OpJ => sb.append((d.toLocalDate.toEpochDay + 2440588L).toString)
        case _ => sb.append(t.lit)
      }
      ti += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** PG `to_number(text, fmt)` (reference `src/backend/utils/adt/
  * formatting.c:43` numeric_to_number → NUM_processor in from_char
  * mode) — the parsing inverse of [[ToCharFmt]], over the same template
  * subset (`9 0 . , $ FM MI`). As in PG, digits are consumed
  * sequentially and the template's digit counts CAP how much of the
  * input is read (to_number('12345','999') = 123); grouping commas,
  * currency and padding are skipped; MI reads a trailing sign. */
object ToNumberFmt {

  /** Template digit budget, compiled ONCE per distinct format string and
    * memoized — the template walk (FM/MI/$ stripping, digit counting)
    * used to run per ROW, dominating template-heavy scans. */
  private final case class Spec(mi: Boolean, intMax: Int, fracMax: Int)

  private val specs = new java.util.concurrent.ConcurrentHashMap[String, Spec]()

  private def compile(fmt: String): Spec = {
    var f = fmt
    if (f.contains("FM")) f = f.replace("FM", "")
    val mi = f.endsWith("MI")
    if (mi) f = f.substring(0, f.length - 2)
    f = f.replace("$", "")
    val dot = f.indexOf('.')
    val intTpl = if (dot >= 0) f.substring(0, dot) else f
    val fracTpl = if (dot >= 0) f.substring(dot + 1) else ""
    Spec(mi,
      intTpl.count(c => c == '9' || c == '0'),
      fracTpl.count(c => c == '9' || c == '0'))
  }

  private def spec(fmt: String): Spec =
    if (specs.size > 1024) compile(fmt) // adversarial-template cap
    else specs.computeIfAbsent(fmt, compile(_))

  // 10^k exact as double for k <= 22; with <= 15 collected digits the
  // mantissa is exact as a double too, so one IEEE division yields the
  // correctly-rounded decimal value — bit-identical to the BigDecimal
  // text parse the slow path (and the oracle's CAST) performs
  private val POW10: Array[Double] = Array.tabulate(23)(k => math.pow(10, k))

  def toNumber(value: UTF8String, fmt: String): Double = {
    val sp = spec(fmt)
    // single pass over the value bytes (digits are ASCII): trim, sign,
    // then collect capped int/frac digits skipping '$'/','/padding —
    // replaces the per-row toString + replace + filter + substring chain
    val b = value.getBytes
    var lo = 0; var hi = b.length
    while (lo < hi && (b(lo) & 0xff) <= ' ') lo += 1
    while (hi > lo && (b(hi - 1) & 0xff) <= ' ') hi -= 1
    var neg = false
    if (sp.mi && hi > lo && b(hi - 1) == '-') {
      neg = true; hi -= 1
      while (hi > lo && (b(hi - 1) & 0xff) <= ' ') hi -= 1
    }
    if (lo < hi && b(lo) == '-') { neg = true; lo += 1 }
    else if (lo < hi && b(lo) == '+') lo += 1
    var acc = 0L; var nInt = 0; var nFrac = 0; var inFrac = false
    var overflow = false
    var i = lo
    while (i < hi && !overflow) {
      val c = b(i)
      if (c >= '0' && c <= '9') {
        if (!inFrac && nInt < sp.intMax) {
          if (nInt + nFrac >= 15) overflow = true
          else { acc = acc * 10 + (c - '0'); nInt += 1 }
        } else if (inFrac && nFrac < sp.fracMax) {
          if (nInt + nFrac >= 15) overflow = true
          else { acc = acc * 10 + (c - '0'); nFrac += 1 }
        }
      } else if (c == '.' && !inFrac) inFrac = true
      i += 1
    }
    if (!overflow) {
      val mag = acc.toDouble / POW10(nFrac)
      return if (neg) -mag else mag
    }
    // > 15 digits kept: exact BigDecimal parse of the collected digits
    val ip = new java.lang.StringBuilder
    val fp = new java.lang.StringBuilder
    inFrac = false; i = lo
    while (i < hi) {
      val c = b(i)
      if (c >= '0' && c <= '9') {
        if (!inFrac && ip.length < sp.intMax) ip.append(c.toChar)
        else if (inFrac && fp.length < sp.fracMax) fp.append(c.toChar)
      } else if (c == '.' && !inFrac) inFrac = true
      i += 1
    }
    val mag = new java.math.BigDecimal(
      (if (ip.length == 0) "0" else ip.toString) +
        (if (fp.length > 0) "." + fp.toString else "")).doubleValue()
    if (neg) -mag else mag
  }
}

/** PG `to_date` / `to_timestamp(text, fmt)` (formatting.c:914
  * do_to_timestamp → DCH_from_char) — the parsing inverse of
  * [[ToCharDtFmt]] over its template subset: YYYY YY MM DD HH24
  * HH12/HH MI SS SSSS MS US, Mon/Month names (any case), DDD, AM/PM,
  * J, double-quoted literals and FM (variable-width fields). Numeric
  * fields read greedily up to their template width, skipping leading
  * spaces; non-template separator characters consume one input
  * character loosely, as PG's from_char does. */
object DchParseFmt {

  private val monAbbr = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val monFull = Array("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November",
    "December")
  private val dayAbbr = Array("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
  private val dayFull = Array("Monday", "Tuesday", "Wednesday", "Thursday",
    "Friday", "Saturday", "Sunday")

  // compiled parse ops (templates memoized; the keyword cascade used to
  // re-scan the format string per row — see ToCharDtFmt)
  private final val PYear4 = 0; private final val PYear4Greedy = 1
  private final val PYear2 = 2; private final val PMonName = 3
  private final val PMonAbbr = 4; private final val PMM = 5
  private final val PDayName = 6; private final val PDayAbbr = 7
  private final val PDDD = 8; private final val PDD = 9
  private final val PHH24 = 10; private final val PHH12 = 11
  private final val PMI = 12; private final val PSSSS = 13
  private final val PSS = 14; private final val PMS = 15
  private final val PUS = 16; private final val PMeridiem4 = 17
  private final val PMeridiem2 = 18; private final val PJ = 19
  private final val PSep = 20; private final val PQuoted = 21

  private final case class PTok(op: Int, skip: Int)

  private val compiledP =
    new java.util.concurrent.ConcurrentHashMap[String, Array[PTok]]()

  private def compileP(fmt: String): Array[PTok] = {
    val toks = scala.collection.mutable.ArrayBuffer.empty[PTok]
    var i = 0
    val n = fmt.length
    // DCH keywords parse case-insensitively (formatting.c keys both
    // DCH_DD and DCH_dd to the same action) — 'dd' ≡ 'DD'
    def at(pat: String) = fmt.regionMatches(true, i, pat, 0, pat.length)
    def add(op: Int, consumed: Int, skip: Int = 0): Int = {
      toks += PTok(op, skip); consumed
    }
    while (i < n) {
      val c = fmt.charAt(i)
      if (c == '"') {
        val close = fmt.indexOf('"', i + 1)
        val end = if (close < 0) n else close
        toks += PTok(PQuoted, end - (i + 1)) // consumes its width
        i = if (close < 0) n else close + 1
      } else if (at("FM")) i += 2 // all our numeric reads are width-capped
      else {
        val consumed: Int =
          if (at("YYYY")) {
            // PG reads GREEDILY when the next format node is a
            // separator or end-of-format (from_char_parse_int
            // is_next_separator): 'YYYY-MMDD' on '20000-1130' takes
            // the 5-digit year 20000
            val greedy = i + 4 >= n ||
              !Character.isLetterOrDigit(fmt.charAt(i + 4))
            add(if (greedy) PYear4Greedy else PYear4, 4)
          }
          else if (at("YY")) add(PYear2, 2)
          else if (at("MONTH")) add(PMonName, 5)
          else if (at("MON")) add(PMonAbbr, 3)
          else if (at("MM")) add(PMM, 2)
          else if (at("DAY")) add(PDayName, 3)
          else if (at("DY")) add(PDayAbbr, 2)
          else if (at("DDD")) add(PDDD, 3)
          else if (at("DD")) add(PDD, 2)
          else if (at("HH24")) add(PHH24, 4)
          else if (at("HH12")) add(PHH12, 4)
          else if (at("HH")) add(PHH12, 2)
          else if (at("MI")) add(PMI, 2)
          else if (at("SSSS")) add(PSSSS, 4)
          else if (at("SS")) add(PSS, 2)
          else if (at("MS")) add(PMS, 2)
          else if (at("US")) add(PUS, 2)
          else if (at("A.M.") || at("P.M.")) add(PMeridiem4, 4)
          else if (at("AM") || at("PM")) add(PMeridiem2, 2)
          else if (at("J")) add(PJ, 1)
          else add(PSep, 1)
        i += consumed
      }
    }
    toks.toArray
  }

  private def ptoks(fmt: String): Array[PTok] =
    if (compiledP.size > 1024) compileP(fmt) // adversarial-template cap
    else compiledP.computeIfAbsent(fmt, compileP(_))

  /** Parse to epoch MICROS of the local (session-naive) datetime. */
  def parseMicros(value: UTF8String, fmt: String): Long = {
    val ts = ptoks(fmt)
    val v = value.toString
    // formatting.c do_to_timestamp: an absent year defaults to tm_year
    // 0 — proleptic year 0 is 1 BC, which is why PG prints
    // `0001-01-01 ... BC` for time-only to_timestamp inputs
    var year = 0; var yearSeen = false
    var month = 1; var dayM = 1
    var hour24 = 0; var hour12 = -1; var pm = false; var pmSeen = false
    var minute = 0; var second = 0; var nanos = 0
    var doy = -1; var jul = -1L; var ssss = -1
    var vi = 0
    def skipSpaces(): Unit = while (vi < v.length && v.charAt(vi) == ' ') vi += 1
    def readInt(maxW: Int): Int = {
      skipSpaces()
      // missing trailing components parse as 0 (formatting.c
      // do_to_timestamp: absent fields keep their defaults)
      if (vi >= v.length) return 0
      val st = vi
      while (vi < v.length && vi - st < maxW && v.charAt(vi).isDigit) vi += 1
      require(vi > st, s"to_date/to_timestamp: expected digits at '$v'[$st] for '$fmt'")
      v.substring(st, vi).toInt
    }
    def name(full: Array[String], abbr: Array[String], wantFull: Boolean): Int = {
      skipSpaces()
      val names = if (wantFull) full else abbr
      val k = names.indices.find(j =>
        v.regionMatches(true, vi, names(j), 0, names(j).length))
        .getOrElse(throw new IllegalArgumentException(
          s"to_date/to_timestamp: no ${if (wantFull) "name" else "abbrev"} at '$v'[$vi]"))
      vi += names(k).length
      skipSpaces() // PG skips the blank-pad after names
      k
    }
    var ti = 0
    while (ti < ts.length) {
      val t = ts(ti)
      t.op match {
        case PYear4 => year = readInt(4); yearSeen = true
        case PYear4Greedy => year = readInt(9); yearSeen = true
        case PYear2 => // PG century rule: <70 → 20xx, else 19xx
          val y2 = readInt(2); year = if (y2 < 70) 2000 + y2 else 1900 + y2
          yearSeen = true
        case PMonName => month = 1 + name(monFull, monAbbr, wantFull = true)
        case PMonAbbr => month = 1 + name(monFull, monAbbr, wantFull = false)
        case PMM => month = readInt(2)
        case PDayName => name(dayFull, dayAbbr, wantFull = true); ()
        case PDayAbbr => name(dayFull, dayAbbr, wantFull = false); ()
        case PDDD => doy = readInt(3)
        case PDD => dayM = readInt(2)
        case PHH24 => hour24 = readInt(2)
        case PHH12 => hour12 = readInt(2)
        case PMI => minute = readInt(2)
        case PSSSS => ssss = readInt(5)
        case PSS => second = readInt(2)
        case PMS => nanos += readInt(3) * 1000000
        case PUS => nanos += readInt(6) * 1000
        case PMeridiem4 => // dotted meridiem (DCH_P_M)
          skipSpaces()
          require(vi + 4 <= v.length, s"to_date/to_timestamp: no meridiem at '$v'[$vi]")
          pm = v.regionMatches(true, vi, "P.M.", 0, 4)
          pmSeen = true; vi += 4
        case PMeridiem2 =>
          skipSpaces()
          require(vi + 2 <= v.length, s"to_date/to_timestamp: no meridiem at '$v'[$vi]")
          pm = v.regionMatches(true, vi, "PM", 0, 2)
          pmSeen = true; vi += 2
        case PJ => jul = readInt(7).toLong
        case PQuoted => vi += t.skip // quoted literal consumes its width
        case _ => // separator: consume one loosely-matching input char
          if (vi < v.length && !v.charAt(vi).isDigit) vi += 1
      }
      ti += 1
    }
    // formatting.c do_to_timestamp: HH/HH12 stores the hour AS READ
    // (out-of-range 15 stays 15); the meridiem then adds 12 for PM
    // hours < 12 and zeroes an AM 12 — no blanket % 12
    if (hour12 >= 0) hour24 = hour12
    if (pmSeen) {
      if (pm && hour24 < 12) hour24 += 12
      else if (!pm && hour24 == 12) hour24 = 0
    }
    if (ssss >= 0) { hour24 = ssss / 3600; minute = ssss / 60 % 60; second = ssss % 60 }
    val date =
      if (jul >= 0) java.time.LocalDate.ofEpochDay(jul - 2440588L)
      else if (doy >= 0)
        java.time.LocalDate.ofYearDay(if (yearSeen) year else 1, doy)
      else java.time.LocalDate.of(year, month, dayM)
    val dt = java.time.LocalDateTime.of(date,
      java.time.LocalTime.of(hour24, minute, second, nanos))
    dt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + dt.getNano / 1000L
  }

  /** Parse to epoch DAYS (PG to_date discards the time fields). */
  def parseDays(value: UTF8String, fmt: String): Int =
    Math.floorDiv(parseMicros(value, fmt), 86400000000L).toInt
}

/** `to_number_pg(text, '9,999.99')` expression — DoubleType result. */
case class ToNumberPg(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "to_number_pg"

  override protected def nullSafeEval(v: Any, f: Any): Any =
    ToNumberFmt.toNumber(v.asInstanceOf[UTF8String],
      f.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, f) =>
      s"graft.functions.ToNumberFmt.toNumber($v, $f.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ToNumberPg =
    copy(left = newLeft, right = newRight)
}

/** `to_date_pg(text, 'DD Mon YYYY')` expression — DateType result. */
case class ToDatePg(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DateType
  override def prettyName: String = "to_date_pg"

  override protected def nullSafeEval(v: Any, f: Any): Any =
    DchParseFmt.parseDays(v.asInstanceOf[UTF8String],
      f.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, f) =>
      s"graft.functions.DchParseFmt.parseDays($v, $f.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ToDatePg =
    copy(left = newLeft, right = newRight)
}

/** `to_timestamp_pg(text, 'YYYY-MM-DD HH24:MI:SS')` — TimestampNTZ. */
case class ToTimestampPg(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = TimestampNTZType
  override def prettyName: String = "to_timestamp_pg"

  override protected def nullSafeEval(v: Any, f: Any): Any =
    DchParseFmt.parseMicros(v.asInstanceOf[UTF8String],
      f.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, f) =>
      s"graft.functions.DchParseFmt.parseMicros($v, $f.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ToTimestampPg =
    copy(left = newLeft, right = newRight)
}

/** `to_char_dt(ts, 'YYYY-MM-DD HH24:MI:SS')` expression. */
case class ToCharDt(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "to_char_dt"

  override protected def nullSafeEval(v: Any, f: Any): Any =
    ToCharDtFmt.toCharDt(v.asInstanceOf[Long], f.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, f) =>
      s"graft.functions.ToCharDtFmt.toCharDt($v, $f.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ToCharDt =
    copy(left = newLeft, right = newRight)
}

/** `to_char(numeric, 'FM9,999.00')` expression. */
case class ToChar(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "to_char"

  override protected def nullSafeEval(v: Any, f: Any): Any =
    ToCharFmt.toChar(v.asInstanceOf[Double], f.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, f) =>
      s"graft.functions.ToCharFmt.toChar($v, $f.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ToChar =
    copy(left = newLeft, right = newRight)
}
