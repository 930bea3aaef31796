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

  def toChar(value: Double, fmt: String): UTF8String = {
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
    val fracDigits = fracTpl.count(c => c == '9' || c == '0')
    val intDigitsMax = intTpl.count(c => c == '9' || c == '0')

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
      return UTF8String.fromString(f.map(c => if (c == ',' || c == '.') c else '#'))

    // walk the integer template right-to-left; a '0' forces digit fill at
    // its own position and every position to its right
    val leftZero = intTpl.indexOf('0')
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
    // templates with interior LITERAL chars ('999E99' — 'E' is not a
    // NUM keyword, formatting.c copies it through): PG writes the
    // sign column immediately BEFORE the first digit
    // (NUM_numpart_to_char sign_wrote at num_curr >= out_pre_spaces),
    // so blanks stay left of the literal — '    E 10', not ' E10'
    val hasLiteral = !dollar &&
      intTpl.exists(c => c != '9' && c != '0' && c != ',')
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

  def toCharDt(us: Long, fmt: String): UTF8String = {
    val d = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val sb = new java.lang.StringBuilder
    var fm = false
    var i = 0
    val n = fmt.length
    def at(pat: String): Boolean = fmt.regionMatches(false, i, pat, 0, pat.length)
    while (i < n) {
      val c = fmt.charAt(i)
      if (c == '"') { // quoted literal
        val close = fmt.indexOf('"', i + 1)
        val end = if (close < 0) n else close
        sb.append(fmt, i + 1, end)
        i = if (close < 0) n else close + 1
      } else if (at("FM")) { fm = true; i += 2 }
      else {
        val consumed: Int =
          if (at("YYYY")) { sb.append(if (fm) d.getYear.toString else zeroPad(d.getYear, 4)); 4 }
          else if (at("YY")) { sb.append(zeroPad(d.getYear % 100, 2)); 2 }
          else if (at("MONTH")) { sb.append(blankPad9(monFull(d.getMonthValue - 1).toUpperCase, fm)); 5 }
          else if (at("Month")) { sb.append(blankPad9(monFull(d.getMonthValue - 1), fm)); 5 }
          else if (at("month")) { sb.append(blankPad9(monFull(d.getMonthValue - 1).toLowerCase, fm)); 5 }
          else if (at("MON")) { sb.append(monAbbr(d.getMonthValue - 1).toUpperCase); 3 }
          else if (at("Mon")) { sb.append(monAbbr(d.getMonthValue - 1)); 3 }
          else if (at("mon")) { sb.append(monAbbr(d.getMonthValue - 1).toLowerCase); 3 }
          else if (at("MM")) { sb.append(pad2(d.getMonthValue, fm)); 2 }
          else if (at("DAY")) { sb.append(blankPad9(dayFull(d.getDayOfWeek.getValue - 1).toUpperCase, fm)); 3 }
          else if (at("Day")) { sb.append(blankPad9(dayFull(d.getDayOfWeek.getValue - 1), fm)); 3 }
          else if (at("day")) { sb.append(blankPad9(dayFull(d.getDayOfWeek.getValue - 1).toLowerCase, fm)); 3 }
          else if (at("DY")) { sb.append(dayAbbr(d.getDayOfWeek.getValue - 1).toUpperCase); 2 }
          else if (at("Dy")) { sb.append(dayAbbr(d.getDayOfWeek.getValue - 1)); 2 }
          else if (at("dy")) { sb.append(dayAbbr(d.getDayOfWeek.getValue - 1).toLowerCase); 2 }
          else if (at("DDD")) { sb.append(if (fm) d.getDayOfYear.toString else zeroPad(d.getDayOfYear, 3)); 3 }
          else if (at("DD")) { sb.append(pad2(d.getDayOfMonth, fm)); 2 }
          else if (at("HH24")) { sb.append(pad2(d.getHour, fm)); 4 }
          else if (at("HH12") || at("HH")) {
            val h = { val x = d.getHour % 12; if (x == 0) 12 else x }
            sb.append(pad2(h, fm)); if (at("HH12")) 4 else 2
          }
          else if (at("MI")) { sb.append(pad2(d.getMinute, fm)); 2 }
          else if (at("SSSS")) { sb.append((d.getHour * 3600 + d.getMinute * 60 + d.getSecond).toString); 4 }
          else if (at("SS")) { sb.append(pad2(d.getSecond, fm)); 2 }
          else if (at("MS")) { sb.append(zeroPad(d.getNano / 1000000, 3)); 2 }
          else if (at("US")) { sb.append(zeroPad(d.getNano / 1000, 6)); 2 }
          else if (at("AM") || at("PM")) { sb.append(if (d.getHour < 12) "AM" else "PM"); 2 }
          else if (at("am") || at("pm")) { sb.append(if (d.getHour < 12) "am" else "pm"); 2 }
          else if (at("IW")) {
            sb.append(pad2(d.get(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR), fm)); 2
          }
          else if (at("ID")) { sb.append(d.getDayOfWeek.getValue.toString); 2 }
          else if (at("WW")) { sb.append(pad2(1 + (d.getDayOfYear - 1) / 7, fm)); 2 }
          else if (at("D")) { sb.append((d.getDayOfWeek.getValue % 7 + 1).toString); 1 }
          else if (at("Q")) { sb.append(((d.getMonthValue - 1) / 3 + 1).toString); 1 }
          else if (at("J")) { sb.append((d.toLocalDate.toEpochDay + 2440588L).toString); 1 }
          else { sb.append(c); 1 }
        if (consumed > 0 && c.isLetter) fm = false // FM spent on this element
        i += consumed
      }
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

  def toNumber(value: UTF8String, fmt: String): Double = {
    var f = fmt
    if (f.contains("FM")) f = f.replace("FM", "")
    val mi = f.endsWith("MI")
    if (mi) f = f.substring(0, f.length - 2)
    f = f.replace("$", "")
    val dot = f.indexOf('.')
    val intTpl = if (dot >= 0) f.substring(0, dot) else f
    val fracTpl = if (dot >= 0) f.substring(dot + 1) else ""
    val intMax = intTpl.count(c => c == '9' || c == '0')
    val fracMax = fracTpl.count(c => c == '9' || c == '0')

    var s = value.toString.trim
    var neg = false
    if (mi && s.endsWith("-")) { neg = true; s = s.dropRight(1) }
    s = s.trim
    if (s.startsWith("-")) { neg = true; s = s.substring(1) }
    else if (s.startsWith("+")) s = s.substring(1)
    s = s.replace("$", "").replace(",", "").trim
    val dp = s.indexOf('.')
    val ip = (if (dp >= 0) s.substring(0, dp) else s).filter(_.isDigit).take(intMax)
    val fp = (if (dp >= 0) s.substring(dp + 1) else "").filter(_.isDigit).take(fracMax)
    // BigDecimal text→double is correctly rounded — same bits as the
    // engine's own literal/CAST parse of the same digits
    val mag = new java.math.BigDecimal(
      (if (ip.isEmpty) "0" else ip) + (if (fp.nonEmpty) "." + fp else ""))
      .doubleValue()
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

  /** Parse to epoch MICROS of the local (session-naive) datetime. */
  def parseMicros(value: UTF8String, fmt: String): Long = {
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
    var i = 0
    val n = fmt.length
    // DCH keywords parse case-insensitively (formatting.c keys both
    // DCH_DD and DCH_dd to the same action) — 'dd' ≡ 'DD'
    def at(pat: String) = fmt.regionMatches(true, i, pat, 0, pat.length)
    def ati(pat: String) = fmt.regionMatches(true, i, pat, 0, pat.length)
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
    while (i < n) {
      val c = fmt.charAt(i)
      if (c == '"') {
        val close = fmt.indexOf('"', i + 1)
        val end = if (close < 0) n else close
        vi += end - (i + 1) // quoted literal consumes its width
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
            year = readInt(if (greedy) 9 else 4); yearSeen = true; 4
          }
          else if (at("YY")) { // PG century rule: <70 → 20xx, else 19xx
            val y2 = readInt(2); year = if (y2 < 70) 2000 + y2 else 1900 + y2
            yearSeen = true; 2
          }
          else if (ati("MONTH")) { month = 1 + name(monFull, monAbbr, wantFull = true); 5 }
          else if (ati("MON")) { month = 1 + name(monFull, monAbbr, wantFull = false); 3 }
          else if (at("MM")) { month = readInt(2); 2 }
          else if (ati("DAY")) { name(dayFull, dayAbbr, wantFull = true); 3 }
          else if (ati("DY")) { name(dayFull, dayAbbr, wantFull = false); 2 }
          else if (at("DDD")) { doy = readInt(3); 3 }
          else if (at("DD")) { dayM = readInt(2); 2 }
          else if (at("HH24")) { hour24 = readInt(2); 4 }
          else if (at("HH12") || at("HH")) { hour12 = readInt(2); if (at("HH12")) 4 else 2 }
          else if (at("MI")) { minute = readInt(2); 2 }
          else if (at("SSSS")) { ssss = readInt(5); 4 }
          else if (at("SS")) { second = readInt(2); 2 }
          else if (at("MS")) { nanos += readInt(3) * 1000000; 2 }
          else if (at("US")) { nanos += readInt(6) * 1000; 2 }
          else if (ati("A.M.") || ati("P.M.")) { // dotted meridiem (DCH_P_M)
            skipSpaces()
            require(vi + 4 <= v.length, s"to_date/to_timestamp: no meridiem at '$v'[$vi]")
            pm = v.regionMatches(true, vi, "P.M.", 0, 4)
            pmSeen = true; vi += 4; 4
          }
          else if (ati("AM") || ati("PM")) {
            skipSpaces()
            require(vi + 2 <= v.length, s"to_date/to_timestamp: no meridiem at '$v'[$vi]")
            pm = v.regionMatches(true, vi, "PM", 0, 2)
            pmSeen = true; vi += 2; 2
          }
          else if (at("J")) { jul = readInt(7).toLong; 1 }
          else { // separator: consume one loosely-matching input char
            if (vi < v.length && !v.charAt(vi).isDigit) vi += 1
            1
          }
        i += consumed
      }
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
