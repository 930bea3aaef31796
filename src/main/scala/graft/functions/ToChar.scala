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
    val parts = bd.toPlainString.split("\\.")
    val intStr0 = parts(0)
    if (intStr0.length > intDigitsMax)
      return UTF8String.fromString(f.map(c => if (c == ',' || c == '.') c else '#'))

    // walk the integer template right-to-left; a '0' forces digit fill at
    // its own position and every position to its right
    val leftZero = intTpl.indexOf('0')
    val sb = new java.lang.StringBuilder
    var di = intStr0.length - 1
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
    if (intPart.replace(" ", "").isEmpty) intPart = intPart.drop(1) + "0"

    val frac = if (fracDigits > 0) "." + parts(1) else ""
    val core = (if (dollar) "$" else "") + intPart.trim + frac
    val out =
      if (mi) core + (if (neg) "-" else if (fm) "" else " ")
      else if (fm) (if (neg) "-" else "") + core
      else {
        val signed = (if (neg) "-" else " ") + core
        val pad = intTpl.length + 1 + (if (dollar) 1 else 0) - (signed.length - frac.length)
        (" " * math.max(0, pad)) + signed
      }
    UTF8String.fromString(out)
  }
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
