package graft.functions

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** PG-style symbolic timestamp difference and interval normalization —
  * reference `src/backend/utils/adt/timestamp.c:4205` (`timestamp_age`)
  * and `:3436` (`interval_justify_*`). Field-by-field calendar diff with
  * a borrow chain (secs→mins→hours→days→months→years); days borrow from
  * the EARLIER date's month length, matching PG/DuckDB. Intervals here
  * are the PG (months, days, micros) triple carried as plain columns —
  * Spark's CalendarIntervalType is not comparable/orderable, so exposing
  * the parts keeps results joinable and oracle-checkable.
  */
object PgAge {

  private val dayTab = Array(
    Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
    Array(31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31))

  private def isLeap(y: Int): Int =
    if ((y % 4 == 0 && y % 100 != 0) || y % 400 == 0) 1 else 0

  private val UsPerMin = 60000000L
  private val UsPerDay = 86400000000L

  private def ldt(us: Long): LocalDateTime =
    LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt, ZoneOffset.UTC)

  /** age(t1, t2): symbolic difference as (years, months, days, hours,
    * mins, within-minute micros), negated per-field when t1 < t2 —
    * exactly DuckDB's `age()` / PG `timestamp_age`. */
  def age(usA: Long, usB: Long): InternalRow = {
    val neg = usA < usB
    val (us1, us2) = if (neg) (usB, usA) else (usA, usB)
    val d1 = ldt(us1)
    val d2 = ldt(us2)
    var years = d1.getYear - d2.getYear
    var months = d1.getMonthValue - d2.getMonthValue
    var days = d1.getDayOfMonth - d2.getDayOfMonth
    var hours = d1.getHour - d2.getHour
    var mins = d1.getMinute - d2.getMinute
    var us = (d1.getSecond * 1000000L + Math.floorMod(us1, 1000000L)) -
      (d2.getSecond * 1000000L + Math.floorMod(us2, 1000000L))
    if (us < 0) { us += UsPerMin; mins -= 1 }
    if (mins < 0) { mins += 60; hours -= 1 }
    if (hours < 0) { hours += 24; days -= 1 }
    while (days < 0) {
      // borrow from the earlier date's (fixed) month — PG timestamp_age
      days += dayTab(isLeap(d2.getYear))(d2.getMonthValue - 1)
      months -= 1
    }
    while (months < 0) { months += 12; years -= 1 }
    val s = if (neg) -1 else 1
    new GenericInternalRow(Array[Any](
      s * years, s * months, s * days, s * hours, s * mins, s * us))
  }

  val ageType: StructType = StructType(Nil)
    .add("years", IntegerType).add("months", IntegerType)
    .add("days", IntegerType).add("hours", IntegerType)
    .add("mins", IntegerType).add("us", LongType)

  val partsType: StructType = StructType(Nil)
    .add("months", IntegerType).add("days", IntegerType).add("us", LongType)

  /** interval_justify_hours: 24h chunks of time become days, then one
    * sign-normalization step (C truncated division throughout). */
  def justifyHours(monthsIn: Int, daysIn: Int, usIn: Long): InternalRow = {
    var days = daysIn.toLong
    var us = usIn
    val wholeDay = us / UsPerDay // Java / == C / : truncates toward zero
    us -= wholeDay * UsPerDay
    days += wholeDay
    if (days > 0 && us < 0) { us += UsPerDay; days -= 1 }
    else if (days < 0 && us > 0) { us -= UsPerDay; days += 1 }
    new GenericInternalRow(Array[Any](monthsIn, days.toInt, us))
  }

  /** interval_justify_days: 30-day chunks become months (time untouched). */
  def justifyDays(monthsIn: Int, daysIn: Int, usIn: Long): InternalRow = {
    var months = monthsIn
    var days = daysIn
    val wholeMonth = days / 30
    days -= wholeMonth * 30
    months += wholeMonth
    if (months > 0 && days < 0) { days += 30; months -= 1 }
    else if (months < 0 && days > 0) { days -= 30; months += 1 }
    new GenericInternalRow(Array[Any](months, days, usIn))
  }

  /** interval_justify_interval: both conversions plus full sign
    * normalization across the three fields. */
  def justifyInterval(monthsIn: Int, daysIn: Int, usIn: Long): InternalRow = {
    var months = monthsIn.toLong
    var days = daysIn.toLong
    var us = usIn
    val wholeDay = us / UsPerDay
    us -= wholeDay * UsPerDay
    days += wholeDay
    val wholeMonth = days / 30
    days -= wholeMonth * 30
    months += wholeMonth
    if (months > 0 && (days < 0 || (days == 0 && us < 0))) {
      days += 30; months -= 1
    } else if (months < 0 && (days > 0 || (days == 0 && us > 0))) {
      days -= 30; months += 1
    }
    if (days > 0 && us < 0) { us += UsPerDay; days -= 1 }
    else if (days < 0 && us > 0) { us -= UsPerDay; days += 1 }
    new GenericInternalRow(Array[Any](months.toInt, days.toInt, us))
  }
}

/** `age_pg(t1, t2)` — struct(years, months, days, hours, mins, us). */
case class AgePg(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = PgAge.ageType
  override def prettyName: String = "age_pg"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PgAge.age(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PgAge.age($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AgePg =
    copy(left = newLeft, right = newRight)
}

/** `justify_days|hours|interval(months, days, us)` —
  * struct(months, days, us) per PG interval_justify_*. */
case class JustifyParts(first: Expression, second: Expression,
                        third: Expression, mode: String)
  extends TernaryExpression {

  override def dataType: DataType = PgAge.partsType
  override def prettyName: String = s"justify_$mode"

  override protected def nullSafeEval(m: Any, d: Any, us: Any): Any = mode match {
    case "days" => PgAge.justifyDays(
      m.asInstanceOf[Int], d.asInstanceOf[Int], us.asInstanceOf[Long])
    case "hours" => PgAge.justifyHours(
      m.asInstanceOf[Int], d.asInstanceOf[Int], us.asInstanceOf[Long])
    case _ => PgAge.justifyInterval(
      m.asInstanceOf[Int], d.asInstanceOf[Int], us.asInstanceOf[Long])
  }

  private def kernel: String = mode match {
    case "days" => "justifyDays"
    case "hours" => "justifyHours"
    case _ => "justifyInterval"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (m, d, us) =>
      s"graft.functions.PgAge.$kernel($m, $d, $us)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): JustifyParts =
    copy(first = f, second = s, third = t)
}
