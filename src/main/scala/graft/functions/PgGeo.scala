package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PG geometric text I/O + operators — the slice the regress suites
  * exercise (reference `src/backend/utils/adt/geo_ops.c`):
  *
  *  - `lseg_in` (:2018): accepts `[(x1,y1),(x2,y2)]` or `((x1,y1),(x2,y2))`
  *    or bare `(x1,y1),(x2,y2)`; canonical output is the bracket form.
  *  - `box_in` (:413): same point syntax; box_out prints HIGH corner
  *    first — corners normalize so x1≥x2, y1≥y2.
  *  - `box_area`: PG's box `=` / `<` / `>` compare AREA (geo_ops.c
  *    box_eq :663 — `box_ar(a) == box_ar(b)`), not geometry. The
  *    BpcharEq-style plan rule maps box-column comparisons onto this.
  *
  * Values live as canonical TEXT (SURVEY §1.2 mapping); numbers render
  * via PG float8 shortest-form rules (drop trailing `.0`). */
object PgGeo {

  private def num(s: String): Double = java.lang.Double.parseDouble(s.trim)

  private def fmt(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) {
      val l = d.toLong
      l.toString
    } else d.toString

  /** The four coordinates of a two-point geometric literal. */
  private def points(s0: String): (Double, Double, Double, Double) = {
    val s = s0.trim.stripPrefix("[").stripSuffix("]")
    val m = java.util.regex.Pattern.compile(
      "\\(\\s*([-+0-9.eE]+)\\s*,\\s*([-+0-9.eE]+)\\s*\\)\\s*,\\s*" +
        "\\(\\s*([-+0-9.eE]+)\\s*,\\s*([-+0-9.eE]+)\\s*\\)").matcher(s)
    if (!m.find()) throw new IllegalArgumentException(
      s"invalid input syntax for geometric type: \"$s0\"")
    (num(m.group(1)), num(m.group(2)), num(m.group(3)), num(m.group(4)))
  }

  def lsegIn(s: String): String = {
    val (x1, y1, x2, y2) = points(s)
    s"[(${fmt(x1)},${fmt(y1)}),(${fmt(x2)},${fmt(y2)})]"
  }

  /** box_in + box_out: corners reorder so the FIRST point is the
    * upper-right (geo_ops.c box_fill swaps to keep high/low). */
  def boxIn(s: String): String = {
    val (x1, y1, x2, y2) = points(s)
    val (hx, lx) = (math.max(x1, x2), math.min(x1, x2))
    val (hy, ly) = (math.max(y1, y2), math.min(y1, y2))
    s"(${fmt(hx)},${fmt(hy)}),(${fmt(lx)},${fmt(ly)})"
  }

  def boxArea(s: String): Double = {
    val (x1, y1, x2, y2) = points(s)
    math.abs(x1 - x2) * math.abs(y1 - y2)
  }
}

case class PgLsegIn(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(PgGeo.lsegIn(v.toString))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PgGeo.lsegIn($c.toString()))")
  override protected def withNewChildInternal(n: Expression): PgLsegIn =
    copy(child = n)
}

case class PgBoxIn(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(PgGeo.boxIn(v.toString))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PgGeo.boxIn($c.toString()))")
  override protected def withNewChildInternal(n: Expression): PgBoxIn =
    copy(child = n)
}

case class PgBoxArea(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    PgGeo.boxArea(v.toString)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PgGeo.boxArea($c.toString())")
  override protected def withNewChildInternal(n: Expression): PgBoxArea =
    copy(child = n)
}
