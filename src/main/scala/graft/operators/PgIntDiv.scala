package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Expression, IntegralDivide}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** PG integer division (int4div, `src/backend/utils/adt/int.c`):
  * `int / int` TRUNCATES in PG — `7 / 2 = 3`, toward zero for
  * negatives — while Spark's `/` coerces both sides to double and
  * divides exactly. Migrated SQL leans on the truncating idiom
  * constantly (`a / 10` as a bucketing key), so the front door
  * restores it ON THE ANALYZED PLAN, where operand types are known:
  *
  *   Divide(Cast(l: integral → double), Cast(r: integral → double))
  *     → Cast(IntegralDivide(l, r), double)
  *
  * Both casts must be COERCION-inserted — a cast the user wrote
  * (`a::float8 / b`, Spark tags it [[Cast.USER_SPECIFIED_CAST]]) means
  * they asked for exact division and the pattern does not fire. The
  * outer double cast keeps the subtree's resolved type unchanged, so
  * the surrounding plan stays valid; the optimizer folds it where it
  * can. Truncation toward zero matches because IntegralDivide is
  * Java/long division. Applies only to statements entering through
  * the PG front door ([[graft.Graft.execute]]) — Spark-API callers
  * keep Spark semantics. */
object PgIntDiv {

  private def coerced(e: Expression): Option[Expression] = e match {
    case c: Cast if c.dataType == DoubleType &&
        Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(c.child.dataType) &&
        c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
      Some(c.child)
    case _ => None
  }

  def transformPlan(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case p => p.transformExpressionsUp {
        case d: Divide =>
          (coerced(d.left), coerced(d.right)) match {
            case (Some(l), Some(r)) =>
              Cast(
                IntegralDivide(Cast(l, LongType), Cast(r, LongType)),
                DoubleType)
            case _ => d
          }
      }
    }

  /** Rewrite a front-door DataFrame; returns the input unchanged when
    * no coerced integer division is present (zero overhead). Command
    * plans (INSERT and friends) are NEVER re-wrapped: spark.sql ran
    * them eagerly, and building a new Dataset over the transformed
    * plan would run the command a second time. Their query bodies get
    * PG division through the dedicated DML paths instead
    * (insertWithAssignmentCasts, the CTAS body view). */
  def apply(spark: SparkSession, df: DataFrame): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    import org.apache.spark.sql.catalyst.plans.logical.{Command, CommandResult}
    if (analyzed.isInstanceOf[Command] ||
        analyzed.isInstanceOf[CommandResult] ||
        analyzed.exists(_.isInstanceOf[Command])) return df
    val transformed = transformPlan(analyzed)
    if (transformed.fastEquals(analyzed)) df
    else org.apache.spark.sql.graft.GraftInternals.ofRows(spark, transformed)
  }
}
