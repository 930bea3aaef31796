package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StringType

/** bpchar comparison semantics (reference `src/backend/utils/adt/
  * varlena.c` bpchareq / varchar.c): PG compares char(n) values with
  * trailing blanks INSIGNIFICANT, and a varchar/text operand compared
  * against bpchar is cast to bpchar first (`(a)::bpchar = p` in every
  * reference plan), so its trailing blanks stop counting too.
  *
  * The engine stores declared char(n) columns right-trimmed
  * (GreengageDdl.charCols registry), which makes bpchar-vs-bpchar
  * comparison exact. This rule completes the cross-type case: any
  * comparison where exactly ONE side is a declared bpchar column gets
  * the OTHER side wrapped in rtrim(..), the engine's image of PG's
  * varchar→bpchar cast. A plan rewrite (not a parse-time hack): it
  * sees resolved attributes, so aliases/subqueries/joins all route
  * here, and rtrim over the probe side keeps whole-stage codegen.
  */
object BpcharEq {

  /** exprId → is-a-declared-bpchar-column, from the plan's leaf scans. */
  private def bpcharAttrs(plan: LogicalPlan): Set[ExprId] = {
    val ids = Set.newBuilder[ExprId]
    plan.foreach {
      case r: LogicalRelation =>
        r.catalogTable.foreach { ct =>
          val names = Seq(
            ct.identifier.table,
            ct.identifier.database.map(d => s"$d.${ct.identifier.table}")
              .getOrElse(ct.identifier.table))
          val cols = names.map(GreengageDdl.charCols)
            .foldLeft(Set.empty[String])(_ ++ _)
          if (cols.nonEmpty)
            r.output.foreach(a =>
              if (cols.contains(a.name.toLowerCase)) ids += a.exprId)
        }
      case _ =>
    }
    ids.result()
  }

  private def transformPlan(plan: LogicalPlan): LogicalPlan = {
    val bp = bpcharAttrs(plan)
    if (bp.isEmpty) return plan
    def isBp(e: Expression): Boolean = e match {
      case a: AttributeReference => bp.contains(a.exprId)
      case _ => false
    }
    def strTyped(e: Expression): Boolean = e.dataType == StringType
    def trim(e: Expression): Expression = StringTrimRight(e, None)
    plan.transformUpWithSubqueries {
      case p => p.transformExpressionsUp {
        case cmp: BinaryComparison
            if strTyped(cmp.left) && strTyped(cmp.right) &&
              (isBp(cmp.left) ^ isBp(cmp.right)) =>
          if (isBp(cmp.left))
            cmp.withNewChildren(Seq(cmp.left, trim(cmp.right)))
              .asInstanceOf[Expression]
          else
            cmp.withNewChildren(Seq(trim(cmp.left), cmp.right))
              .asInstanceOf[Expression]
      }
    }
  }

  /** Rewrite a front-door DataFrame; unchanged input when no bpchar
    * comparison is present (zero overhead). Command plans are never
    * re-wrapped — same contract as [[PgIntDiv]]. */
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
