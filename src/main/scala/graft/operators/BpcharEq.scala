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

  /** exprId → bpchar width / varchar / box attrs, from leaf scans. */
  private def taggedAttrs(plan: LogicalPlan)
      : (Map[ExprId, Int], Set[ExprId], Set[ExprId]) = {
    val bp = Map.newBuilder[ExprId, Int]
    val vc = Set.newBuilder[ExprId]
    val box = Set.newBuilder[ExprId]
    plan.foreach {
      case r: LogicalRelation =>
        r.catalogTable.foreach { ct =>
          val names = Seq(
            ct.identifier.table,
            ct.identifier.database.map(d => s"$d.${ct.identifier.table}")
              .getOrElse(ct.identifier.table))
          val chars = names.map(GreengageDdl.charColLens)
            .foldLeft(Map.empty[String, Int])(_ ++ _)
          val vchars = names.map(GreengageDdl.varcharCols)
            .foldLeft(Set.empty[String])(_ ++ _)
          val boxes = names.flatMap(n => GreengageDdl.geoCols(n).collect {
            case (c, "box") => c }).toSet
          if (chars.nonEmpty || boxes.nonEmpty || vchars.nonEmpty)
            r.output.foreach { a =>
              chars.get(a.name.toLowerCase).foreach(n => bp += a.exprId -> n)
              if (vchars.contains(a.name.toLowerCase)) vc += a.exprId
              if (boxes.contains(a.name.toLowerCase)) box += a.exprId
            }
        }
      case _ =>
    }
    (bp.result(), vc.result(), box.result())
  }

  private def transformPlan(plan: LogicalPlan): LogicalPlan = {
    val (bp, vc, box) = taggedAttrs(plan)
    if (bp.isEmpty && box.isEmpty) return plan
    def bpWidth(e: Expression): Option[Int] = e match {
      case a: AttributeReference => bp.get(a.exprId)
      case _ => None
    }
    def isBox(e: Expression): Boolean = e match {
      case a: AttributeReference => box.contains(a.exprId)
      case _ => false
    }
    // PG operator resolution for the mixed string comparisons
    // (parse_oper.c): bpchar-vs-VARCHAR and bpchar-vs-unknown-literal
    // resolve to bpchareq — trailing blanks INSIGNIFICANT; bpchar-vs-
    // TEXT resolves to texteq over bpchar::text, which KEEPS the pad —
    // blanks significant (bfv_joins: 'cd '::char(3) != 'cd  '::text).
    def blankInsensitive(e: Expression): Boolean = e match {
      case a: AttributeReference => vc.contains(a.exprId)
      case _: Literal => true
      case Cast(c, _, _, _) => blankInsensitive(c)
      case _ => false
    }
    def strTyped(e: Expression): Boolean = e.dataType == StringType
    def trim(e: Expression): Expression = StringTrimRight(e, None)
    def pad(e: Expression, n: Int): Expression =
      if (n > 0) StringRPad(e, Literal(n), Literal(" ")) else e
    plan.transformUpWithSubqueries {
      case p => p.transformExpressionsUp {
        // PG's box comparison operators compare AREA (geo_ops.c
        // box_eq :663) — both sides declared box → area comparison
        case cmp: BinaryComparison if isBox(cmp.left) && isBox(cmp.right) =>
          cmp.withNewChildren(Seq(
            graft.functions.PgBoxArea(cmp.left),
            graft.functions.PgBoxArea(cmp.right))).asInstanceOf[Expression]
        case cmp: BinaryComparison
            if strTyped(cmp.left) && strTyped(cmp.right) &&
              (bpWidth(cmp.left).isDefined ^ bpWidth(cmp.right).isDefined) =>
          val (bpSide, other, bpLeft) =
            if (bpWidth(cmp.left).isDefined) (cmp.left, cmp.right, true)
            else (cmp.right, cmp.left, false)
          val (l, r) =
            if (blankInsensitive(other)) {
              // bpchareq image: stored values are right-trimmed, so
              // trimming the other side completes the comparison
              if (bpLeft) (bpSide, trim(other)) else (trim(other), bpSide)
            } else {
              // texteq image: restore the bpchar pad (declared width)
              val padded = pad(bpSide, bpWidth(bpSide).getOrElse(-1))
              if (bpLeft) (padded, other) else (other, padded)
            }
          cmp.withNewChildren(Seq(l, r)).asInstanceOf[Expression]
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
