package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** contrib/ltree — materialized-path label trees (reference
  * `contrib/ltree/ltree.h`, `ltree_op.c`, `lquery` matching in
  * `ltxtquery_op.c`): paths are dot-separated label strings
  * (`world.asia.china`), ancestry is prefix algebra, and lquery
  * patterns compile driver-side to ONE anchored Java regex evaluated
  * by codegen RLIKE. Everything here is plain column algebra over the
  * string form — no UDF, no shuffle; at 100 TB an ancestor test is a
  * startsWith that parquet can't index but codegen runs at scan speed.
  *
  * lquery subset: literal labels, `a|b` alternation inside a label,
  * `*` (zero or more labels), `*{n}`/`*{n,m}` bounded star. */
object Ltree {

  /** PG `nlevel(ltree)`: number of labels. */
  def nlevel(p: Column): Column = size(split(p, "\\."))

  /** PG `subpath(ltree, offset, len)` — 0-based offset, as in PG. */
  def subpath(p: Column, offset: Int, len: Int): Column =
    array_join(slice(split(p, "\\."), offset + 1, len), ".")

  /** PG `a @> b` — a is an ancestor of (or equal to) b. */
  def isAncestor(a: Column, b: Column): Column =
    (b === a) || b.startsWith(concat(a, lit(".")))

  /** PG `a <@ b` — a is a descendant of (or equal to) b. */
  def isDescendant(a: Column, b: Column): Column = isAncestor(b, a)

  /** PG `lca(a, b)`: longest common label prefix ('' when disjoint). */
  def lca(a: Column, b: Column): Column = {
    val la = split(a, "\\.")
    val lb = split(b, "\\.")
    val n = least(size(la), size(lb))
    // fold: the prefix length stops growing at the first mismatch
    val k = when(n >= 1,
      aggregate(sequence(lit(1), n), lit(0), (acc, i) =>
        when(acc === i - 1 && element_at(la, i) === element_at(lb, i), i)
          .otherwise(acc))).otherwise(lit(0))
    array_join(slice(la, lit(1), k), ".")
  }

  /** PG `ltree ~ lquery`: the pattern compiles once driver-side. */
  def matches(p: Column, lquery: String): Column =
    concat(lit("."), p).rlike(lqueryToRegex(lquery))

  /** lquery → anchored regex over the `.`-prefixed path image. */
  private[functions] def lqueryToRegex(q: String): String = {
    val starBound = "\\*\\{(\\d+)(?:,(\\d+))?\\}".r
    val body = q.split("\\.").map {
      case "*" => "(?:\\.[^.]+)*"
      case starBound(n, m) =>
        val hi = Option(m).getOrElse(n)
        s"(?:\\.[^.]+){$n,$hi}"
      case t =>
        val alts = t.split("\\|").map(Pattern.quote).mkString("|")
        s"\\.(?:$alts)"
    }.mkString
    "^" + body + "$"
  }
}
