package graft.operators

/** `CREATE AGGREGATE` built from the CATALOG transition functions
  * (pg_aggregate.h; the regress suites re-declare the standard
  * aggregates under new names — create_aggregate.sql:6-38). The
  * transition/final function pair identifies which builtin the
  * declaration reconstructs, and the new name becomes a pure alias:
  * call sites substitute the builtin name before the SQL rewrite, so
  * `newcnt(*)` → `count(*)` with arguments untouched. Aggregates over
  * USER transition functions (arbitrary plpgsql state) are refused
  * loudly — that generality is [[graft.functions.WeightedAvg]]'s
  * Aggregator surface, not a SQL-name alias.
  *
  * Custom Aggregator-backed CREATE AGGREGATE (sfunc written as a
  * registered SQL function) is out of scope here by design: the
  * reference's own tests for that shape exercise logging/state dumps
  * with no Spark analog. */
object PgAggregates {

  private val aliases =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** sfunc (or finalfunc, checked second) → builtin aggregate. */
  private val sfuncMap = Map(
    "int2_avg_accum" -> "avg", "int4_avg_accum" -> "avg",
    "int8_avg_accum" -> "avg", "numeric_avg_accum" -> "avg",
    "float4_accum" -> "avg", "float8_accum" -> "avg",
    "int2pl" -> "sum", "int4pl" -> "sum", "int8pl" -> "sum",
    "float4pl" -> "sum", "float8pl" -> "sum", "numeric_add" -> "sum",
    "int2_sum" -> "sum", "int4_sum" -> "sum", "int8_sum" -> "sum",
    "float4_sum" -> "sum", "float8_sum" -> "sum",
    "int8inc" -> "count", "int8inc_any" -> "count",
    "array_agg_transfn" -> "array_agg")

  private val finalMap = Map(
    "rank_final" -> "rank", "dense_rank_final" -> "dense_rank",
    "percent_rank_final" -> "percent_rank",
    "cume_dist_final" -> "cume_dist",
    "percentile_disc_final" -> "percentile_disc",
    "percentile_cont_float8_final" -> "percentile_cont",
    "percentile_cont_interval_final" -> "percentile_cont",
    "int8_avg" -> "avg", "numeric_avg" -> "avg",
    "array_agg_finalfn" -> "array_agg")

  /** `CREATE FUNCTION name(...) ... AS 'cname' LANGUAGE internal`:
    * the regress suites re-expose catalog C functions under local
    * names and build aggregates from them (arrays.sql int_agg_state →
    * array_agg_transfn). name → catalog C name. */
  private val internalFns =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def registerInternal(name: String, cname: String): Unit = {
    internalFns.put(name.toLowerCase.split("\\.").last,
      cname.toLowerCase)
    ()
  }

  /** The catalog C function a user name was aliased to via
    * `CREATE FUNCTION .. AS 'cname' LANGUAGE internal`, if any. */
  def internalOf(name: String): Option[String] =
    Option(internalFns.get(name.toLowerCase.split("\\.").last))

  private def dealias(fn: String): String =
    Option(internalFns.get(fn)).getOrElse(fn)

  private val createRe =
    ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?(?:ORDERED\\s+)?AGGREGATE\\s+" +
      "([\\w.\"]+)\\s*(?:\\([^()]*\\)\\s*)?\\((.*)\\)\\s*;?\\s*$").r

  /** Route a CREATE AGGREGATE statement; throws on a user-transition
    * aggregate this alias surface cannot express. */
  def create(stmt: String): Unit = {
    val m = createRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(
        s"cannot parse CREATE AGGREGATE: $stmt"))
    val name = m.group(1).replace("\"", "").toLowerCase
      .split("\\.").last
    val opts = GreengageDdl.splitTop(m.group(2)).flatMap { o =>
      o.split("=", 2) match {
        case Array(k, v) =>
          Some(k.trim.toLowerCase -> v.trim.replace("'", "").toLowerCase)
        case _ => None
      }
    }.toMap
    val sfunc = opts.get("sfunc").orElse(opts.get("sfunc1")).map(dealias)
    val ffunc = opts.get("finalfunc").map(dealias)
    // the classic user-median idiom: array_append transition (the
    // state is the collected group) + a final that averages the middle
    // element(s) of the sorted array — exactly percentile_cont(0.5)
    val arrayMedian = sfunc.contains("array_append") &&
      ffunc.flatMap(SqlFunctions.bodyOf).exists { b =>
        val lb = b.toLowerCase
        lb.contains("unnest") && lb.contains("avg") && lb.contains("offset")
      }
    val builtin =
      if (arrayMedian) "pg_median"
      else ffunc.flatMap(finalMap.get)
        .orElse(sfunc.flatMap(sfuncMap.get))
        // PG accepts the CREATE (it only validates signatures) and a
        // problematic aggregate errors at USE — register a poison
        // alias whose call site fails loudly as an unknown function
        .getOrElse(s"__graft_unsupported_agg_$name")
    aliases.put(name, builtin)
  }

  private val alterRenameRe =
    ("(?is)^\\s*ALTER\\s+AGGREGATE\\s+([\\w.\"]+)\\s*(?:\\([^()]*\\))?" +
      "\\s+RENAME\\s+TO\\s+([\\w.\"]+)\\s*;?\\s*$").r

  def alterRename(stmt: String): Unit = {
    val m = alterRenameRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(
        s"cannot parse ALTER AGGREGATE: $stmt"))
    val from = m.group(1).replace("\"", "").toLowerCase.split("\\.").last
    val to = m.group(2).replace("\"", "").toLowerCase.split("\\.").last
    Option(aliases.remove(from)).foreach(b => aliases.put(to, b))
  }

  def drop(name: String): Unit = {
    aliases.remove(name.toLowerCase.split("\\.").last)
    ()
  }

  /** Substitute registered aggregate names at call sites (name only —
    * arguments, DISTINCT, `*`, WITHIN GROUP all pass through). The
    * quoted spelling `"median"(x)` resolves to the same entry. */
  def substituteNames(sql: String): String = {
    if (aliases.isEmpty) return sql
    import scala.jdk.CollectionConverters._
    var out = sql
    for (e <- aliases.entrySet().asScala)
      out = out.replaceAll(
        "(?i)(?<![\\w.])\"?" + java.util.regex.Pattern.quote(e.getKey) +
          "\"?(\\s*\\()",
        java.util.regex.Matcher.quoteReplacement(e.getValue) + "$1")
    out
  }
}
