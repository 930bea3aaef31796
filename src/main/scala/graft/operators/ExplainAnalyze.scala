package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** EXPLAIN ANALYZE (reference `src/backend/commands/explain.c` with
  * ANALYZE instrumentation): execute the query, then walk the executed
  * (post-AQE) physical plan and surface every operator's runtime SQL
  * metrics — output rows, spill bytes, shuffle bytes, scan sizes,
  * build times — as rows a user (or a regression harness) can query.
  * Spark already instruments each operator; this makes the numbers a
  * first-class result instead of UI-only state.
  */
object ExplainAnalyze {

  final case class OpMetric(depth: Int, operator: String, metric: String,
                            value: Long, unit: String)

  /** Execute `df`'s OWN physical plan (a separate action like count()
    * would instrument a different query) and return one row per
    * (operator, metric), in plan order. The plan is driven through a
    * distributed no-op sink (`toRdd.foreach`), NOT `executeCollect` —
    * EXPLAIN ANALYZE of a 100 TB result must never materialize the
    * result on the driver; the SQLMetric accumulators populate either
    * way. */
  def run(df: DataFrame): Seq[OpMetric] = {
    val qe = df.queryExecution
    qe.toRdd.foreach(_ => ())
    collect(finalPlan(qe.executedPlan), 0)
  }

  /** Tabular form, for `display`/assert convenience. */
  def runAsDataFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    run(df).toDF()
  }

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    case q: QueryStageExec => finalPlan(q.plan) // AQE stage wrappers (incl. result stage)
    case other => other
  }

  /** EXPLAIN (FORMAT JSON[, ANALYZE]) (explain.c ExplainPrintPlan
    * json format): the plan tree as `[{"Plan": {...}}]` — node type,
    * children under "Plans", and with ANALYZE each node's runtime
    * metrics. Node names are this engine's physical operators (the
    * shape, not PG's node vocabulary, is the contract tooling parses). */
  def explainJson(df: DataFrame, analyze: Boolean): String =
    explainJsonQe(df.queryExecution, analyze)

  def explainJsonQe(qe: org.apache.spark.sql.execution.QueryExecution,
                    analyze: Boolean): String = {
    if (analyze) qe.toRdd.foreach(_ => ())
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def node(p: SparkPlan): String = {
      val ms = p.metrics.toSeq.sortBy(_._1).map { case (n, m) =>
        s""""${esc(n)}": ${m.value}""" }
      val metrics =
        if (!analyze || ms.isEmpty) "" else ms.mkString(", ", ", ", "")
      val kids = p.children.map(c => node(finalPlan(c)))
      val plans = if (kids.isEmpty) ""
        else s""", "Plans": [${kids.mkString(", ")}]"""
      s"""{"Node Type": "${esc(p.nodeName)}"$metrics$plans}"""
    }
    s"""[{"Plan": ${node(finalPlan(qe.executedPlan))}}]"""
  }

  private def collect(p: SparkPlan, depth: Int): Seq[OpMetric] = {
    val own = p.metrics.toSeq.sortBy(_._1).map { case (name, m) =>
      val unit = m.metricType match {
        case "size" => "bytes"
        case "timing" => "ms"
        case "nsTiming" => "ns" // stored in nanoseconds — labeling it ms
                                // would misreport by a factor of 10^6
        case other => other
      }
      OpMetric(depth, p.nodeName, name, m.value, unit)
    }
    own ++ p.children.flatMap(c => collect(finalPlan(c), depth + 1))
  }
}
