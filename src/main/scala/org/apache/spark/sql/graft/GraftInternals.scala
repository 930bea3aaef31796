package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.{DataFrame, SparkSession => ApiSparkSession}

/** Narrow bridge to the `private[sql]` DataFrame constructor — the
  * standard technique Spark extension libraries use to wrap a
  * transformed LogicalPlan back into a DataFrame. Nothing else from
  * the internal API is exposed. */
object GraftInternals {
  def ofRows(spark: ApiSparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  def columnExpr(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** As [[columnExpr]], but a Column built from `expr("...")` (whose
    * node is a lazy SqlExpression holding unparsed text) is PARSED
    * into a real expression tree, so callers can walk its attribute
    * references. Returns None when the column holds no SQL text and
    * no walkable tree. */
  def parsedColumnExpr(spark: ApiSparkSession,
                       c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    def parseSqlNodes(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression =
      e transform {
        case cne if cne.getClass.getSimpleName == "ColumnNodeExpression" =>
          // reflectively read the wrapped ColumnNode; SqlExpression
          // carries the raw text expr() was built from
          val nodeField = cne.getClass.getDeclaredFields
            .find(f => classOf[org.apache.spark.sql.internal.ColumnNode]
              .isAssignableFrom(f.getType))
          nodeField match {
            case Some(f) =>
              f.setAccessible(true)
              f.get(cne) match {
                case s: org.apache.spark.sql.internal.SqlExpression =>
                  spark.asInstanceOf[SparkSession]
                    .sessionState.sqlParser.parseExpression(s.expression)
                case _ => cne
              }
            case None => cne
          }
      }
    parseSqlNodes(columnExpr(c))
  }

  def exprColumn(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** localCheckpoint + a fold over the rows in ONE job.
    *
    * `Dataset.localCheckpoint(eager = true)` materializes the
    * checkpoint by running a count over the RDD and DISCARDING the
    * value; driver-side fixpoint loops (recursive CTEs, label
    * propagation) then immediately run a second job just to learn the
    * frontier's count/sum for their convergence check. This helper
    * runs the same materializing pass but keeps a per-row long fold
    * (count, column sum), halving the job count of every fixpoint
    * round — these loops are job-floor-bound, not data-bound.
    * Returns (checkpointed frame, fold result). */
  def localCheckpointWithLongAgg(
      df: DataFrame,
      seqOp: (Long, org.apache.spark.sql.catalyst.InternalRow) => Long)
      : (DataFrame, Long) = {
    val ds = df.asInstanceOf[Dataset[_]]
    // same internals as Dataset.localCheckpoint: copy the reused
    // UnsafeRows, mark for local checkpointing, materialize via an
    // action — ours folds instead of counting
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val n = rdd.aggregate(0L)(seqOp, _ + _)
    val plan = org.apache.spark.sql.execution.LogicalRDD
      .fromDataset(rdd, ds, isStreaming = false)
    (Dataset.ofRows(ds.sparkSession, plan), n)
  }

  /** Stop the state-store maintenance executor so a benchmark JVM can
    * exit without the maintenance thread's post-shutdown WARN chatter
    * (it is restarted lazily if streaming runs again). */
  def stopStateStoreMaintenance(): Unit =
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Throwable => () }

  /** A QueryExecution that PLANS a statement without running it:
    * CommandExecutionMode.SKIP keeps eagerly-executed commands
    * (INSERT/CTAS) un-run, so EXPLAIN on a DML statement can print the
    * plan without mutating data — PG's EXPLAIN-without-ANALYZE
    * contract. */
  def lazyQueryExecution(spark: ApiSparkSession, sqlText: String)
      : org.apache.spark.sql.execution.QueryExecution = {
    val cs = spark.asInstanceOf[SparkSession]
    new org.apache.spark.sql.execution.QueryExecution(cs,
      cs.sessionState.sqlParser.parsePlan(sqlText),
      mode = org.apache.spark.sql.execution.CommandExecutionMode.SKIP)
  }
}
