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
