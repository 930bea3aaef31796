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

  def exprColumn(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
