package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ForeignScan / FDW surface (reference `nodeForeignscan.c`,
  * contrib postgres_fdw & file_fdw): external relational sources exposed
  * as DataFrames via Spark's JDBC source.
  *
  * Exercised for real against the in-JVM Derby endpoint
  * (`jdbc:derby:memory:`) — see ForeignSpec and q115_foreign_jdbc; on a
  * cluster any other driver jar rides --jars and everything below works
  * unchanged.
  */
object Foreign {

  /** Single-partition foreign table (small dims — the FDW default). */
  def jdbcTable(spark: SparkSession, url: String, table: String,
                props: Map[String, String] = Map.empty): DataFrame = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, p)
  }

  /** Parallel foreign scan: numPartitions range-partitioned readers over
    * a numeric column — the MPP-style segmented external read (each
    * "segment" pulls its slice, like gpfdist splitting input). */
  def jdbcTablePartitioned(spark: SparkSession, url: String, table: String,
                           partitionColumn: String, lowerBound: Long,
                           upperBound: Long, numPartitions: Int,
                           props: Map[String, String] = Map.empty): DataFrame = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, p)
  }

  /** Pushdown-friendly foreign subquery (predicate ships to the remote —
    * the FDW remote-estimate path). */
  def jdbcQuery(spark: SparkSession, url: String, sql: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
      .load()
}
