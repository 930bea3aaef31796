package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** UPDATE / DELETE over immutable parquet tables (reference
  * `src/backend/access/heap/heapam.c` heap_update/heap_delete): the
  * reference's MVCC writes a new row version and readers keep seeing
  * the old one until commit; the Spark-native analog is a snapshot
  * rewrite — compute the post-statement table, materialize it off the
  * source files (localCheckpoint breaks the read-your-overwrite cycle),
  * and INSERT OVERWRITE atomically. Readers see the old snapshot until
  * the overwrite commits, matching the reference's visibility rules at
  * statement granularity.
  *
  * At 100 TB this is exactly how lakehouse DML engines execute
  * copy-on-write DELETE/UPDATE; partition-pruned predicates rewrite
  * only the partitions they touch when the table is partitioned.
  */
object Dml {

  /** DELETE FROM table WHERE cond. Returns rows deleted. */
  def deleteWhere(spark: SparkSession, table: String, cond: Column): Long = {
    val t = spark.table(table)
    val before = t.count()
    val remaining = t.where(!coalesce(cond, lit(false))).localCheckpoint(true)
    remaining.write.mode("overwrite").insertInto(table)
    before - remaining.count()
  }

  /** UPDATE table SET assignments WHERE cond. Returns rows updated.
    * Unassigned columns pass through; assignments see the OLD row (PG
    * semantics — `SET a = b, b = a` swaps). */
  def updateWhere(spark: SparkSession, table: String, cond: Column,
                  assignments: Map[String, Column]): Long = {
    val t = spark.table(table)
    val hit = coalesce(cond, lit(false))
    val updated = t.select(t.columns.map { c =>
      assignments.get(c) match {
        case Some(v) => when(hit, v).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*).localCheckpoint(true)
    val n = t.where(hit).count()
    updated.write.mode("overwrite").insertInto(table)
    n
  }
}
