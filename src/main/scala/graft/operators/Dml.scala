package graft.operators

import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** UPDATE / DELETE over immutable parquet tables (reference
  * `src/backend/access/heap/heapam.c` heap_update/heap_delete): the
  * reference's MVCC writes a new row version and readers keep seeing
  * the old one until commit. The Spark-native analog is copy-on-write
  * with a STAGED-SWAP commit — how lakehouse DML engines execute
  * DELETE/UPDATE at 100 TB:
  *
  *  1. The post-statement content of every touched partition is written
  *     to a durable staging directory FIRST. The table's files are not
  *     touched until the complete snapshot exists on disk, so a failure
  *     at any point leaves either the old table intact or the old table
  *     plus a complete staged copy — never a half-overwritten table
  *     whose only other copy was executor-local block storage.
  *  2. The staged snapshot is swapped in; for partitioned tables the
  *     swap uses dynamic partition overwrite, so only partitions that
  *     contain touched rows are replaced — untouched partitions' files
  *     are never rewritten (DdlSpec asserts them byte-identical).
  *  3. Touched partitions are derived from `cond` by scanning only the
  *     predicate's columns for matching rows' partition values; Catalyst
  *     prunes that scan to the partitions `cond` itself constrains.
  *  4. Counts are folded into the same passes: a zero-column parquet
  *     count is answered from footer metadata, so DELETE does exactly
  *     ONE data scan (the rewrite) — not count → rewrite → count.
  *
  * An UPDATE that assigns a partition column is the reference's
  * split-update case (`src/backend/executor/nodeSplitUpdate.c:234`, a
  * distribution-key update becomes delete+insert): rows can move
  * between partitions — including into partitions the predicate never
  * touched — so the statement falls back to a staged full-table
  * rewrite rather than risk dynamic overwrite dropping a destination
  * partition's existing rows.
  */
object Dml {

  /** DELETE FROM table WHERE cond. Returns rows deleted. */
  def deleteWhere(spark: SparkSession, table: String, cond: Column): Long = {
    val t = spark.table(table)
    val hit = coalesce(cond, lit(false)) // NULL predicate = not deleted
    val partCols = partitionColumns(spark, table)
    if (partCols.isEmpty) {
      val before = t.count() // zero-column scan: parquet footer metadata only
      val (kept, _) = stagedSwap(spark, table, t.where(!hit), partCols, dynamic = false)
      before - kept
    } else {
      val touched = touchedPartitions(t, hit, partCols)
      if (touched.isEmpty) 0L
      else {
        val inTouched = partitionFilter(touched, partCols)
        val before = t.where(inTouched).count() // partition filter only: footer count
        val (kept, survivors) =
          stagedSwap(spark, table, t.where(inTouched && !hit), partCols, dynamic = true)
        clearVanishedPartitions(spark, table, partCols, touched, survivors)
        before - kept
      }
    }
  }

  /** UPDATE table SET assignments WHERE cond. Returns rows updated.
    * Unassigned columns pass through; assignments see the OLD row (PG
    * semantics — `SET a = b, b = a` swaps). */
  def updateWhere(spark: SparkSession, table: String, cond: Column,
                  assignments: Map[String, Column]): Long = {
    val t = spark.table(table)
    val hit = coalesce(cond, lit(false))
    val partCols = partitionColumns(spark, table)
    def updatedProjection(src: DataFrame): DataFrame =
      src.select(src.columns.map { c =>
        assignments.get(c) match {
          case Some(v) => when(hit, v).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }: _*)
    val splitUpdate = partCols.exists(assignments.contains)
    if (partCols.isEmpty || splitUpdate) {
      val n = t.where(hit).count() // reads only cond's columns
      stagedSwap(spark, table, updatedProjection(t), partCols, dynamic = false)
      n
    } else {
      val touched = touchedPartitions(t, hit, partCols)
      if (touched.isEmpty) 0L
      else {
        val inTouched = partitionFilter(touched, partCols)
        val n = t.where(inTouched && hit).count() // pruned to touched partitions
        stagedSwap(spark, table, updatedProjection(t.where(inTouched)),
          partCols, dynamic = true)
        n
      }
    }
  }

  private def partitionColumns(spark: SparkSession, table: String): Seq[String] =
    spark.catalog.listColumns(table).collect()
      .filter(_.isPartition).map(_.name).toSeq

  /** Distinct partition values containing rows the statement touches —
    * one column-pruned scan (only `cond`'s columns are read; partitions
    * `cond` statically excludes are pruned by Catalyst). */
  private def touchedPartitions(t: DataFrame, hit: Column,
                                partCols: Seq[String]): Seq[Row] =
    t.where(hit).select(partCols.map(col): _*).distinct().collect().toSeq

  private def partitionFilter(parts: Seq[Row], partCols: Seq[String]): Column =
    parts.map { r =>
      partCols.zipWithIndex.map { case (c, i) =>
        val v = r.get(i)
        if (v == null) col(c).isNull else col(c) === lit(v)
      }.reduce(_ && _)
    }.reduce(_ || _)

  /** Write `data` durably to a staging dir under the warehouse, then
    * swap it into the table (dynamic partition overwrite replaces only
    * the partitions present in `data`). The swap runs in a child
    * session so the partitionOverwriteMode override never leaks into
    * the caller's session. Returns (staged row count — from parquet
    * footers, no data scan; staged partition values). */
  private def stagedSwap(spark: SparkSession, table: String, data: DataFrame,
                         partCols: Seq[String],
                         dynamic: Boolean): (Long, Seq[Row]) = {
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val dir = new java.io.File(new java.io.File(wh, ".dml_staging"),
      s"${table}_${UUID.randomUUID().toString.take(8)}")
    val w = data.write.mode("overwrite")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .parquet(dir.getAbsolutePath)
    // the snapshot is now durable; only now is the table touched
    val tableSchema = spark.table(table).schema
    val scoped = spark.newSession() // shared catalog, isolated conf
    graft.Tables.tune(scoped)
    scoped.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
    if (dynamic)
      scoped.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // explicit schema: partition-directory values must come back with the
    // catalog's types, not path-inference's guess
    val staged = scoped.read.schema(tableSchema).parquet(dir.getAbsolutePath)
      .select(tableSchema.fieldNames.map(col): _*)
    val n = staged.count() // footer metadata only
    val survivors =
      if (partCols.isEmpty) Nil
      else staged.select(partCols.map(col): _*).distinct().collect().toSeq
    staged.write.mode("overwrite").insertInto(table)
    // the write invalidated the CHILD session's relation cache; the
    // caller's session still holds the pre-swap file listing
    spark.catalog.refreshTable(table)
    rm(dir)
    (n, survivors)
  }

  /** A touched partition whose every row was deleted is absent from the
    * staged snapshot, so dynamic overwrite leaves its old files behind —
    * drop it explicitly (PG DELETE leaves an empty heap; a dropped
    * partition scans as empty just the same). */
  private def clearVanishedPartitions(spark: SparkSession, table: String,
                                      partCols: Seq[String],
                                      touched: Seq[Row],
                                      survivors: Seq[Row]): Unit = {
    val gone = touched.map(_.toSeq).toSet -- survivors.map(_.toSeq).toSet
    for (p <- gone) {
      val spec = partCols.zip(p).map { case (c, v) =>
        val sqlLit = v match {
          case s: String => "'" + s.replace("'", "''") + "'"
          case other => String.valueOf(other)
        }
        s"$c = $sqlLit"
      }.mkString(", ")
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION ($spec)")
    }
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
  }
}
