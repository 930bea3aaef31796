package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** PostgreSQL ordering semantics shim (SURVEY §7.3): PG defaults to
  * NULLS LAST for ASC and NULLS FIRST for DESC; Spark's defaults are the
  * opposite. Route ORDER BY through these to keep reference parity.
  */
object PgSort {

  def ascPg(c: Column): Column = c.asc_nulls_last
  def descPg(c: Column): Column = c.desc_nulls_first

  implicit class PgOrderOps(val df: DataFrame) extends AnyVal {
    /** ORDER BY with PG default null placement; `(col, ascending)`. */
    def orderByPg(keys: (Column, Boolean)*): DataFrame =
      df.orderBy(keys.map { case (c, asc) => if (asc) ascPg(c) else descPg(c) }: _*)
  }
}
