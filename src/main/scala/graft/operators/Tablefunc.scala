package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** contrib/tablefunc `crosstab` family (reference
  * `contrib/tablefunc/tablefunc.c:349` `crosstab` and `:632`
  * `crosstab_hash`; SQL surface `tablefunc--1.1.sql:12-66`).
  *
  * Two variants, mapped Spark-first:
  *
  *  - `crosstab(source_sql)` — POSITIONAL. The source must return
  *    exactly 3 columns `(rowid, category, value)` ordered by 1,2
  *    (the contract tablefunc documents; `tablefunc.c` consumes rows
  *    sequentially and starts a new output tuple whenever rowid
  *    changes). One output row per rowid group; the group's values
  *    fill the declared output columns LEFT TO RIGHT in category
  *    order — categories are NOT matched by name, short groups are
  *    NULL-padded, long groups are truncated. Implemented as ONE
  *    hash aggregation: `collect_list(struct(cat, value))` per rowid
  *    (bounded by the category count, never corpus-scale), sorted
  *    with PG's NULLS-LAST ordering, then positional `element_at`
  *    projection — a single shuffle with map-side partial aggregation,
  *    no window sort.
  *
  *  - `crosstab(source_sql, category_sql)` — HASH. The source returns
  *    `(rowid [, extra...], category, value)`; the last two columns
  *    are always category/value, anything between rowid and category
  *    is carried through. The i-th category value from `category_sql`
  *    maps to the i-th declared value column (names in the AS clause
  *    are labels, not match keys — `tablefunc.c:706` hashes category
  *    VALUES to column positions). Missing categories → NULL; source
  *    categories absent from the list are dropped. Implemented as
  *    `groupBy(rowid, extras).pivot(category, values)` — Spark's
  *    pivot takes the explicit value list, so no extra distinct scan,
  *    and the category list is driver-bounded by contract (it is a
  *    column list).
  *
  * `crosstab2/3/4` (`tablefunc--1.1.sql:42-54`) are the positional
  * variant with the fixed schema `(row_name text, category_1..N text)`.
  */
object Tablefunc {

  /** Positional crosstab. `out` is the declared result column list
    * `(name, PG type)` — rowid first, then N value columns. */
  def crosstab(src: DataFrame, out: Seq[(String, String)]): DataFrame = {
    require(src.columns.length == 3,
      "invalid source data SQL statement: the provided SQL must return " +
        "3 columns: rowid, category, and values")
    require(out.size >= 2, "crosstab needs a rowid column and at least one category column")
    val Array(rid, cat, v) = src.columns
    // PG's ORDER BY 1,2 contract is NULLS LAST; sort key (isNull, cat, value)
    // reproduces it inside sort_array (struct compare treats null fields
    // as smallest, so the explicit boolean carries the ordering).
    val packed = src.groupBy(col(rid).as("__rowid"))
      .agg(sort_array(collect_list(struct(
        col(cat).isNull.as("n"),
        col(cat).as("c"),
        col(v).as("v")))).as("__vs"))
    val (ridName, ridType) = out.head
    val valueCols = out.tail.zipWithIndex.map { case ((name, tpe), i) =>
      // try_element_at: a group shorter than the declared column list
      // NULL-pads the remaining columns (ANSI-safe out-of-bounds).
      try_element_at(col("__vs"), lit(i + 1)).getField("v")
        .cast(GreengageDdl.mapType(tpe)).as(name)
    }
    packed.select(col("__rowid").cast(GreengageDdl.mapType(ridType))
      .as(ridName) +: valueCols: _*)
  }

  /** Hash crosstab. `categories` come from the category SQL (in its
    * order); `out` declares `(rowid [, extras...], value columns...)`
    * as `(name, PG type)` pairs. */
  def crosstabHash(src: DataFrame, categories: Seq[String],
                   out: Seq[(String, String)]): DataFrame = {
    require(categories.nonEmpty,
      "provided \"categories\" SQL must return 1 column of at least one row")
    val cols = src.columns
    require(cols.length >= 3,
      "invalid source data SQL statement: the provided SQL must return " +
        ">= 3 columns: rowid, [extras,] category, and values")
    val keyCols = cols.dropRight(2).toSeq
    require(out.size == keyCols.size + categories.size,
      s"result description has ${out.size} columns but rowid+extras " +
        s"(${keyCols.size}) + categories (${categories.size}) need " +
        s"${keyCols.size + categories.size}")
    val cat = cols(cols.length - 2)
    val v = cols.last
    val piv = src.groupBy(keyCols.map(col): _*)
      .pivot(col(cat).cast("string"), categories)
      .agg(first(col(v), ignoreNulls = true))
    val srcOrder = keyCols ++ categories
    piv.select(srcOrder.zip(out).map { case (from, (name, tpe)) =>
      col(s"`${from.replace("`", "``")}`")
        .cast(GreengageDdl.mapType(tpe)).as(name)
    }: _*)
  }

  private val crosstabRe =
    ("(?is)^SELECT\\s+\\*\\s+FROM\\s+crosstab(\\d*)\\s*\\(\\s*'([^']*+(?:''[^']*+)*+)'" +
      "\\s*(?:,\\s*'([^']*+(?:''[^']*+)*+)'\\s*)?\\)\\s*" +
      "(?:(?:AS\\s+)?(\\w+)\\s*\\(([^)]*)\\)\\s*)?;?\\s*$").r

  /** Router entry: `SELECT * FROM crosstab('src'[, 'cats']) AS c(col
    * type, ...)` and the typed `crosstabN('src')` shorthands. Returns
    * None when the statement is not a crosstab scan. */
  def route(spark: SparkSession, sql: String): Option[DataFrame] =
    crosstabRe.findFirstMatchIn(sql.trim).map { m =>
      def unq(s: String) = s.replace("''", "'")
      val srcSql = PgSql.rewrite(unq(m.group(2)))
      val src = spark.sql(srcSql)
      val declared = Option(m.group(5)).map(GreengageDdl.splitTop(_).map { c =>
        val parts = c.trim.split("\\s+", 2)
        require(parts.length == 2, s"column definition needs a type: '$c'")
        (parts(0).replace("\"", ""), parts(1))
      })
      (Option(m.group(1)).filter(_.nonEmpty), Option(m.group(3))) match {
        case (Some(n), _) => // crosstab2/3/4: fixed row_name/category_i text schema
          val k = n.toInt
          crosstab(src, ("row_name", "text") +:
            (1 to k).map(i => (s"category_$i", "text")))
        case (None, None) =>
          crosstab(src, declared.getOrElse(throw new IllegalArgumentException(
            "crosstab(text) requires a column definition list: AS c(col type, ...)")))
        case (None, Some(catSql)) =>
          val catDf = spark.sql(PgSql.rewrite(unq(catSql)))
          require(catDf.columns.length == 1,
            "provided \"categories\" SQL must return 1 column of at least one row")
          // bounded by contract: the category list IS the output column list
          val cats = catDf.collect().map(r =>
            Option(r.get(0)).map(_.toString).orNull).toSeq.filter(_ != null)
          crosstabHash(src, cats, declared.getOrElse(
            throw new IllegalArgumentException(
              "crosstab(text, text) requires a column definition list")))
      }
    }
}
