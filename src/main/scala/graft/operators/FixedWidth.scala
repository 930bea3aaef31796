package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Fixed-width external-table formatter — the mainframe-ETL ingest
  * format (reference `contrib/formatter_fixedwidth/fixedwidth.c`:
  * option parsing `load_format_config` :154-192, field extraction
  * `extract_field` :91-128, line sizing `get_actual_line_size`
  * :458-530; registered as `FORMAT 'CUSTOM'
  * (formatter=fixedwidth_in, col='width', ...)`).
  *
  * Semantics matched:
  *  - each record is the concatenation of fixed-size fields (sum =
  *    `fields_tot_size`) followed by the line delimiter (default \n);
  *    a record whose length differs is malformed;
  *  - unless `preserve_blanks='on'`, trailing blanks are stripped from
  *    each field before conversion;
  *  - a field equal to the `null` option (blank-padded on disk,
  *    `make_null_val_with_blanks` :243) reads as NULL;
  *  - conversion failures are data errors — they flow into the same
  *    SREH reject accounting as CSV parse errors.
  *
  * Spark mapping: one line-oriented text scan (splittable, no driver
  * hop), then a pure codegen projection — `substring`/`rtrim`/`when`/
  * `try_cast` per field — so the whole parse stays inside whole-stage
  * codegen. At 100 TB this is a map-only pipeline with predicate
  * pushdown-compatible output, exactly like the CSV path. */
object FixedWidth {

  /** Read fixed-width files under SREH: malformed records (bad length
    * or failed conversion) land in the reject log, capped by
    * `rejectLimit`. */
  def read(spark: SparkSession, paths: Seq[String], schema: StructType,
           widths: Seq[(String, Int)], rejectLimit: Long,
           preserveBlanks: Boolean = false,
           nullValue: Option[String] = None,
           lineDelim: String = "\n"): Sreh.SrehResult = {
    require(widths.nonEmpty, "fixedwidth formatter needs column widths")
    val byName = schema.fields.map(f => f.name -> f).toMap
    widths.foreach { case (n, w) =>
      require(byName.contains(n), s"fixedwidth column '$n' not in table columns")
      require(w > 0, s"fixedwidth column '$n' needs a positive width, got $w")
    }
    require(widths.size == schema.size,
      s"fixedwidth formatter got ${widths.size} widths for ${schema.size} columns")
    val totSize = widths.map(_._2).sum
    val reader = spark.read
    if (lineDelim != "\n") reader.option("lineSep", lineDelim)
    val raw = reader.text(paths: _*)
      .withColumn("__source_file", input_file_name())
      .cache()
    var off = 1 // substring() is 1-based
    val built = widths.map { case (n, w) =>
      val slice = substring(col("value"), off, w)
      off += w
      val trimmed = if (preserveBlanks) slice else rtrim(slice, " ")
      // on-disk null is the token blank-padded to the field width
      val isNullTok = nullValue
        .map(nv => rtrim(slice, " ") === lit(nv)).getOrElse(lit(false))
      val nulled = when(isNullTok, lit(null)).otherwise(trimmed)
      val target = byName(n).dataType
      val casted =
        if (target == StringType) nulled.cast(target)
        else nulled.try_cast(target)
      // a non-string field that try_cast nulled without the null token
      // is a data error (int4in on a blank or garbled slice), exactly
      // the conversions the reference routes into SREH
      val failCheck =
        if (target == StringType) lit(false)
        else col(n).isNull && !isNullTok
      (casted.as(n), failCheck)
    }
    val convFail = built.map(_._2).reduce(_ || _)
    val parsed = raw.select(
      (built.map(_._1) :+ col("value") :+ col("__source_file")): _*)
    val bad = length(col("value")) =!= lit(totSize) || convFail
    val errorLog = parsed.where(bad)
      .select(col("value").as("record"), col("__source_file").as("source_file"))
    val rejected = errorLog.count()
    if (rejected > rejectLimit) {
      raw.unpersist()
      throw Sreh.RejectLimitExceeded(rejected, rejectLimit)
    }
    Sreh.SrehResult(
      parsed.where(!bad).drop("value", "__source_file"),
      rejected, errorLog)
  }

  /** fixedwidth_out: each value blank-padded to its field width (nulls
    * as the null token), one concatenated line per record. */
  def formatLines(df: DataFrame, widths: Seq[(String, Int)],
                  nullValue: Option[String] = None): DataFrame = {
    val cols = widths.map { case (n, w) =>
      val s = coalesce(col(n).cast(StringType), lit(nullValue.getOrElse("")))
      rpad(s, w, " ")
    }
    df.select(concat(cols: _*).as("value"))
  }
}
