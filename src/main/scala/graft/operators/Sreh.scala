package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Single-row error handling for external loads — the reference's
  * `LOG ERRORS SEGMENT REJECT LIMIT n` (`src/backend/parser/gram.y:5726`,
  * `src/backend/cdb/cdbsreh.c`): tolerate up to N malformed input rows,
  * keep the rest, fail the load when the limit is exceeded.
  *
  * Spark-native: CSV PERMISSIVE mode + a corrupt-record column; the
  * reject-limit check is a single count action over the cached parse
  * (the reference likewise counts rejects at runtime).
  */
object Sreh {

  final case class RejectLimitExceeded(rejected: Long, limit: Long)
    extends RuntimeException(
      s"segment reject limit reached: $rejected malformed rows > limit $limit")

  final case class SrehResult(good: DataFrame, rejected: Long, errorLog: DataFrame)

  private val logSchema = StructType(Nil)
    .add("record", StringType).add("source_file", StringType)

  /** LOG ERRORS variant: rejects are spooled to a durable JSON error
    * table (the reference persists them to an error table the user can
    * query later; `badRecordsPath` is a Databricks-runtime option, so
    * OSS-Spark-native we write the log ourselves). The read-back uses an
    * explicit schema: with zero rejects the log has no data files, and
    * schema inference over an empty JSON dir fails. */
  def readCsvLogged(spark: SparkSession, path: String, schema: StructType,
                    rejectLimit: Long, errorTablePath: String): SrehResult = {
    val res = readCsv(spark, path, schema, rejectLimit)
    res.errorLog.write.mode("overwrite").json(errorTablePath)
    res.copy(errorLog = spark.read.schema(logSchema).json(errorTablePath))
  }

  /** `SEGMENT REJECT LIMIT n PERCENT` (gram.y:5726 — the percent form):
    * the load fails when rejects exceed `pct` percent of the input rows
    * seen, instead of an absolute count. */
  def readCsvPercent(spark: SparkSession, path: String, schema: StructType,
                     pct: Double, header: Boolean = false,
                     delimiter: String = ",",
                     nullToken: String = ""): SrehResult = {
    require(pct > 0 && pct <= 100, s"reject percent out of range: $pct")
    val res = readCsv(spark, path, schema, rejectLimit = Long.MaxValue, header,
      delimiter, nullToken)
    val total = res.good.count() + res.rejected
    if (total > 0 && res.rejected * 100.0 > pct * total)
      throw RejectLimitExceeded(res.rejected, math.ceil(pct * total / 100.0).toLong)
    res
  }

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              rejectLimit: Long, header: Boolean = false,
              delimiter: String = ",", nullToken: String = ""): SrehResult =
    readCsvPaths(spark, Seq(path), schema, rejectLimit, header, delimiter,
      nullToken)

  /** Multi-location form (a `LOCATION('file://h/a', 'file://h/b')`
    * external table is one logical table over several files). */
  def readCsvPaths(spark: SparkSession, paths: Seq[String],
                   schema: StructType, rejectLimit: Long,
                   header: Boolean = false,
                   delimiter: String = ",",
                   nullToken: String = ""): SrehResult = {
    val corrupt = "_corrupt_record"
    val withCorrupt = schema.add(corrupt, StringType)
    val parsed = spark.read
      .option("mode", "PERMISSIVE")
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("nullValue", nullToken)
      .option("columnNameOfCorruptRecord", corrupt)
      .schema(withCorrupt)
      .csv(paths: _*)
      // input_file_name() must be captured during the file scan — after
      // cache() the lineage no longer carries a file source and it
      // evaluates to the empty string.
      .withColumn("__source_file", input_file_name())
      .cache() // required: corrupt-record column is only queryable post-materialization
    val errorLog = parsed.where(col(corrupt).isNotNull)
      .select(col(corrupt).as("record"), col("__source_file").as("source_file"))
    val rejected = errorLog.count()
    if (rejected > rejectLimit) {
      parsed.unpersist()
      throw RejectLimitExceeded(rejected, rejectLimit)
    }
    SrehResult(parsed.where(col(corrupt).isNull).drop(corrupt, "__source_file"),
      rejected, errorLog)
  }
}
