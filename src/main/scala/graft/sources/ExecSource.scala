package graft.sources

import java.nio.charset.StandardCharsets
import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Sreh

/** `execute:` external protocol — DataSource V2 batch source running a
  * shell command once per input partition and streaming its stdout as
  * text lines (reference `src/backend/access/external/url.c:37-47`
  * dispatching `execute:` URLs, `fileam.c:518` per-segment command
  * execution: `CREATE EXTERNAL TABLE ... EXECUTE 'cmd' ON ALL`).
  *
  * Each partition is one segment: the command runs on the executor that
  * owns the split with `GRAFT_SEGMENT_ID` set to the partition index
  * (the reference exports `GP_SEGMENT_ID` the same way), so a command
  * can produce its deterministic slice of the input. stdout is
  * STREAMED — a row is emitted per line as it arrives, never buffered
  * whole — and a nonzero exit status fails the task. stderr goes to the
  * executor log (never blocks the pipe).
  *
  * Scale posture: N segments = N concurrent processes, one per
  * executor-core, no driver involvement, no collect. Commands must be
  * deterministic and re-runnable (a retried or re-scanned task re-runs
  * its command) — the reference imposes the same contract on EXECUTE
  * tables.
  *
  * Usage: `spark.read.format("graft.sources.ExecSource")
  *   .option("command", "...").option("partitions", 4).load()`
  * → `(segment INT, line STRING)`; [[ExecSource.readCsv]] layers the
  * SREH reject-limit CSV parse on top.
  */
class ExecSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExecSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ExecTable(
      Option(properties.get("command")).getOrElse(
        throw new IllegalArgumentException("ExecSource requires a 'command' option")),
      properties.getOrDefault("partitions", "4").toInt)
}

object ExecSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("segment", IntegerType, nullable = false),
    StructField("line", StringType, nullable = true)))

  /** Raw line stream of `command` across `partitions` segments. */
  def lines(spark: SparkSession, command: String, partitions: Int): DataFrame =
    spark.read.format("graft.sources.ExecSource")
      .option("command", command)
      .option("partitions", partitions.toString)
      .load()

  /** The full `EXECUTE 'cmd' ... FORMAT 'TEXT' SEGMENT REJECT LIMIT n`
    * surface: parse each stdout line as delimited text (PERMISSIVE,
    * corrupt lines spooled to the error log) and fail the load past the
    * reject limit — the same contract as [[Sreh.readCsv]] over files. */
  def readCsv(spark: SparkSession, command: String, schema: StructType,
              partitions: Int, rejectLimit: Long,
              delimiter: String = "|",
              nullToken: String = ""): Sreh.SrehResult = {
    val corrupt = "_corrupt_record"
    // parse to STRINGS first: PG's per-type input functions (int4in
    // etc.) skip surrounding whitespace and the NULL token matches the
    // RAW field, so the cast step below is where text becomes typed —
    // a direct typed from_csv would misfile ' 20' as malformed
    val strSchema = StructType(schema.fields.map(f =>
      StructField(f.name, StringType)).toSeq).add(corrupt, StringType)
    val parsed = lines(spark, command, partitions)
      .select(col("segment"), col("line"), from_csv(col("line"), strSchema,
        Map("sep" -> delimiter, "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corrupt)).as("r"))
      .select(col("segment"), col("line"), col("r.*"))
    import org.apache.spark.sql.types.{StringType => ST}
    def nulled(f: org.apache.spark.sql.types.StructField) =
      when(col(f.name) === lit(nullToken), lit(null)).otherwise(col(f.name))
    def conv(f: org.apache.spark.sql.types.StructField) =
      if (f.dataType == ST) nulled(f)
      else trim(nulled(f)).try_cast(f.dataType)
    // a field that HAD text but cast to NULL is a malformed row (the
    // input function would have errored) — same reject accounting as
    // a structurally corrupt line
    val badCast = schema.fields.filter(_.dataType != ST).map(f =>
      nulled(f).isNotNull && conv(f).isNull)
      .foldLeft(lit(false))(_ || _)
    val flagged = parsed.select(
      (col("segment") +:
        schema.fields.toIndexedSeq.map(f => conv(f).as(f.name))) :+
        when(col(corrupt).isNotNull, col(corrupt))
          .otherwise(when(badCast, col("line"))).as(corrupt): _*)
      .cache() // corrupt-record column queryable post-materialization;
               // also: never re-run the commands for the reject count
    val errorLog = flagged.where(col(corrupt).isNotNull)
      .select(col(corrupt).as("record"),
        concat(lit("segment-"), col("segment")).as("source_file"))
    val rejected = errorLog.count()
    if (rejected > rejectLimit) {
      flagged.unpersist()
      throw Sreh.RejectLimitExceeded(rejected, rejectLimit)
    }
    Sreh.SrehResult(
      flagged.where(col(corrupt).isNull).drop(corrupt),
      rejected, errorLog)
  }
}

private class ExecTable(command: String, partitions: Int)
  extends Table with SupportsRead {

  override def name(): String = s"execute($command)"
  override def schema(): StructType = ExecSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ExecScanBuilder(command, partitions)
}

private class ExecScanBuilder(command: String, partitions: Int)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var schema: StructType = ExecSource.fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    schema = requiredSchema

  override def build(): Scan = new ExecScan(command, partitions, schema)
}

private case class ExecSegment(id: Int) extends InputPartition

private class ExecScan(command: String, partitions: Int, schema: StructType)
  extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    (0 until math.max(1, partitions)).map(ExecSegment(_): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ExecReaderFactory(schema, command)
}

private class ExecReaderFactory(schema: StructType, command: String)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val seg = partition.asInstanceOf[ExecSegment].id
    new PartitionReader[InternalRow] {
      private var proc: Process = _
      private var reader: java.io.BufferedReader = _
      private var line: String = _

      private def ensureStarted(): Unit = if (proc == null) {
        val pb = new ProcessBuilder("/bin/sh", "-c", command)
        pb.environment().put("GRAFT_SEGMENT_ID", seg.toString)
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        proc = pb.start()
        proc.getOutputStream.close() // no stdin: a reading command ends
        reader = new java.io.BufferedReader(new java.io.InputStreamReader(
          proc.getInputStream, StandardCharsets.UTF_8))
      }

      override def next(): Boolean = {
        ensureStarted()
        line = reader.readLine()
        if (line == null) {
          val rc = proc.waitFor()
          if (rc != 0) throw new java.io.IOException(
            s"execute: command exited $rc on segment $seg: $command")
          false
        } else true
      }

      override def get(): InternalRow =
        InternalRow.fromSeq(schema.fieldNames.toIndexedSeq.map {
          case "segment" => seg: Any
          case "line" => UTF8String.fromString(line)
        })

      override def close(): Unit = if (proc != null) {
        reader.close()
        proc.destroy()
      }
    }
  }
}
