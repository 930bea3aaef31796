package graft.sources

import java.net.{HttpURLConnection, URI}
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

/** gpfdist-style HTTP external tables — DataSource V2 batch source
  * streaming text lines from one or more HTTP endpoints, one request
  * per segment (reference `src/backend/access/external/url.c:37-47`
  * dispatching `gpfdist://`/`http://` LOCATION URLs to the curl
  * handler, `url_curl.c:1335-1336` advertising the requesting segment
  * via `X-GP-SEGMENT-ID` / `X-GP-SEGMENT-COUNT` request headers so the
  * gpfdist server can hand each segment its slice of the file).
  *
  * Spark mapping: each input partition is one segment. Partition `i`
  * GETs `urls(i % urls.length)` — segments round-robin over the
  * LOCATION list exactly as the reference assigns external URLs to
  * segments — sending `X-GRAFT-SEGMENT-ID: i` and
  * `X-GRAFT-SEGMENT-COUNT: n`. A protocol-aware server (gpfdist-like)
  * uses the headers to return a disjoint per-segment slice; a plain
  * file server ignores them, in which case `partitions` should equal
  * the URL count so each file is read exactly once (the reference has
  * the same rule: a plain `http://` LOCATION is read by one segment).
  *
  * The response body is STREAMED line-by-line — a row per line as it
  * arrives, never buffered whole — and a non-2xx status fails the
  * task. Scale posture: N segments = N concurrent HTTP streams, one
  * per executor-core, no driver involvement, no collect; the endpoint
  * must serve deterministic, re-runnable content (a retried task
  * re-issues its GET) — the reference imposes the same contract.
  *
  * Usage: `spark.read.format("graft.sources.WebSource")
  *   .option("urls", "http://h1:8080/f,http://h2:8080/f")
  *   .option("partitions", 4).load()` → `(segment INT, line STRING)`;
  * [[WebSource.readCsv]] layers the SREH reject-limit parse on top,
  * symmetric with [[ExecSource.readCsv]].
  */
class WebSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WebSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val urls = Option(properties.get("urls")).getOrElse(
      throw new IllegalArgumentException("WebSource requires a 'urls' option"))
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(urls.nonEmpty, "WebSource 'urls' option is empty")
    new WebTable(urls,
      Option(properties.get("partitions")).map(_.toInt).getOrElse(urls.length))
  }
}

object WebSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("segment", IntegerType, nullable = false),
    StructField("line", StringType, nullable = true)))

  /** Raw line stream of the endpoints across `partitions` segments. */
  def lines(spark: SparkSession, urls: Seq[String], partitions: Int): DataFrame =
    spark.read.format("graft.sources.WebSource")
      .option("urls", urls.mkString(","))
      .option("partitions", partitions.toString)
      .load()

  /** The full `LOCATION('gpfdist://...') FORMAT 'TEXT' SEGMENT REJECT
    * LIMIT n` surface: parse each line as delimited text (PERMISSIVE,
    * corrupt lines spooled to the error log) and fail the load past
    * the reject limit — the same contract as [[Sreh.readCsv]]. */
  def readCsv(spark: SparkSession, urls: Seq[String], schema: StructType,
              partitions: Int, rejectLimit: Long,
              delimiter: String = "|"): Sreh.SrehResult = {
    val corrupt = "_corrupt_record"
    val withCorrupt = schema.add(corrupt, StringType)
    val parsed = lines(spark, urls, partitions)
      .select(col("segment"), from_csv(col("line"), withCorrupt,
        Map("sep" -> delimiter, "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corrupt)).as("r"))
      .select(col("segment"), col("r.*"))
      .cache() // corrupt-record column queryable post-materialization;
               // also: never re-issue the GETs for the reject count
    val errorLog = parsed.where(col(corrupt).isNotNull)
      .select(col(corrupt).as("record"),
        concat(lit("segment-"), col("segment")).as("source_file"))
    val rejected = errorLog.count()
    if (rejected > rejectLimit) {
      parsed.unpersist()
      throw Sreh.RejectLimitExceeded(rejected, rejectLimit)
    }
    Sreh.SrehResult(
      parsed.where(col(corrupt).isNull).drop(corrupt),
      rejected, errorLog)
  }
}

/** The WRITE side of gpfdist HTTP external tables — `CREATE WRITABLE
  * EXTERNAL TABLE ... LOCATION('gpfdist://...')` (reference
  * `url_curl.c` upload path: each segment POSTs its rows to the
  * server, which appends under a lock). Each Spark partition streams
  * its rows as delimited text in ONE chunked POST — N concurrent
  * uploads, nothing buffered whole, no driver involvement.
  *
  * Delivery contract: at-least-once under task retry (a re-run
  * partition POSTs again) — the same hazard the reference documents
  * for writable external tables, where an aborted INSERT can leave
  * partial rows at the target; make the consumer idempotent or key
  * the upload per attempt. */
object WebSink {

  def writeCsv(df: DataFrame, url: String, delimiter: String = "|"): Unit =
    writeCsv(df, Seq(url), delimiter)

  /** Multi-URL form: partitions round-robin over the LOCATION list,
    * the same URL assignment the read side uses. */
  def writeCsv(df: DataFrame, urls: Seq[String], delimiter: String): Unit = {
    val targets = urls.toArray
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val url = targets(
          org.apache.spark.TaskContext.getPartitionId() % targets.length)
        val conn = new URI(url).toURL.openConnection()
          .asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setChunkedStreamingMode(64 * 1024) // stream, never buffer
        conn.setConnectTimeout(30000)
        conn.setReadTimeout(120000)
        val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          conn.getOutputStream, StandardCharsets.UTF_8))
        while (rows.hasNext) {
          val r = rows.next()
          var i = 0
          while (i < r.length) {
            if (i > 0) out.write(delimiter)
            if (!r.isNullAt(i)) out.write(r.get(i).toString)
            i += 1
          }
          out.write('\n')
        }
        out.close()
        val rc = conn.getResponseCode
        if (rc < 200 || rc >= 300) throw new java.io.IOException(
          s"web: HTTP $rc uploading to $url")
        conn.disconnect()
      }
    }
  }
}

private class WebTable(urls: Array[String], partitions: Int)
  extends Table with SupportsRead {

  override def name(): String = s"web(${urls.mkString(",")})"
  override def schema(): StructType = WebSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WebScanBuilder(urls, partitions)
}

private class WebScanBuilder(urls: Array[String], partitions: Int)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var schema: StructType = WebSource.fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    schema = requiredSchema

  override def build(): Scan = new WebScan(urls, partitions, schema)
}

private case class WebSegment(id: Int, count: Int, url: String)
  extends InputPartition

private class WebScan(urls: Array[String], partitions: Int, schema: StructType)
  extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, partitions)
    (0 until n).map(i =>
      WebSegment(i, n, urls(i % urls.length)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WebReaderFactory(schema)
}

private class WebReaderFactory(schema: StructType)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val seg = partition.asInstanceOf[WebSegment]
    new PartitionReader[InternalRow] {
      private var conn: HttpURLConnection = _
      private var reader: java.io.BufferedReader = _
      private var line: String = _

      private def ensureStarted(): Unit = if (conn == null) {
        conn = new URI(seg.url).toURL.openConnection()
          .asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("GET")
        conn.setConnectTimeout(30000)
        conn.setReadTimeout(120000)
        // reference: url_curl.c:1335-1336 (X-GP-SEGMENT-ID/COUNT)
        conn.setRequestProperty("X-GRAFT-SEGMENT-ID", seg.id.toString)
        conn.setRequestProperty("X-GRAFT-SEGMENT-COUNT", seg.count.toString)
        val rc = conn.getResponseCode
        if (rc < 200 || rc >= 300) throw new java.io.IOException(
          s"web: HTTP $rc from ${seg.url} on segment ${seg.id}")
        reader = new java.io.BufferedReader(new java.io.InputStreamReader(
          conn.getInputStream, StandardCharsets.UTF_8))
      }

      override def next(): Boolean = {
        ensureStarted()
        line = reader.readLine()
        line != null
      }

      override def get(): InternalRow =
        InternalRow.fromSeq(schema.fieldNames.toIndexedSeq.map {
          case "segment" => seg.id: Any
          case "line" => UTF8String.fromString(line)
        })

      override def close(): Unit = if (conn != null) {
        if (reader != null) reader.close()
        conn.disconnect()
      }
    }
  }
}
