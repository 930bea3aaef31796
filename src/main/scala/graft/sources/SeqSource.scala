package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSource V2 batch source — the Spark-native form of the
  * reference's custom external-table protocols (`access/external/url.c:37`
  * dispatch to `execute:`/custom protocol handlers; `contrib/extprotocol`).
  *
  * Produces a deterministic sequence table
  * `(id BIGINT, val DOUBLE, tag STRING)` for `id in [start, end)`, split
  * into `partitions` input splits (each reader generates its slice
  * independently — the gpfdist-style segmented external read), with
  * column pruning pushed into the reader.
  *
  * Usage: `spark.read.format("graft.sources.SeqSource")
  *   .option("start", 0).option("end", 10000).option("partitions", 8).load()`
  */
class SeqSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SeqSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

private class SeqTable(start: Long, end: Long, partitions: Int)
  extends Table with SupportsRead {

  override def name(): String = s"seq($start,$end)"
  override def schema(): StructType = SeqSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(start, end, partitions)
}

private class SeqScanBuilder(start: Long, end: Long, partitions: Int)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var schema: StructType = SeqSource.fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    schema = requiredSchema

  override def build(): Scan = new SeqScan(start, end, partitions, schema)
}

private case class SeqRange(from: Long, until: Long) extends InputPartition

private class SeqScan(start: Long, end: Long, partitions: Int,
                      schema: StructType) extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, partitions)
    val span = math.max(0L, end - start)
    (0 until n).map { i =>
      SeqRange(start + span * i / n, start + span * (i + 1) / n)
    }.filter(r => r.until > r.from).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(schema)
}

private class SeqReaderFactory(schema: StructType)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SeqRange]
    val fields = schema.fieldNames
    new PartitionReader[InternalRow] {
      private var cur = r.from - 1
      override def next(): Boolean = { cur += 1; cur < r.until }
      override def get(): InternalRow = {
        val vals = fields.map {
          case "id" => cur
          case "val" => cur * 0.5
          case "tag" => UTF8String.fromString("t" + (cur % 3))
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
