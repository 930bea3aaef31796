package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal DataSource V2 batch SINK — the Spark-native form of the
  * reference's WRITABLE external tables (`CREATE WRITABLE EXTERNAL
  * TABLE ... LOCATION('gpfdist://...') FORMAT 'TEXT'`,
  * `src/backend/access/external/` write path): every partition streams
  * its rows as delimiter-separated text to its own file, in parallel,
  * with PG COPY's `\N` null token. Task commits are atomic via
  * temp-file rename; aborted tasks leave nothing behind.
  *
  * Usage: `df.write.format("graft.sources.ExtSink")
  *   .option("path", dir).option("delimiter", "|").save()`
  */
class ExtSink extends TableProvider {

  // write-only: Spark hands us the dataframe's schema
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft ExtSink is write-only (the readable side is SeqSource/CSV)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ExtSinkTable(schema,
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("ExtSink requires a 'path' option")),
      properties.getOrDefault("delimiter", "|"))
}

private class ExtSinkTable(writeSchema: StructType, path: String, delim: String)
  extends Table with SupportsWrite {

  override def name(): String = s"ext_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ExtWriteBuilder(info.schema(), path, delim)
}

private class ExtWriteBuilder(schema: StructType, path: String, delim: String)
  extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val dir = new File(path)
      if (doTruncate && dir.exists())
        dir.listFiles().foreach(_.delete())
      dir.mkdirs()
      new ExtBatchWrite(schema, path, delim)
    }
  }
}

private class ExtBatchWrite(schema: StructType, path: String, delim: String)
  extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ExtWriterFactory(schema, path, delim)

  // files were renamed into place at task commit; nothing to finalize
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case ExtCommit(f) => new File(f).delete()
      case _ =>
    }
}

private case class ExtCommit(file: String) extends WriterCommitMessage

private class ExtWriterFactory(schema: StructType, path: String, delim: String)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ExtDataWriter(schema, path, delim, partitionId, taskId)
}

private class ExtDataWriter(schema: StructType, path: String, delim: String,
                            partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val tmp = Paths.get(path, s".part-$partitionId-$taskId.tmp")
  private val out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)

  private def render(row: InternalRow, i: Int, dt: DataType): String =
    if (row.isNullAt(i)) "\\N" // PG COPY null token
    else dt match {
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case DoubleType => row.getDouble(i).toString
      case FloatType => row.getFloat(i).toString
      case BooleanType => if (row.getBoolean(i)) "t" else "f"
      case StringType => row.getUTF8String(i).toString
      case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toString
      case _ => throw new UnsupportedOperationException(
        s"ExtSink cannot render $dt")
    }

  override def write(row: InternalRow): Unit = {
    out.write(schema.fields.indices
      .map(i => render(row, i, schema.fields(i).dataType)).mkString(delim))
    out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val fin = Paths.get(path, s"part-$partitionId-$taskId.txt")
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
    ExtCommit(fin.toString)
  }

  override def abort(): Unit = { out.close(); Files.deleteIfExists(tmp) }

  override def close(): Unit = Files.deleteIfExists(tmp)
}
