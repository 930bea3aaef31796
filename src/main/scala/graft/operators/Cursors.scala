package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Cursor surface (reference `src/backend/commands/portalcmds.c` portals
  * and `gpcontrib/gp_parallel_retrieve_cursor/`): DECLARE a query, FETCH
  * it in bounded chunks, CLOSE it. Spark-native: the open cursor holds a
  * `toLocalIterator` over the query result, which materializes ONE
  * partition at a time on the driver — the bounded-prefetch analog of
  * the reference's retrieve-mode endpoints, so a 100 TB result can be
  * paged without ever collecting it.
  */
object Cursors {

  private final class Portal(val schema: StructType, val rows: Iterator[Row])

  private val open = new ConcurrentHashMap[String, Portal]()

  def declare(name: String, df: DataFrame): Unit = {
    import scala.jdk.CollectionConverters._
    // putIfAbsent: a duplicate DECLARE must fail WITHOUT destroying the
    // already-open portal (put-then-require would have replaced it and
    // leaked its iterator before throwing)
    val prev = open.putIfAbsent(name.toLowerCase,
      new Portal(df.schema, df.toLocalIterator().asScala))
    require(prev == null, s"cursor $name already open")
  }

  /** Next `n` rows (fewer at end-of-result, empty when exhausted). */
  def fetch(spark: SparkSession, name: String, n: Int): DataFrame = {
    val p = Option(open.get(name.toLowerCase)).getOrElse(
      throw new IllegalArgumentException(s"cursor $name is not open"))
    val out = new java.util.ArrayList[Row](math.min(n, 1024))
    var i = 0
    while (i < n && p.rows.hasNext) { out.add(p.rows.next()); i += 1 }
    spark.createDataFrame(out, p.schema)
  }

  def close(name: String): Unit =
    require(open.remove(name.toLowerCase) != null, s"cursor $name is not open")

  /** Session-reset hook (pg_regress runs each suite in a fresh session,
    * where no cursor survives): drop every open portal. */
  def closeAll(): Unit = open.clear()

  private val declareRe =
    ("(?is)^\\s*DECLARE\\s+(\\w+)\\s+(?:BINARY\\s+)?(?:INSENSITIVE\\s+)?" +
      "(?:NO\\s+SCROLL\\s+|SCROLL\\s+)?CURSOR\\s+" +
      "(?:WITH(?:OUT)?\\s+HOLD\\s+)?FOR\\s+(.*)$").r
  private val fetchRe =
    "(?is)^\\s*FETCH\\s+(?:FORWARD\\s+)?(\\d+|ALL)\\s+(?:FROM|IN)\\s+(\\w+)\\s*;?\\s*$".r
  private val moveRe =
    "(?is)^\\s*MOVE\\s+(?:FORWARD\\s+)?(\\d+|ALL)\\s+(?:FROM|IN)\\s+(\\w+)\\s*;?\\s*$".r
  private val closeRe = "(?is)^\\s*CLOSE\\s+(\\w+)\\s*;?\\s*$".r

  /** The PG statement surface: DECLARE c CURSOR FOR <q> / FETCH n FROM c
    * / MOVE n FROM c / CLOSE c. DECLARE, MOVE and CLOSE return an empty
    * frame; FETCH returns the chunk. Forward-only, like the reference's
    * parallel-retrieve cursors (portalcmds.c rejects backward MOVE on
    * no-scroll portals the same way). */
  def execute(spark: SparkSession, stmt: String): DataFrame = stmt match {
    case declareRe(name, query) =>
      declare(name, spark.sql(PgSql.rewrite(query.trim.stripSuffix(";"))))
      spark.emptyDataFrame
    case fetchRe(n, name) =>
      fetch(spark, name, if (n.equalsIgnoreCase("ALL")) Int.MaxValue else n.toInt)
    case moveRe(n, name) => // advance without materializing rows to the caller
      fetch(spark, name, if (n.equalsIgnoreCase("ALL")) Int.MaxValue else n.toInt)
      spark.emptyDataFrame
    case closeRe(name) =>
      close(name)
      spark.emptyDataFrame
    case other =>
      throw new IllegalArgumentException(s"not a cursor statement: $other")
  }
}
