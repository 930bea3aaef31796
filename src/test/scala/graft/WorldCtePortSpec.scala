package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Data-driven port of the reference's `qp_with_clause.sql` regress
  * suite — the World-database CTE battery: 49 deterministic queries
  * (CTEs feeding joins, aggregates, set ops and correlated subqueries
  * over city/country/countrylanguage) run VERBATIM through the SQL
  * front door, compared as row multisets to the expected tables
  * pinned from `qp_with_clause.out` (~3,000 rows). The fixture is the suite's own
  * World dataset (Statistics Finland sample data shipped inside the
  * reference's regress suite), loaded from the COPY blocks as TSV.
  * LIMIT queries are excluded — their row choice under ties is
  * planner-dependent. */
class WorldCtePortSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  override def afterAll(): Unit = {
    Seq("city", "country", "countrylanguage")
      .foreach(spark.catalog.dropTempView)
    Tables.invalidate()
  }

  private def tsv(resource: String, schema: StructType,
                  nullToken: String): Unit = {
    val rows = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(resource), "UTF-8").getLines().toSeq
      .map { line =>
        val cells = line.split("\t", -1)
        org.apache.spark.sql.Row(cells.zipWithIndex.map { case (c, i) =>
          if (c == nullToken) null
          else schema(i).dataType match {
            case IntegerType => c.toInt
            case FloatType => c.toFloat
            case DoubleType => c.toDouble
            case d: DecimalType => new java.math.BigDecimal(c)
            case BooleanType => c == "t" || c == "true"
            case _ => c
          }
        }: _*)
      }
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
      .createOrReplaceTempView(
        resource.stripPrefix("/world_").stripSuffix(".tsv"))
  }

  private def fixtures(): Unit = {
    tsv("/world_city.tsv", StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("countrycode", StringType),
      StructField("district", StringType),
      StructField("population", IntegerType))), "\\N")
    tsv("/world_country.tsv", StructType(Seq(
      StructField("code", StringType), StructField("name", StringType),
      StructField("continent", StringType), StructField("region", StringType),
      StructField("surfacearea", FloatType),
      StructField("indepyear", IntegerType),
      StructField("population", IntegerType),
      StructField("lifeexpectancy", FloatType),
      StructField("gnp", DecimalType(10, 2)),
      StructField("gnpold", DecimalType(10, 2)),
      StructField("localname", StringType),
      StructField("governmentform", StringType),
      StructField("headofstate", StringType),
      StructField("capital", IntegerType),
      StructField("code2", StringType))), "")
    tsv("/world_countrylanguage.tsv", StructType(Seq(
      StructField("countrycode", StringType),
      StructField("language", StringType),
      StructField("isofficial", BooleanType),
      StructField("percentage", FloatType))), "\\N")
    // the suite's append-only / column-oriented copies hold the same
    // data — alias views (storage format is our engine's concern)
    for (base <- Seq("city", "country", "countrylanguage");
         suffix <- Seq("_ao", "_co"))
      spark.table(base).createOrReplaceTempView(base + suffix)
  }

  private case class Vec(sql: String, rows: Seq[Seq[String]])

  private lazy val vectors: Seq[Vec] = {
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/world_cte_port_vectors.txt"),
      "UTF-8").getLines().filterNot(_.startsWith("#")).mkString("\n")
    raw.split("===SQL\n").toSeq.filter(_.nonEmpty).map { block =>
      val Array(sql, rowsTxt) = block.split("\n===ROWS\n", 2)
      val body = rowsTxt.stripSuffix("\n")
      val rows =
        if (body.isEmpty && !rowsTxt.startsWith("\n")) Seq.empty
        else body.split("\n", -1).toSeq
          .map(_.split("\\|", -1).toSeq.map(_.trim))
      Vec(sql.trim, rows)
    }
  }

  private def norm(cell: String): String = {
    val c = cell.trim
    if (c.isEmpty) ""
    else if (c == "true") "t"
    else if (c == "false") "f"
    else if (c.matches("-?\\d+(\\.\\d+)?[eE][+-]?\\d+"))
      norm(new java.math.BigDecimal(c).toPlainString)
    else if (c.matches("-?\\d+\\.0+")) c.substring(0, c.indexOf('.'))
    else if (c.matches("-?\\d*\\.\\d{6,}")) {
      new java.math.BigDecimal(c)
        .round(new java.math.MathContext(9)).toString
    } else c
  }

  test("49 World-database CTE regress queries match their pinned tables") {
    fixtures()
    val failures = Seq.newBuilder[String]
    vectors.foreach { v =>
      val got: Seq[Seq[String]] =
        try Graft.execute(spark, v.sql).get.collect().toSeq.map(r =>
          (0 until r.length).map(i =>
            if (r.isNullAt(i)) ""
            else norm(r.get(i).toString)).toSeq)
        catch {
          case e: Exception =>
            failures += s"EXEC FAIL: ${v.sql.replaceAll("\\s+", " ").take(120)}\n  ${e.getMessage.take(200)}"
            Seq.empty
        }
      if (got.nonEmpty || v.rows.nonEmpty) {
        val exp = v.rows.map(_.map(norm))
        val gm = got.groupBy(identity).view.mapValues(_.size).toMap
        val em = exp.groupBy(identity).view.mapValues(_.size).toMap
        if (gm != em)
          failures += s"MISMATCH: ${v.sql.replaceAll("\\s+", " ").take(120)}\n" +
            s"  missing=${em.keySet.diff(gm.keySet).take(2).mkString(";")}\n" +
            s"  extra=${gm.keySet.diff(em.keySet).take(2).mkString(";")}"
      }
    }
    val f = failures.result()
    assert(f.isEmpty, s"${f.size} of ${vectors.size} failed:\n" +
      f.take(8).mkString("\n"))
  }
}
