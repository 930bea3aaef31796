package graft

import org.scalatest.funsuite.AnyFunSuite

/** Data-driven port of the reference's `olap_window.sql` regress
  * suite: 161 deterministic windowed queries (of the 442 result-
  * bearing statements) run VERBATIM through the engine's SQL front
  * door against the suite's own Macbeth fixture, each compared as a
  * row multiset to the expected table pinned from `olap_window.out`.
  *
  * Two determinism classes: (1) value-deterministic shapes — rank
  * families and aggregates over RANGE / whole-partition frames, where
  * peers receive identical values; (2) order-dependent functions
  * (row_number / lead / lag / first-last, ROWS frames) whose every
  * window orders by sale_ord's UNIQUE ord key, making the tie order
  * itself deterministic. Excluded: remaining tie-order-dependent
  * permutations (the reference's own `-- mvd` annotations mark them),
  * per-row variable frame bounds and lead/lag offsets plus
  * start-after-end frames (engine-documented rejections), window
  * corr/stddev (float print variance), and the suite's mid-file temp
  * tables. This sweep caught the to_char lone-zero divergence. */
class OlapWindowPortSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the Macbeth views shadow the same-named fixture views (customer!)
  // — drop them and let the next Tables.register re-create the originals
  override def afterAll(): Unit = {
    Seq("customer", "vendor", "product", "sale", "sale_ord")
      .foreach(spark.catalog.dropTempView)
    Tables.invalidate()
  }

  private def fixtures(): Unit = {
    Seq((1, "Macbeth", "Inverness"), (2, "Duncan", "Forres"),
      (3, "Lady Macbeth", "Inverness"), (4, "Witches, Inc", "Lonely Heath"))
      .toDF("cn", "cname", "cloc").createOrReplaceTempView("customer")
    Seq((10, "Witches, Inc", "Lonely Heath"), (20, "Lady Macbeth", "Inverness"),
      (30, "Duncan", "Forres"), (40, "Macbeth", "Inverness"),
      (50, "Macduff", "Fife"))
      .toDF("vn", "vname", "vloc").createOrReplaceTempView("vendor")
    Seq((100, "Sword", "Black"), (200, "Dream", "Black"),
      (300, "Castle", "Grey"), (400, "Justice", "Clear"),
      (500, "Donuts", "Plain"), (600, "Donuts", "Chocolate"),
      (700, "Hamburger", "Grey"), (800, "Fries", "Grey"))
      .toDF("pn", "pname", "pcolor").createOrReplaceTempView("product")
    Seq(
      (2, 40, 100, "1401-01-01", 1100, 2400.0),
      (1, 10, 200, "1401-03-01", 1, 0.0),
      (3, 40, 200, "1401-04-01", 1, 0.0),
      (1, 20, 100, "1401-05-01", 1, 0.0),
      (1, 30, 300, "1401-05-02", 1, 0.0),
      (1, 50, 400, "1401-06-01", 1, 0.0),
      (2, 50, 400, "1401-06-01", 1, 0.0),
      (1, 30, 500, "1401-06-01", 12, 5.0),
      (3, 30, 500, "1401-06-01", 12, 5.0),
      (3, 30, 600, "1401-06-01", 12, 5.0),
      (4, 40, 700, "1401-06-01", 1, 1.0),
      (4, 40, 800, "1401-06-01", 1, 1.0))
      .toDF("cn", "vn", "pn", "dts", "qty", "prc")
      .selectExpr("cn", "vn", "pn", "CAST(dts AS DATE) AS dt", "qty", "prc")
      .createOrReplaceTempView("sale")
    Seq(
      (1, 2, 40, 100, "1401-01-01", 1100, 2400.0),
      (2, 1, 10, 200, "1401-03-01", 1, 0.0),
      (3, 3, 40, 200, "1401-04-01", 1, 0.0),
      (4, 1, 20, 100, "1401-05-01", 1, 0.0),
      (5, 1, 30, 300, "1401-05-02", 1, 0.0),
      (6, 1, 50, 400, "1401-06-01", 1, 0.0),
      (7, 2, 50, 400, "1401-06-01", 1, 0.0),
      (8, 1, 30, 500, "1401-06-01", 12, 5.0),
      (9, 3, 30, 500, "1401-06-01", 12, 5.0),
      (10, 3, 30, 600, "1401-06-01", 12, 5.0),
      (11, 4, 40, 700, "1401-06-01", 1, 1.0),
      (12, 4, 40, 800, "1401-06-01", 1, 1.0))
      .toDF("ord", "cn", "vn", "pn", "dts", "qty", "prc")
      .selectExpr("ord", "cn", "vn", "pn", "CAST(dts AS DATE) AS dt",
        "qty", "prc")
      .createOrReplaceTempView("sale_ord")
  }

  private case class Vector(sql: String, rows: Seq[Seq[String]])

  private lazy val vectors: Seq[Vector] =
    loadVectors("/olap_window_port_vectors.txt")

  /** normalize a cell for comparison: NULL→"", integral floats drop
    * ".0", long floats round to 10 significant digits (PG float8
    * prints 15 digits, Spark 17 shortest-roundtrip). */
  private def norm(cell: String): String = {
    val c = cell.trim
    if (c.isEmpty) ""
    else if (c.matches("\\d{2}-\\d{2}-\\d{4}")) // reference datestyle MDY
      s"${c.substring(6)}-${c.substring(0, 2)}-${c.substring(3, 5)}"
    else if (c.matches("-?\\d+\\.0")) c.dropRight(2)
    else if (c.matches("-?\\d*\\.\\d{8,}([eE].*)?")) {
      new java.math.BigDecimal(c)
        .round(new java.math.MathContext(10)).toString
    } else c
  }

  test("144 value-deterministic olap_window regress queries match their pinned tables") {
    runVectors(vectors)
  }

  test("21 order-dependent window queries over the unique ord key match") {
    // row_number/lead/lag/first_value/last_value and ROWS frames ARE
    // deterministic when every window orders by sale_ord's unique ord
    runVectors(loadVectors("/olap_window_ord_vectors.txt"))
  }

  private def loadVectors(resource: String): Seq[Vector] = {
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(resource),
      "UTF-8").getLines().filterNot(_.startsWith("#")).mkString("\n")
    raw.split("===SQL\n").toSeq.filter(_.nonEmpty).map { block =>
      val Array(sql, rowsTxt) = block.split("\n===ROWS\n", 2)
      val body = rowsTxt.stripSuffix("\n")
      val rows =
        if (body.isEmpty && !rowsTxt.startsWith("\n")) Seq.empty
        else body.split("\n", -1).toSeq
          .map(_.split("\\|", -1).toSeq.map(_.trim))
      Vector(sql.trim, rows)
    }
  }

  private def runVectors(vs: Seq[Vector]): Unit = {
    fixtures()
    val failures = Seq.newBuilder[String]
    vs.foreach { v =>
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
        val (gm, em) = (got.groupBy(identity).view.mapValues(_.size).toMap,
          exp.groupBy(identity).view.mapValues(_.size).toMap)
        if (gm != em) {
          val miss = em.keySet.diff(gm.keySet).take(3)
          val extra = gm.keySet.diff(em.keySet).take(3)
          failures += s"MISMATCH: ${v.sql.replaceAll("\\s+", " ").take(120)}\n" +
            s"  missing=${miss.mkString(";")}\n  extra=${extra.mkString(";")}"
        }
      }
    }
    val f = failures.result()
    assert(f.isEmpty, s"${f.size} of ${vs.size} failed:\n" +
      f.take(8).mkString("\n"))
  }
}
