package graft

import org.scalatest.funsuite.AnyFunSuite

/** Data-driven port of the reference's `qp_correlated_query.sql`
  * regress suite: 26 correlated-subquery shapes (CSQs in SELECT lists,
  * WHERE, HAVING, quantified and EXISTS forms, OR'd disjuncts, nested
  * correlation) run VERBATIM through the SQL front door over the
  * suite's own fixtures, compared as row multisets to the
  * tables pinned from `qp_correlated_query.out`. Excluded: DML
  * statements and tables they mutate mid-suite, the suite's later
  * ad-hoc tables, and Spark-unsupported correlation shapes
  * (level-skipping refs in nested EXISTS, row-valued scalar
  * subqueries, multi-column quantifiers, outer refs in subquery
  * GROUP BY) — each fails loudly rather than silently diverging. */
class CsqPortSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  override def afterAll(): Unit = {
    Seq("qp_csq_t1", "qp_csq_t2", "qp_csq_t3", "qp_csq_t4",
      "a", "b", "c", "d", "e").foreach(spark.catalog.dropTempView)
    Tables.invalidate()
  }

  private def fixtures(): Unit = {
    Seq((1, 2), (3, 4), (5, 6), (7, 8)).toDF("a", "b")
      .createOrReplaceTempView("qp_csq_t1")
    Seq((1, 1), (3, 9), (5, 25), (7, 49)).toDF("x", "y")
      .createOrReplaceTempView("qp_csq_t2")
    Seq((1, "one"), (3, "three"), (5, "five"), (7, "seven")).toDF("c", "d")
      .createOrReplaceTempView("qp_csq_t3")
    Seq((1, 2), (3, 4), (5, 6), (7, 8)).toDF("a", "b")
      .createOrReplaceTempView("qp_csq_t4")
    Seq((1, 1), (19, 5), (99, 62), (1, 1), (78, -1)).toDF("i", "j")
      .createOrReplaceTempView("a")
    Seq((1, 43), (88, 1), (-1, 62), (1, 1), (32, 5), (2, 7)).toDF("i", "j")
      .createOrReplaceTempView("b")
    Seq((1, 889), (288, 1), (-1, 625), (32, 65), (32, 62), (3, -1))
      .toDF("i", "j").createOrReplaceTempView("c")
    Seq((1, 1), (19, 5), (99, 62), (1, 1), (78, -1)).toDF("i", "j")
      .createOrReplaceTempView("d")
    Seq((1, 889), (288, 1), (-1, 625), (32, 65), (32, 62), (3, -1),
      (99, 7), (78, 62)).toDF("i", "j").createOrReplaceTempView("e")
  }

  private case class Vec(sql: String, rows: Seq[Seq[String]])

  private lazy val vectors: Seq[Vec] = {
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/csq_port_vectors.txt"),
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

  test("26 correlated-subquery regress queries match their pinned tables") {
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
