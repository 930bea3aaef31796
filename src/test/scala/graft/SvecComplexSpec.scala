package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ComplexType, Svec}

/** Sparse-vector (gpcontrib/gp_sparse_vector) and complex-type
  * (utils/adt/complex_type.c) surfaces, plus the statistical-aggregate
  * builtin↔closed-form agreement backing q137.
  */
class SvecComplexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dense(vs: Double*) = array(vs.map(lit): _*)

  test("svec compress/decompress roundtrip incl. empty, all-zero, single-run") {
    val cases = Seq(
      Seq(0.0, 0.0, 0.0, 33.0, 0.0, 0.0, 12.0, 22.0),
      Seq(7.0),
      Seq(5.0, 5.0, 5.0, 5.0),
      Seq(0.0, 0.0, 0.0),
      Seq(1.0, 2.0, 3.0),
      Seq.empty[Double])
    cases.foreach { c =>
      val df = spark.range(1).select(
        Svec.decompress(Svec.compress(dense(c: _*))).as("rt"),
        size(Svec.compress(dense(c: _*))).as("runs"))
      val row = df.head()
      assert(row.getSeq[Double](0) == c, s"roundtrip of $c")
      // canonical RLE: runs = number of value changes
      val expectRuns =
        if (c.isEmpty) 0
        else 1 + c.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      assert(row.getInt(1) == expectRuns, s"run count of $c")
    }
  }

  test("svec run-direct measures equal dense computations") {
    val v = Seq(0.0, 0.0, 3.0, 3.0, -2.0, 0.0, 0.0, 0.0, 1.5)
    val sv = Svec.compress(dense(v: _*))
    val r = spark.range(1).select(
      Svec.dimension(sv).as("dim"),
      Svec.countNonzero(sv).as("nnz"),
      Svec.vecSum(sv).as("vsum"),
      Svec.l1norm(sv).as("l1"),
      Svec.l2norm(sv).as("l2")).head()
    assert(r.getInt(0) == v.length)
    assert(r.getInt(1) == v.count(_ != 0.0))
    assert(r.getDouble(2) == v.sum)
    assert(r.getDouble(3) == v.map(math.abs).sum)
    assert(math.abs(r.getDouble(4) - math.sqrt(v.map(x => x * x).sum)) < 1e-12)
  }

  test("svec scalar/elementwise ops and dot match dense arithmetic") {
    val a = Seq(0.0, 1.0, 5.0, 0.0)
    val b = Seq(4.0, 3.0, 2.0, 2.0)
    val sa = Svec.compress(dense(a: _*))
    val sb = Svec.compress(dense(b: _*))
    val r = spark.range(1).select(
      Svec.plusDense(sa, sb).as("plus"),
      Svec.minusDense(sa, sb).as("minus"),
      Svec.multDense(sa, sb).as("mult"),
      Svec.dot(sa, sb).as("dot"),
      Svec.decompress(Svec.scalarMult(sa, lit(2.0))).as("x2"),
      Svec.decompress(Svec.svecPow(sb, lit(2.0))).as("pow2"),
      Svec.svecEq(Svec.scalarMult(sa, lit(1.0)), sa).as("eq"),
      // ×0 leaves split runs; canonical form must still compare equal
      Svec.svecEq(Svec.scalarMult(sa, lit(0.0)),
        Svec.compress(dense(0.0, 0.0, 0.0, 0.0))).as("eq0")).head()
    assert(r.getSeq[Double](0) == a.zip(b).map(p => p._1 + p._2))
    assert(r.getSeq[Double](1) == a.zip(b).map(p => p._1 - p._2))
    assert(r.getSeq[Double](2) == a.zip(b).map(p => p._1 * p._2))
    assert(r.getDouble(3) == a.zip(b).map(p => p._1 * p._2).sum) // 3 + 10 = 13
    assert(r.getSeq[Double](4) == a.map(_ * 2.0))
    assert(r.getSeq[Double](5) == b.map(x => x * x))
    assert(r.getBoolean(6) && r.getBoolean(7))
  }

  test("extract_feature_histogram counts dictionary terms") {
    val words = split(lit("the cat and the dog and the bird"), " ")
    val r = spark.range(1).select(
      Svec.decompress(
        Svec.extractFeatureHistogram(Seq("the", "dog", "fish"), words)).as("h"))
      .head()
    assert(r.getSeq[Double](0) == Seq(3.0, 1.0, 0.0))
  }

  test("sum(svec) across rows: elementwise, distributed, dense result") {
    val df = Seq(
      ("g1", Seq(0.0, 1.0, 2.0)),
      ("g1", Seq(4.0, 0.0, 0.0)),
      ("g2", Seq(1.0, 1.0, 1.0))).toDF("g", "v")
      .select(col("g"), Svec.compress(col("v")).as("sv"))
    val out = Svec.sumVecRows(df, Seq("g"), col("sv"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Double](1) == Seq(4.0, 1.0, 2.0))
    assert(out(1).getSeq[Double](1) == Seq(1.0, 1.0, 1.0))
  }

  test("svec edge cases: empty boundaries column, dim mismatch, all-empty group") {
    // boundaries materialized as its own column must survive empty input
    val b = spark.range(1)
      .select(Svec.boundaries(array().cast("array<double>")).as("b")).head()
    assert(b.getSeq[Int](0).isEmpty)
    // dimension mismatch → true NULL result (not an array with null holes)
    val sv3 = Svec.compress(dense(1.0, 2.0, 3.0))
    val sv2 = Svec.compress(dense(1.0, 2.0))
    val mm = spark.range(1).select(
      Svec.plusDense(sv3, sv2).as("p"), Svec.multDense(sv3, sv2).as("m")).head()
    assert(mm.isNullAt(0) && mm.isNullAt(1))
    // a group whose vectors are all empty still yields a row (empty vec)
    val df = Seq(("g1", Seq(1.0, 2.0)), ("g2", Seq.empty[Double]))
      .toDF("g", "v").select(col("g"), Svec.compress(col("v")).as("sv"))
    val rows = Svec.sumVecRows(df, Seq("g"), col("sv")).orderBy("g").collect()
    assert(rows.length == 2)
    assert(rows(0).getSeq[Double](1) == Seq(1.0, 2.0))
    assert(rows(1).getSeq[Double](1).isEmpty)
  }

  test("complex identities: exp/ln/sqrt/arg within tolerance") {
    import ComplexType._
    val z = cplx(lit(3.0), lit(-4.0))
    val r = spark.range(1).select(
      re(cexp(cln(z))).as("er"), im(cexp(cln(z))).as("ei"),
      re(mul(csqrt(z), csqrt(z))).as("sr"), im(mul(csqrt(z), csqrt(z))).as("si"),
      mag(z).as("m"), magHypot(z).as("mh"),
      arg(cplx(lit(0.0), lit(1.0))).as("argI")).head()
    assert(math.abs(r.getDouble(0) - 3.0) < 1e-12) // exp(ln z) = z
    assert(math.abs(r.getDouble(1) + 4.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-12) // sqrt(z)^2 = z
    assert(math.abs(r.getDouble(3) + 4.0) < 1e-12)
    assert(r.getDouble(4) == 5.0 && r.getDouble(5) == 5.0) // 3-4-5 exact
    assert(math.abs(r.getDouble(6) - math.Pi / 2) < 1e-15) // arg(i) = π/2
  }

  test("complex div: (a*b)/b = a; division by conjugate-norm shape") {
    import ComplexType._
    val a = cplx(lit(2.5), lit(-1.5))
    val b = cplx(lit(-3.0), lit(0.5))
    val q = div(mul(a, b), b)
    val r = spark.range(1).select(re(q).as("r"), im(q).as("i")).head()
    assert(math.abs(r.getDouble(0) - 2.5) < 1e-12)
    assert(math.abs(r.getDouble(1) + 1.5) < 1e-12)
  }

  test("q137 closed forms agree with Spark builtin regr_*/covar_*/corr") {
    Tables.register(spark, TestSpark.sf0001)
    val builtin = spark.sql(
      """SELECT l_returnflag,
        |  regr_count(l_extendedprice, l_quantity) AS regr_count,
        |  regr_avgx(l_extendedprice, l_quantity) AS regr_avgx,
        |  regr_avgy(l_extendedprice, l_quantity) AS regr_avgy,
        |  regr_slope(l_extendedprice, l_quantity) AS regr_slope,
        |  regr_intercept(l_extendedprice, l_quantity) AS regr_intercept,
        |  regr_r2(l_extendedprice, l_quantity) AS regr_r2,
        |  covar_pop(l_quantity, l_extendedprice) AS covar_pop,
        |  covar_samp(l_quantity, l_extendedprice) AS covar_samp,
        |  corr(l_quantity, l_extendedprice) AS corr
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
      .collect().map(r => r.getString(0) -> r).toMap
    val closed = graft.queries.RelationalQueries
      .queries("q137_regr_family")(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(builtin.keySet == closed.keySet)
    for ((k, b) <- builtin) {
      val c = closed(k)
      def rel(x: Double, y: Double) =
        math.abs(x - y) / math.max(1.0, math.max(math.abs(x), math.abs(y)))
      assert(b.getLong(b.fieldIndex("regr_count")) ==
        c.getLong(c.fieldIndex("regr_count")))
      for (f <- Seq("regr_avgx", "regr_avgy", "regr_slope", "regr_intercept",
        "regr_r2", "covar_pop", "covar_samp", "corr"))
        assert(rel(b.getDouble(b.fieldIndex(f)), c.getDouble(c.fieldIndex(f))) < 1e-6,
          s"$k.$f: builtin=${b.getDouble(b.fieldIndex(f))} closed=${c.getDouble(c.fieldIndex(f))}")
    }
  }
}
