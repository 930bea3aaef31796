package graft

import org.scalatest.funsuite.AnyFunSuite

/** Literal-expected checks for §2.9 functions the DuckDB oracle can't
  * express (initcap/soundex are absent there) plus PG-parity error paths
  * and their try_* safe variants. One SQL round-trip per group.
  */
class FunctionSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def one(sql: String): org.apache.spark.sql.Row =
    spark.sql(s"SELECT $sql").head()

  test("oracle_compat.c family: initcap, soundex, translate, lpad edge") {
    val r = one(
      """initcap('hello wORld') AS a, soundex('Robert') AS b,
        |translate('12345', '143', 'ax') AS c,
        |lpad('7', 0, '0') AS d, lpad('abc', 5, '') AS e""".stripMargin)
    assert(r.getString(0) == "Hello World")
    assert(r.getString(1) == "R163")
    assert(r.getString(2) == "a2x5") // '4' deleted: no mapping
    assert(r.getString(3) == "")     // zero target length
    assert(r.getString(4) == "abc")  // empty pad keeps original prefix
  }

  test("formatting.c family: date_format / to_date / format_number") {
    val r = one(
      """date_format(TIMESTAMP '2020-03-04 05:06:07', 'yyyy-MM-dd HH:mm') AS a,
        |to_date('2020-03-04', 'yyyy-MM-dd') AS b,
        |format_number(1234567.891, 2) AS c,
        |date_format(TIMESTAMP '2020-03-04', 'EEEE') AS d""".stripMargin)
    assert(r.getString(0) == "2020-03-04 05:06")
    assert(r.getDate(1).toString == "2020-03-04")
    assert(r.getString(2) == "1,234,567.89")
    assert(r.getString(3) == "Wednesday")
  }

  test("PG-parity errors and try_* safe variants") {
    // strict paths error (ANSI = PG behavior)...
    assert(intercept[Exception](one("CAST('abc' AS INT)")).getMessage
      .contains("CAST_INVALID_INPUT"))
    // ...try_* variants give the NULL-on-failure escape hatch
    val r = one(
      """try_cast('abc' AS INT) AS a,
        |try_divide(1, 0) AS b,
        |try_add(9223372036854775807L, 1L) AS c,
        |try_to_timestamp('not a time') AS d""".stripMargin)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("sequence/generator family: sequence(), spark.range, explode") {
    val r = one("size(sequence(1, 10)) AS a, sequence(5, 1) AS b")
    assert(r.getInt(0) == 10)
    assert(r.getSeq[Int](1) == Seq(5, 4, 3, 2, 1)) // PG generate_series step -1
    assert(spark.range(3, 30, 3).count() == 9)
  }

  test("crypto/encode edges: empty input, binary round-trip") {
    val r = one(
      """md5(CAST('' AS BINARY)) AS a,
        |unbase64(base64(CAST('graft' AS BINARY))) AS b,
        |hex(CAST('AB' AS BINARY)) AS c""".stripMargin)
    assert(r.getString(0) == "d41d8cd98f00b204e9800998ecf8427e")
    assert(new String(r.getAs[Array[Byte]](1)) == "graft")
    assert(r.getString(2) == "4142")
  }
}
