package graft.operators

/** SQL front-door surface for the reference's COMPLEX builtin type
  * (`src/backend/utils/adt/complex_type.c`; the API-level operations
  * live in [[graft.functions.ComplexType]]). A complex value is a
  * `struct<re: double, im: double>` column; this object renders the
  * INPUT function (`complex_in` — ' 5 + 3i ', '9-10i', pure-real,
  * pure-imaginary, infinity/nan spellings) as ONE codegen SQL
  * expression template, used by the typed-literal rewrite and the
  * INSERT coercion path.
  */
object PgComplex {

  /** PG float8in over a SQL string expression: infinity / nan
    * spellings are case-insensitive (float.c float8in); everything
    * else is the ANSI cast (malformed input errors, like PG). */
  def pgFloatSql(x: String): String =
    s"""(CASE WHEN lower(trim(CAST($x AS STRING))) IN
       |        ('infinity', '+infinity', 'inf', '+inf')
       |      THEN CAST('Infinity' AS DOUBLE)
       |      WHEN lower(trim(CAST($x AS STRING))) IN ('-infinity', '-inf')
       |      THEN CAST('-Infinity' AS DOUBLE)
       |      WHEN lower(trim(CAST($x AS STRING))) IN ('nan', '+nan', '-nan')
       |      THEN CAST('NaN' AS DOUBLE)
       |      ELSE CAST($x AS DOUBLE) END)""".stripMargin.replaceAll("\\s+", " ")

  // complex_in's three shapes. The lookbehind keeps an exponent's
  // sign (1e+200) from being taken for the re/im separator; the im
  // token backtracks its [A-Za-z]+ so 'infinityi' leaves the final i.
  // leading \s*+ is POSSESSIVE: backtracking must not hand a space to
  // the lazy re group (' -6i ' would otherwise parse re=' ')
  private val bothRe =
    """(?i)^\\s*+(.+?)\\s*(?<![eE])([+-])\\s*([+-]?(?:[0-9.]+(?:[eE][+-]?[0-9]+)?|[A-Za-z]+))i\\s*$"""
  private val imagRe = """(?i)^\\s*(.+?)i\\s*$"""

  /** complex_in over a SQL string expression → named_struct(re, im). */
  def inExprSql(x: String): String = {
    val b = "'" + bothRe + "'"
    val i = "'" + imagRe + "'"
    val g1 = s"regexp_extract($x, $b, 1)"
    val sep = s"regexp_extract($x, $b, 2)"
    val g3 = s"regexp_extract($x, $b, 3)"
    val im1 = s"regexp_extract($x, $i, 1)"
    s"""(CASE
       | WHEN $x IS NULL THEN CAST(NULL AS STRUCT<re: DOUBLE, im: DOUBLE>)
       | WHEN $sep != '' THEN named_struct(
       |   're', ${pgFloatSql(g1)},
       |   'im', CASE WHEN $sep = '-' THEN -${pgFloatSql(g3)}
       |              ELSE ${pgFloatSql(g3)} END)
       | WHEN $x RLIKE $i THEN named_struct(
       |   're', CAST(0 AS DOUBLE), 'im', ${pgFloatSql(im1)})
       | ELSE named_struct(
       |   're', ${pgFloatSql(s"trim($x)")}, 'im', CAST(0 AS DOUBLE))
       |END)""".stripMargin.replaceAll("\\s+", " ")
  }

  /** Is this Spark type the complex struct? */
  def isComplexStruct(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case s: org.apache.spark.sql.types.StructType =>
        s.fieldNames.toSeq == Seq("re", "im") &&
          s.fields.forall(_.dataType ==
            org.apache.spark.sql.types.DoubleType)
      case _ => false
    }
}
