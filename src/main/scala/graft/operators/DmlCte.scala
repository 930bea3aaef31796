package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** PG data-modifying CTEs (gram.y common_table_expr; rewriteHandler.c
  * / nodeModifyTable for the wCTE execution rules):
  * `WITH x AS (INSERT/UPDATE/DELETE ... RETURNING ...) SELECT ...`.
  *
  * Each DML CTE runs through the router in order; its RETURNING rows
  * (materialized eagerly — PG runs the whole wCTE to completion)
  * become the CTE relation for the rest of the statement. PG's
  * same-snapshot rule says the main statement sees the PRE-DML image
  * of any table a DML CTE modifies, so those tables are checkpointed
  * before the DML runs and shadowed with the pre-image for the main
  * statement's execution (temp-view shadowing, dropped afterwards —
  * the returned DataFrame is already analyzed against the snapshot).
  * A DML CTE without RETURNING still executes but contributes no
  * relation (PG forbids referencing it).
  *
  * Scale note: the pre-image checkpoint is a full materialization of
  * the re-read table — the price of PG's MVCC snapshot without MVCC.
  * It is paid ONLY for the self-referential form (a wCTE modifying a
  * table the same statement re-reads); the common consume-the-
  * RETURNING-rows shape checkpoints nothing but the (small) RETURNING
  * set. */
object DmlCte {

  final case class Cte(name: String, cols: Seq[String], body: String)
  final case class Parsed(recursive: Boolean, ctes: Seq[Cte], main: String)

  private val dmlStart = "(?is)^\\s*(INSERT|UPDATE|DELETE)\\b.*".r.pattern

  def isDml(body: String): Boolean = dmlStart.matcher(body).matches()

  /** Parse the top-level CTE list of a WITH statement; None when the
    * text doesn't follow the name [(cols)] AS (body) grammar. */
  def parse(sql: String): Option[Parsed] = {
    val masked = PgSql.maskLiterals(sql)
    val head = "(?is)^\\s*WITH\\s+(RECURSIVE\\s+)?".r
      .findFirstMatchIn(masked).getOrElse(return None)
    val recursive = head.group(1) != null
    var i = head.end
    val ctes = Seq.newBuilder[Cte]
    val idRe = "[\\w$]+".r
    var done = false
    while (!done) {
      while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
      val id = idRe.findPrefixOf(masked.substring(i)).getOrElse(return None)
      val name = sql.substring(i, i + id.length)
      i += id.length
      while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
      var cols = Seq.empty[String]
      if (i < sql.length && sql.charAt(i) == '(') {
        val close = PgSql.matchingParen(masked, i)
        cols = sql.substring(i + 1, close).split(",").map(_.trim).toSeq
        i = close + 1
        while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
      }
      if (!masked.regionMatches(true, i, "AS", 0, 2)) return None
      i += 2
      while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
      if (i >= sql.length || sql.charAt(i) != '(') return None
      val close = PgSql.matchingParen(masked, i)
      ctes += Cte(name, cols, sql.substring(i + 1, close))
      i = close + 1
      while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
      if (i < sql.length && sql.charAt(i) == ',') i += 1
      else done = true
    }
    Some(Parsed(recursive, ctes.result(), sql.substring(i)))
  }

  def hasDml(sql: String): Boolean =
    parse(sql).exists(_.ctes.exists(c => isDml(c.body)))

  private def targetTable(body: String): Option[String] =
    "(?is)^\\s*(?:INSERT\\s+INTO|UPDATE|DELETE\\s+FROM)\\s+([\\w.\"]+)".r
      .findFirstMatchIn(body).map(_.group(1).replace("\"", ""))

  def run(spark: SparkSession, sql: String,
          router: (SparkSession, String) => Option[DataFrame])
      : Option[DataFrame] = {
    val p = parse(sql).getOrElse(
      throw new IllegalArgumentException(s"cannot parse WITH statement: $sql"))
    val (dml, plain) = p.ctes.partition(c => isDml(c.body))
    // tables the rest of the statement re-reads get a pre-DML snapshot
    val restText = (plain.map(_.body) :+ p.main).mkString(" ").toLowerCase
    val snapshots = dml.flatMap(c => targetTable(c.body)).distinct
      .filter(t => !t.contains(".") && // temp-view shadowing needs a bare name
        ("(?s).*\\b" + java.util.regex.Pattern.quote(t.toLowerCase) + "\\b.*")
          .r.pattern.matcher(restText).matches())
      .map(t => t -> spark.table(t).localCheckpoint(true))
    val registered = scala.collection.mutable.ListBuffer[String]()
    try {
      dml.foreach { c =>
        val res = router(spark, c.body)
        res.foreach { df =>
          // PG runs the wCTE to completion before readers see it
          val mat = df.localCheckpoint(true)
          val named = if (c.cols.nonEmpty) mat.toDF(c.cols: _*) else mat
          named.createOrReplaceTempView(c.name)
          registered += c.name
        }
      }
      snapshots.foreach { case (t, pre) =>
        pre.createOrReplaceTempView(t)
        registered += t
      }
      val mainSql =
        if (plain.isEmpty) p.main
        else "WITH " + (if (p.recursive) "RECURSIVE " else "") +
          plain.map(c => c.name +
            (if (c.cols.nonEmpty) c.cols.mkString("(", ", ", ")") else "") +
            " AS (" + c.body + ")").mkString(", ") + " " + p.main
      router(spark, mainSql)
    } finally {
      // the result is analyzed against the views; safe to unshadow
      registered.foreach(v => spark.catalog.dropTempView(v))
    }
  }
}
