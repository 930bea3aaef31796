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

  /** Whole-word, literal-masked, case-insensitive name mention. */
  private def mentions(text: String, name: String): Boolean =
    ("(?s).*\\b" + java.util.regex.Pattern.quote(name.toLowerCase) + "\\b.*")
      .r.pattern.matcher(PgSql.maskLiterals(text).toLowerCase).matches()

  def run(spark: SparkSession, sql: String,
          router: (SparkSession, String) => Option[DataFrame])
      : Option[DataFrame] = {
    val p = parse(sql).getOrElse(
      throw new IllegalArgumentException(s"cannot parse WITH statement: $sql"))
    val (dml, plain) = p.ctes.partition(c => isDml(c.body))
    // Plain CTEs a DML body references — directly or through other
    // plain CTEs — must exist as relations BEFORE the DML body routes
    // standalone (otherwise the name is unresolved). Fixpoint over
    // name mentions; evaluation happens in CTE order below, so the
    // common `WITH s AS (SELECT ...), i AS (INSERT ... FROM s ...)`
    // shape materializes s against the pre-DML image.
    val needed = scala.collection.mutable.LinkedHashSet[String]()
    var changed = true
    while (changed) {
      changed = false
      val texts = dml.map(_.body) ++
        plain.filter(c => needed.contains(c.name)).map(_.body)
      plain.foreach { c =>
        if (!needed.contains(c.name) && texts.exists(t2 => mentions(t2, c.name))) {
          needed += c.name; changed = true
        }
      }
    }
    // Tables the rest of the statement re-reads get a pre-DML
    // snapshot (PG's same-snapshot rule). Targets normalize through
    // the PG default schema; a genuinely schema-qualified re-read
    // target cannot be shadowed by a temp view, so it fails LOUDLY
    // instead of silently showing the post-DML image.
    val restText = (plain.map(_.body) :+ p.main).mkString(" ")
    val targets = dml.flatMap(c => targetTable(c.body)).distinct
      .map(_.toLowerCase.stripPrefix("public."))
    def reread(t: String): Boolean = mentions(restText, t.split("\\.").last)
    targets.filter(t => t.contains(".") && reread(t)).foreach { t =>
      throw new UnsupportedOperationException(
        s"data-modifying CTE target '$t' is schema-qualified and re-read by " +
          "the same statement: the pre-DML snapshot cannot shadow a " +
          "qualified name — reference the table unqualified or split the " +
          "statement")
    }
    val snapshots = targets.filter(t => !t.contains(".") && reread(t))
      .map(t => t -> spark.table(t).localCheckpoint(true))
    val registered = scala.collection.mutable.ListBuffer[String]()
    val snapMap = snapshots.toMap
    try {
      // PG gives EVERY CTE the same pre-statement snapshot: the
      // re-read shadows register BEFORE the CTE loop so a plain CTE
      // positioned after a DML on the same table still reads the
      // pre-DML image; each DML body briefly unshadows its own target
      // (the write must hit the real table, not the snapshot view)
      snapshots.foreach { case (t, pre) =>
        pre.createOrReplaceTempView(t)
        registered += t
      }
      p.ctes.foreach { c =>
        if (isDml(c.body)) {
          val shadowed = targetTable(c.body).toSeq
            .map(_.toLowerCase.stripPrefix("public."))
            .filter(snapMap.contains)
          shadowed.foreach(t => spark.catalog.dropTempView(t))
          val res =
            try router(spark, c.body)
            finally shadowed.foreach(t =>
              snapMap(t).createOrReplaceTempView(t))
          res.foreach { df =>
            // PG runs the wCTE to completion before readers see it
            val mat = df.localCheckpoint(true)
            val named = if (c.cols.nonEmpty) mat.toDF(c.cols: _*) else mat
            named.createOrReplaceTempView(c.name)
            registered += c.name
          }
        } else if (needed.contains(c.name)) {
          val df = router(spark, c.body).getOrElse(
            throw new IllegalArgumentException(
              s"CTE ${c.name} body returned no relation: ${c.body}"))
          val mat = df.localCheckpoint(true)
          val named = if (c.cols.nonEmpty) mat.toDF(c.cols: _*) else mat
          named.createOrReplaceTempView(c.name)
          registered += c.name
        }
      }
      // plain CTEs no DML touches stay INLINED (no materialization
      // cost); materialized ones resolve through their temp views
      val inlined = plain.filterNot(c => needed.contains(c.name))
      val mainSql =
        if (inlined.isEmpty) p.main
        else "WITH " + (if (p.recursive) "RECURSIVE " else "") +
          inlined.map(c => c.name +
            (if (c.cols.nonEmpty) c.cols.mkString("(", ", ", ")") else "") +
            " AS (" + c.body + ")").mkString(", ") + " " + p.main
      router(spark, mainSql)
    } finally {
      // the result is analyzed against the views; safe to unshadow
      registered.foreach(v => spark.catalog.dropTempView(v))
    }
  }
}
