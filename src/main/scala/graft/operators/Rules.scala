package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** PG query rewrite rules (reference `src/backend/rewrite/rewriteHandler.c`,
  * gram.y RuleStmt) — the subset the regress suites exercise:
  *
  *  - `CREATE RULE r AS ON INSERT TO t [WHERE qual] DO INSTEAD
  *    INSERT INTO child (...) VALUES (new.c, ...)` — the classic
  *    pre-partitioning insert-routing idiom. An INSERT into `t`
  *    fires every qualifying rule's action over the inserted row
  *    set; rows matching NO qual fall through to `t` itself
  *    (rewriteHandler.c: qualified INSTEAD rules add the negated
  *    qual to the original query).
  *  - `CREATE RULE "_RETURN" AS ON SELECT TO t DO INSTEAD <select>`
  *    — PG converts the relation into a view of that select
  *    (DefineQueryRewrite's RelisBecomingView path).
  *
  * Routing is fully distributed: the incoming rows materialize once
  * as a temp view and each rule's action is a Spark INSERT..SELECT
  * over it — no driver-side row loop. */
object Rules {

  final case class InsertRule(
      name: String,
      qual: Option[String],    // WHERE text, `new.` refs intact
      action: Option[String],  // INSERT INTO ... VALUES/SELECT; None = DO NOTHING
      instead: Boolean)        // DO INSTEAD vs DO [ALSO] (PG default ALSO)

  // table (lowercase, unquoted) -> rules in creation order
  private val insertRules = TrieMap[String, Vector[InsertRule]]()

  private def key(t: String): String = t.replace("\"", "").toLowerCase

  private val createRe =
    ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?RULE\\s+(\"?[\\w]+\"?)\\s+AS\\s+" +
      "ON\\s+(SELECT|INSERT|UPDATE|DELETE)\\s+TO\\s+([\\w.\"]+)\\s*(.*?);?\\s*$").r

  def isCreateRule(sql: String): Boolean =
    "(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?RULE\\b".r
      .findFirstIn(sql).isDefined

  def create(spark: SparkSession, ddl: String): Unit = {
    val m = createRe.findFirstMatchIn(ddl).getOrElse(
      throw new IllegalArgumentException(s"cannot parse CREATE RULE: $ddl"))
    val name = m.group(1).replace("\"", "")
    val event = m.group(2).toUpperCase
    val table = m.group(3).replace("\"", "")
    val rest = m.group(4).trim
    event match {
      case "SELECT" =>
        // ON SELECT DO INSTEAD <select>: the relation becomes a view
        // of the select (PG requires the rule be named _RETURN)
        val sel = "(?is)^DO\\s+INSTEAD\\s+(SELECT\\b.*)$".r
          .findFirstMatchIn(rest).getOrElse(throw new IllegalArgumentException(
            s"ON SELECT rule must be DO INSTEAD SELECT: $ddl")).group(1)
        require(name == "_RETURN",
          s"ON SELECT rules must be named \"_RETURN\" (got $name)")
        val cols = spark.table(table).schema.fieldNames
        spark.sql(s"DROP TABLE IF EXISTS $table")
        val body = PgSql.rewrite(sel)
        spark.sql(s"CREATE OR REPLACE VIEW $table " +
          cols.map(c => s"`$c`").mkString("(", ", ", ")") + s" AS $body")
        ()
      case "INSERT" =>
        val qm = "(?is)^(?:WHERE\\s+(.*?)\\s+)?DO\\s+(?:(ALSO|INSTEAD)\\s+)?(.*)$".r
          .findFirstMatchIn(rest).getOrElse(throw new IllegalArgumentException(
            s"cannot parse rule action: $ddl"))
        val qual = Option(qm.group(1)).map(_.trim).filter(_.nonEmpty)
        // PG default when the keyword is absent is ALSO (gram.y RuleStmt)
        val instead = Option(qm.group(2)).exists(_.equalsIgnoreCase("INSTEAD"))
        val act0 = qm.group(3).trim
        val action =
          if (act0.equalsIgnoreCase("NOTHING")) None
          else if ("(?is)^INSERT\\b".r.findFirstIn(act0).isDefined) Some(act0)
          else throw new IllegalArgumentException(
            s"unsupported ON INSERT rule action (only INSERT/NOTHING): $act0")
        insertRules.updateWith(key(table)) {
          case Some(rs) => Some(rs.filterNot(_.name == name) :+
            InsertRule(name, qual, action, instead))
          case None => Some(Vector(InsertRule(name, qual, action, instead)))
        }
        ()
      case other => throw new IllegalArgumentException(
        s"unsupported rule event $other (only SELECT/INSERT): $ddl")
    }
  }

  // re-entrancy guard: the fall-through INSERT routeInsert issues
  // against the SAME table must not re-fire that table's rules —
  // scoped PER TABLE so a rule action inserting into a child that has
  // its own rules still fires them (PG rewrites recursively)
  private val firing = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  def hasInsertRules(table: String): Boolean =
    !firing.get().contains(key(table)) && insertRules.contains(key(table))

  /** DROP RULE name ON table / table drop cleanup. */
  def dropRule(name: String, table: String): Unit = {
    insertRules.updateWith(key(table))(
      _.map(_.filterNot(_.name == name.replace("\"", ""))).filter(_.nonEmpty))
    ()
  }

  def clearTable(table: String): Unit = {
    insertRules.remove(key(table)); ()
  }

  /** Fire the table's ON INSERT rules for an incoming INSERT. The
    * source rows land in a temp view shaped exactly like the target
    * table; each qualifying rule's action INSERTs from that view with
    * `new.c` → the view's column; non-matching rows fall through to
    * the target itself. `exec` re-enters the engine's statement
    * router so child INSERTs get the full projection machinery. */
  def routeInsert(spark: SparkSession, stmt: String,
                  exec: String => Unit): Unit = {
    val m = "(?is)^\\s*INSERT\\s+INTO\\s+([\\w.\"]+)\\s*(\\([^)]*\\))?\\s*(.*?);?\\s*$".r
      .findFirstMatchIn(stmt).getOrElse(
        throw new IllegalArgumentException(s"cannot parse INSERT: $stmt"))
    val table = m.group(1).replace("\"", "")
    val rules = insertRules.getOrElse(key(table), Vector.empty)
    val tgt = spark.table(table).schema
    val listed = Option(m.group(2)).map(cl => GreengageDdl.splitTop(
      cl.stripPrefix("(").stripSuffix(")")).map(_.replace("\"", "").trim))
      .getOrElse(tgt.fieldNames.toSeq)
    // source rows, projected+cast to the target's full column set
    // (unlisted columns are NULL, as PG's rewriter sees them)
    val body = PgIntDiv(spark, spark.sql(
      PgSql.rewrite(SqlFunctions.expand(m.group(3)))))
    require(body.columns.length == listed.length,
      s"INSERT has ${body.columns.length} expressions for ${listed.length} columns")
    val byListed = listed.map(_.toLowerCase).zip(body.columns).toMap
    import org.apache.spark.sql.functions.{col, expr, lit}
    val shaped = body.select(tgt.fields.toIndexedSeq.map { f =>
      byListed.get(f.name.toLowerCase)
        .map(c => col(s"`$c`"))
        .getOrElse(lit(null)).cast(f.dataType).as(f.name)
    }: _*)
    val view = "__graft_rule_src"
    shaped.createOrReplaceTempView(view)
    firing.get() += key(table)
    try {
      def deNew(s: String): String =
        s.replaceAll("(?i)\\bnew\\s*\\.\\s*(\\w+)", "$1")
      val quals = rules.map(_.qual.map(deNew))
      rules.zip(quals).foreach { case (r, q) =>
        r.action.foreach { act =>
          val cond = q.getOrElse("true")
          // the action is INSERT INTO child (...) VALUES (new.x, ...)
          // → INSERT INTO child (...) SELECT x, ... FROM src WHERE qual
          val am = ("(?is)^INSERT\\s+INTO\\s+([\\w.\"]+)\\s*(\\([^)]*\\))?" +
            "\\s*(?:VALUES\\s*\\((.*)\\)|(SELECT\\b.*))\\s*;?\\s*$").r
            .findFirstMatchIn(act).getOrElse(
              throw new IllegalArgumentException(
                s"cannot parse rule action INSERT: $act"))
          val childCols = Option(am.group(2)).map(c => s" $c").getOrElse("")
          val selectList = Option(am.group(3)) match {
            case Some(values) => deNew(values)
            case None => throw new IllegalArgumentException(
              s"rule action must be INSERT .. VALUES(new..): $act")
          }
          exec(s"INSERT INTO ${am.group(1)}$childCols " +
            s"SELECT $selectList FROM $view WHERE $cond")
        }
      }
      // rows no qualified INSTEAD rule claimed fall through to the
      // target; ALSO rules never claim — their action fires IN
      // ADDITION to the original INSERT (rewriteHandler.c: only
      // INSTEAD rules replace the original query, a qualified INSTEAD
      // rule adds its negated qual to it)
      val unqualifiedInstead = rules.exists(r => r.instead && r.qual.isEmpty)
      if (!unqualifiedInstead) {
        val claimed = rules.zip(quals).collect {
          case (r, Some(q)) if r.instead => q
        }
        val residue =
          if (claimed.isEmpty) "true"
          else claimed.map(c => s"NOT coalesce(($c), false)").mkString(" AND ")
        // the firing guard makes this a plain INSERT (no re-fire)
        exec(s"INSERT INTO $table SELECT * FROM $view WHERE $residue")
      }
    } finally {
      firing.get() -= key(table)
      spark.catalog.dropTempView(view); ()
    }
  }
}
