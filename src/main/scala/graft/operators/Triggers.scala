package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Row-level BEFORE triggers (reference `src/backend/commands/trigger.c`,
  * pl_exec.c trigger context): the subset the regress suites use — a
  * plpgsql function of straight-line `NEW.col = expr;` assignments
  * (optionally RAISE NOTICE) ending in RETURN NEW, attached with
  * `CREATE TRIGGER .. BEFORE INSERT [OR UPDATE] ON t FOR EACH ROW
  * EXECUTE PROCEDURE f()`.
  *
  * The Spark lowering keeps everything set-oriented: the trigger's
  * assignments become extra projection columns over the inserted /
  * updated row set (NEW.x reads the incoming row), so firing a trigger
  * adds ZERO extra passes — it fuses into the DML's own projection. */
object Triggers {

  // fname -> ordered (column, rhs-with-NEW.-prefixes) assignments
  private val fns = TrieMap[String, Seq[(String, String)]]()
  // table (lower) -> (trigger name, events, fname) in creation order
  private val tableTrigs =
    TrieMap[String, Vector[(String, Set[String], String)]]()

  private def key(t: String): String = t.replace("\"", "").toLowerCase

  def isTriggerFunctionDdl(sql: String): Boolean =
    "(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?FUNCTION\\b[\\s\\S]*?\\bRETURNS\\s+TRIGGER\\b".r
      .findFirstIn(sql).isDefined

  /** Register a RETURNS TRIGGER plpgsql function: parse its NEW.col
    * assignments (the only state a row trigger can change). */
  def createFunction(ddl: String): Unit = {
    val m = ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?FUNCTION\\s+" +
      "([\\w.\"]+)\\s*\\(\\s*\\)[\\s\\S]*?\\$\\$(.*)\\$\\$").r
      .findFirstMatchIn(ddl).getOrElse(throw new IllegalArgumentException(
        s"cannot parse trigger function: $ddl"))
    val name = m.group(1).replace("\"", "").toLowerCase
    val body = m.group(2)
    require("(?is)\\bRETURN\\s+NEW\\b".r.findFirstIn(body).isDefined,
      s"trigger function must RETURN NEW (row-skip/OLD forms unsupported): $name")
    val assigns = "(?i)NEW\\s*\\.\\s*(\\w+)\\s*:?=\\s*([^;]+);".r
      .findAllMatchIn(body)
      .map(am => (am.group(1).toLowerCase, am.group(2).trim)).toSeq
    // anything else in the body must be chatter (RAISE) or structure
    val residue = body
      .replaceAll("(?i)NEW\\s*\\.\\s*\\w+\\s*:?=\\s*[^;]+;", "")
      .replaceAll("(?is)\\bRAISE\\s+(NOTICE|WARNING|INFO)\\s+[^;]+;", "")
      .replaceAll("(?is)\\b(BEGIN|END|DECLARE)\\b;?", "")
      .replaceAll("(?is)\\bRETURN\\s+NEW\\s*;?", "").trim
    require(residue.isEmpty,
      s"unsupported trigger-function construct in $name: $residue")
    fns.put(name, assigns)
    ()
  }

  private val createTrigRe =
    ("(?is)^\\s*CREATE\\s+TRIGGER\\s+([\\w\"]+)\\s+(BEFORE|AFTER)\\s+" +
      "(INSERT|UPDATE|DELETE)(?:\\s+OR\\s+(INSERT|UPDATE|DELETE))?" +
      "(?:\\s+OR\\s+(INSERT|UPDATE|DELETE))?\\s+ON\\s+([\\w.\"]+)\\s+" +
      "FOR\\s+EACH\\s+ROW\\s+EXECUTE\\s+(?:PROCEDURE|FUNCTION)\\s+" +
      "([\\w.\"]+)\\s*\\(\\s*\\)\\s*;?\\s*$").r

  def createTrigger(ddl: String): Unit = {
    val m = createTrigRe.findFirstMatchIn(ddl).getOrElse(
      throw new IllegalArgumentException(s"cannot parse CREATE TRIGGER: $ddl"))
    require(m.group(2).equalsIgnoreCase("BEFORE"),
      "only BEFORE row triggers are supported (AFTER has no NEW to change)")
    val events = Seq(m.group(3), m.group(4), m.group(5))
      .filter(_ != null).map(_.toUpperCase).toSet
    require(!events.contains("DELETE"),
      "DELETE row triggers are not supported (nothing to assign)")
    val fname = m.group(7).replace("\"", "").toLowerCase
    require(fns.contains(fname), s"trigger function $fname is not defined")
    val tname = m.group(1).replace("\"", "").toLowerCase
    tableTrigs.updateWith(key(m.group(6))) {
      case Some(ts) => Some(ts.filterNot(_._1 == tname) :+
        (tname, events, fname))
      case None => Some(Vector((tname, events, fname)))
    }
    ()
  }

  def isCreateTrigger(sql: String): Boolean =
    "(?is)^\\s*CREATE\\s+TRIGGER\\b".r.findFirstIn(sql).isDefined

  def dropTrigger(name: String, table: String): Unit = {
    // drop only the NAMED trigger (trigger.c DropTrigger); others on
    // the same table keep firing
    val tname = name.replace("\"", "").toLowerCase
    tableTrigs.updateWith(key(table))(
      _.map(_.filterNot(_._1 == tname)).filter(_.nonEmpty))
    ()
  }

  def dropFunction(name: String): Unit = {
    fns.remove(name.replace("\"", "").toLowerCase); ()
  }

  def clearTable(table: String): Unit = {
    tableTrigs.remove(key(table)); ()
  }

  /** The merged (column → rhs) assignment list the table's BEFORE
    * triggers apply for `event` ("INSERT"/"UPDATE"), in firing order.
    * RHS text still carries `NEW.` prefixes. */
  def rowAssigns(table: String, event: String): Seq[(String, String)] =
    tableTrigs.getOrElse(key(table), Vector.empty)
      .filter(_._2.contains(event))
      .flatMap { case (_, _, f) => fns.getOrElse(f, Nil) }

  // INSERT re-entry guard (the rewritten INSERT targets the same table)
  private val firing = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  def hasInsertTrigger(table: String): Boolean =
    !firing.get() && rowAssigns(table, "INSERT").nonEmpty

  /** Fire BEFORE INSERT row triggers: shape the incoming rows to the
    * table's columns, apply the assignments as a projection, insert. */
  def routeInsert(spark: SparkSession, stmt: String,
                  exec: String => Unit): Unit = {
    val m = "(?is)^\\s*INSERT\\s+INTO\\s+([\\w.\"]+)\\s*(\\([^)]*\\))?\\s*(.*?);?\\s*$".r
      .findFirstMatchIn(stmt).getOrElse(
        throw new IllegalArgumentException(s"cannot parse INSERT: $stmt"))
    val table = m.group(1).replace("\"", "")
    val tgt = spark.table(table).schema
    val listed = Option(m.group(2)).map(cl => GreengageDdl.splitTop(
      cl.stripPrefix("(").stripSuffix(")")).map(_.replace("\"", "").trim))
      .getOrElse(tgt.fieldNames.toSeq)
    val body = PgIntDiv(spark, spark.sql(
      PgSql.rewrite(SqlFunctions.expand(m.group(3)))))
    require(body.columns.length == listed.length,
      s"INSERT has ${body.columns.length} expressions for ${listed.length} columns")
    val byListed = listed.map(_.toLowerCase).zip(body.columns).toMap
    import org.apache.spark.sql.functions.{col, expr, lit}
    var shaped = body.select(tgt.fields.toIndexedSeq.map { f =>
      byListed.get(f.name.toLowerCase)
        .map(c => col(s"`$c`"))
        .getOrElse(lit(null)).cast(f.dataType).as(f.name)
    }: _*)
    rowAssigns(table, "INSERT").foreach { case (c, rhs) =>
      shaped = shaped.withColumn(c, expr(PgSql.rewrite(
        rhs.replaceAll("(?i)\\bNEW\\s*\\.\\s*(\\w+)", "$1")))
        .cast(tgt(tgt.fieldIndex(
          tgt.fieldNames.find(_.equalsIgnoreCase(c)).get)).dataType))
    }
    val view = "__graft_trig_src"
    shaped.createOrReplaceTempView(view)
    firing.set(java.lang.Boolean.TRUE)
    try exec(s"INSERT INTO $table SELECT * FROM $view")
    finally {
      firing.set(java.lang.Boolean.FALSE)
      spark.catalog.dropTempView(view); ()
    }
  }
}
