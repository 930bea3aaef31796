package graft.operators

import java.util.concurrent.ConcurrentHashMap

/** Prepared statements (reference `src/backend/commands/prepare.c`):
  * `PREPARE name [(argtypes)] AS stmt`, `EXECUTE name(args)`,
  * `DEALLOCATE [PREPARE] name|ALL`. Spark-native: the statement text
  * is stored verbatim; EXECUTE substitutes `$n` parameters textually
  * OUTSIDE string literals (the same literal-aware pass CREATE
  * FUNCTION bodies use) and hands the result back to the statement
  * router — so a prepared SELECT, INSERT, UPDATE, or COPY all route to
  * their own subsystems. The PREPARE arg-type list is accepted and
  * ignored: Spark infers/casts at analysis, the analog of PG's
  * parameter type resolution.
  */
object Prepared {

  private val stmts = new ConcurrentHashMap[String, String]()

  private val prepareRe =
    "(?is)^\\s*PREPARE\\s+(\\w+)\\s*(?:\\(([^)]*)\\))?\\s+AS\\s+(.+)$".r
  private val executeRe =
    "(?is)^\\s*EXECUTE\\s+(\\w+)\\s*(?:\\((.*)\\))?\\s*$".r
  private val deallocRe =
    "(?is)^\\s*DEALLOCATE\\s+(?:PREPARE\\s+)?(\\w+|ALL)\\s*$".r

  def prepare(stmt: String): Unit = {
    val m = prepareRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"cannot parse PREPARE: $stmt"))
    val prev = stmts.putIfAbsent(m.group(1).toLowerCase, m.group(3).trim)
    require(prev == null,
      s"prepared statement ${m.group(1)} already exists") // PG errors too
  }

  /** The SQL text an EXECUTE statement stands for, parameters
    * substituted — run it through the router. */
  def executeText(stmt: String): String = {
    val m = executeRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"cannot parse EXECUTE: $stmt"))
    val name = m.group(1).toLowerCase
    val body = Option(stmts.get(name)).getOrElse(
      throw new IllegalArgumentException(
        s"prepared statement ${m.group(1)} does not exist"))
    val args = Option(m.group(2)).map(GreengageDdl.splitTop)
      .getOrElse(Seq.empty).map(a => s"(${a.trim})")
    SqlFunctions.substitute(body, Seq.empty, args)
  }

  def deallocate(stmt: String): Unit = {
    val m = deallocRe.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"cannot parse DEALLOCATE: $stmt"))
    if (m.group(1).equalsIgnoreCase("all")) stmts.clear()
    else require(stmts.remove(m.group(1).toLowerCase) != null,
      s"prepared statement ${m.group(1)} does not exist")
  }
}
