package graft.operators

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** BEGIN / COMMIT / ROLLBACK emulation over Spark managed tables.
  *
  * The reference implements transactions with MVCC + distributed
  * 2PC (`src/backend/access/transam/xact.c`); Spark has neither, and
  * the engine otherwise commits every statement atomically via staged
  * swaps. What migrating SQL actually needs from `BEGIN .. ROLLBACK`
  * is TABLE-STATE restoration, so that is what this implements:
  *
  *  - `BEGIN` opens a transaction scope.
  *  - The first mutation of each table inside the scope snapshots the
  *    table's rows into a staging managed table (a distributed
  *    parquet copy — never a driver collect, so the cost at 100 TB is
  *    one extra write of the touched table, the same ballpark as the
  *    MVCC undo the reference pays).
  *  - `COMMIT`/`END` drops the snapshots.
  *  - `ROLLBACK`/`ABORT` restores every touched table (TRUNCATE +
  *    INSERT back — the table's metadata, distribution and sequences
  *    survive, matching PG where sequence advances are exempt from
  *    rollback, `nextval` docs) and drops tables created inside the
  *    scope.
  *
  * Deliberately out of scope (loud, not silent): SAVEPOINT /
  * sub-transactions, isolation between concurrent sessions (one
  * session per engine instance here), and rollback of metadata-only
  * ALTERs (row state is restored; a partition-boundary change made
  * and not undone inside the scope stays).
  */
object Txn {

  /** Per-table snapshot: PARTS, each a staged copy of one region
    * (pred = the partition-column predicate it covers) or of the
    * complement of every prior region (pred = None → `full`). Sound
    * because each part is written BEFORE its region is first mutated:
    * region parts hold pre-state, the complement holds untouched rows. */
  private final class TableSnap {
    val parts = mutable.Buffer.empty[(String, Option[String])]
    var full = false
  }

  private final class State {
    /** fully-qualified table -> its snapshot parts */
    val snapshots = mutable.LinkedHashMap.empty[String, TableSnap]
    /** tables created inside the txn (fully qualified) */
    val created = mutable.LinkedHashSet.empty[String]
    /** tables dropped inside the txn: fq name -> snapshot parts */
    val dropped = mutable.LinkedHashMap.empty[String, Seq[String]]
    var seq = 0
  }

  private var state: Option[State] = None

  def active: Boolean = state.isDefined

  /** Resolve a possibly-quoted, possibly-qualified name against the
    * session's current database to a stable `db.table` key. */
  private def fq(spark: SparkSession, name: String): String = {
    val clean = name.replace("\"", "").replace("`", "").toLowerCase
    if (clean.contains(".")) clean
    else s"${spark.catalog.currentDatabase}.$clean"
  }

  def begin(spark: SparkSession): Unit =
    // nested BEGIN: PG raises WARNING "there is already a transaction
    // in progress" and continues — same here, the outer scope wins
    if (state.isEmpty) state = Some(new State)

  /** Record that `table` is about to be mutated; snapshot on first
    * touch. No-op outside a transaction or for tables created inside
    * this transaction (their rollback is a DROP). */
  def touch(spark: SparkSession, table: String): Unit =
    touchRegion(spark, table, None)

  /** As [[touch]], but when `pred` names a partition-column-only
    * region (the mutating operator's own pruning), snapshot ONLY that
    * region — at 100 TB a one-partition DELETE then snapshots one
    * partition, not the table. A later un-pruned mutation upgrades by
    * snapshotting the complement of every recorded region. */
  def touchRegion(spark: SparkSession, table: String,
                  pred: Option[String]): Unit = state.foreach { st =>
    val key = fq(spark, table)
    if (st.created.contains(key) || !spark.catalog.tableExists(key)) return
    val ts = st.snapshots.getOrElseUpdate(key, new TableSnap)
    if (ts.full) return
    val priors = ts.parts.flatMap(_._2)
    def writePart(rows: org.apache.spark.sql.DataFrame,
                  p: Option[String]): Unit = {
      st.seq += 1
      val snap = s"default.__txn_snap_${st.seq}"
      spark.sql(s"DROP TABLE IF EXISTS $snap")
      // a killed prior session can leave the snapshot's directory on
      // disk with no catalog entry — clear it or CREATE trips on
      // LOCATION_ALREADY_EXISTS (same contract as the CREATE path)
      GreengageDdl.clearOrphanLocation(spark, snap)
      rows.write.format("parquet").saveAsTable(snap)
      ts.parts += ((snap, p))
    }
    pred match {
      case Some(p) if !priors.contains(p) =>
        val rows0 = spark.table(key).where(p)
        val rows = if (priors.isEmpty) rows0
          else rows0.where(priors.map(q => s"NOT coalesce(($q), false)")
            .mkString(" AND "))
        writePart(rows, Some(p))
      case Some(_) => // identical region already snapshotted
      case None =>
        val all = spark.table(key)
        writePart(if (priors.isEmpty) all
          else all.where(priors.map(q => s"NOT coalesce(($q), false)")
            .mkString(" AND ")), None)
        ts.full = true
    }
  }

  /** Active snapshot layout (table -> region predicates) — test hook. */
  private[graft] def snapshotRegions: Seq[(String, Option[String])] =
    state.toSeq.flatMap(_.snapshots.toSeq.flatMap { case (t, ts) =>
      ts.parts.map { case (_, p) => (t, p) }
    })

  /** Record a table created inside the transaction (CREATE/CTAS/
    * SELECT INTO): rollback drops it. */
  def recordCreated(spark: SparkSession, table: String): Unit =
    state.foreach { st =>
      val key = fq(spark, table)
      if (!st.snapshots.contains(key)) st.created += key
    }

  /** Record an impending DROP TABLE inside the transaction: the
    * snapshot (taken here if needed, FULL) is recreated on rollback. */
  def recordDropped(spark: SparkSession, table: String): Unit =
    state.foreach { st =>
      val key = fq(spark, table)
      if (st.created.contains(key)) st.created -= key
      else {
        touch(spark, table) // full: the whole table disappears
        st.snapshots.remove(key).foreach(ts =>
          st.dropped(key) = ts.parts.map(_._1).toSeq)
      }
    }

  def commit(spark: SparkSession): Unit = state.foreach { st =>
    (st.snapshots.values.flatMap(_.parts.map(_._1)) ++
      st.dropped.values.flatten)
      .foreach(s => spark.sql(s"DROP TABLE IF EXISTS $s"))
    state = None
  }

  def rollback(spark: SparkSession): Unit = state.foreach { st =>
    state = None // restoration must not re-trigger the touch hooks
    st.created.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    st.snapshots.foreach { case (t, ts) =>
      val regionPreds = ts.parts.flatMap(_._2)
      if (spark.catalog.tableExists(t)) {
        if (ts.full || regionPreds.isEmpty)
          spark.sql(s"TRUNCATE TABLE $t")
        else
          // region snapshots: clear just the touched regions —
          // untouched partitions never move
          Dml.deleteWhere(spark, t, org.apache.spark.sql.functions.expr(
            regionPreds.map(p => s"coalesce(($p), false)")
              .mkString(" OR ")))
        ts.parts.foreach { case (snap, _) =>
          spark.sql(s"INSERT INTO $t SELECT * FROM $snap")
        }
      } else if (ts.parts.nonEmpty) {
        // dropped via a path that bypassed recordDropped: recreate
        ts.parts.map(_._1).map(spark.table)
          .reduce(_.unionAll(_)).write.format("parquet").saveAsTable(t)
      }
      ts.parts.foreach(p => spark.sql(s"DROP TABLE IF EXISTS ${p._1}"))
    }
    st.dropped.foreach { case (t, snaps) =>
      if (!spark.catalog.tableExists(t) && snaps.nonEmpty)
        snaps.map(spark.table).reduce(_.unionAll(_))
          .write.format("parquet").saveAsTable(t)
      snaps.foreach(s => spark.sql(s"DROP TABLE IF EXISTS $s"))
    }
  }

  /** Mask single-quoted literals and dollar-quoted bodies so the DML
    * scan can't match verbs inside strings or function sources. */
  private def mask(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') {
        out += '\''; i += 1
        var open = true
        while (i < s.length && open) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < s.length && s.charAt(i + 1) == '\'') { out.append("  "); i += 2 }
            else { out += '\''; i += 1; open = false }
          } else { out += ' '; i += 1 }
        }
      } else if (c == '$') {
        val m = "^\\$[A-Za-z_0-9]*\\$".r.findFirstIn(s.substring(i))
        m match {
          case Some(tag) =>
            val close = s.indexOf(tag, i + tag.length)
            val end = if (close < 0) s.length else close + tag.length
            out.append(" " * (end - i)); i = end
          case None => out += c; i += 1
        }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  private val nameRe = "[\\w.\"]+"
  private val insertRe = s"(?is)\\bINSERT\\s+INTO\\s+($nameRe)".r
  private val deleteRe = s"(?is)\\bDELETE\\s+FROM\\s+(?:ONLY\\s+)?($nameRe)".r
  private val mergeRe = s"(?is)\\bMERGE\\s+INTO\\s+($nameRe)".r
  private val copyFromRe = s"(?is)^\\s*COPY\\s+($nameRe)\\s+FROM\\b".r
  private val updateRe = s"(?is)\\bUPDATE\\s+(?:ONLY\\s+)?($nameRe)\\s+(?:AS\\s+\\w+\\s+|\\w+\\s+)?SET\\b".r
  private val truncRe = "(?is)^\\s*TRUNCATE\\s+(?:TABLE\\s+)?(?:ONLY\\s+)?(.+?)(?:\\s+(?:RESTART|CONTINUE|CASCADE|RESTRICT)\\b.*)?;?\\s*$".r
  private val alterRe = s"(?is)^\\s*ALTER\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?(?:ONLY\\s+)?($nameRe)".r
  private val createRe = s"(?is)^\\s*CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?($nameRe)".r
  private val selIntoRe = s"(?is)\\bINTO\\s+(?:TABLE\\s+)?($nameRe)\\s+FROM\\b".r
  private val dropRe = "(?is)^\\s*DROP\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?(.+?);?\\s*$".r

  /** Inspect one statement inside an open transaction and snapshot /
    * record every table it is about to mutate. Over-approximation is
    * safe (an untouched snapshot restores identical rows); missing a
    * mutation is not, so the scan covers the whole statement text —
    * data-modifying CTEs included. */
  def interceptDml(spark: SparkSession, stmt: String): Unit = {
    val m = mask(stmt)
    createRe.findFirstMatchIn(m).foreach { c =>
      val name = c.group(1)
      if (!spark.catalog.tableExists(
          name.replace("\"", "").replace("`", "")))
        recordCreated(spark, name)
    }
    dropRe.findFirstMatchIn(m).foreach { d =>
      d.group(1).split(",").map(_.trim).filter(_.nonEmpty)
        .foreach(recordDropped(spark, _))
    }
    truncRe.findFirstMatchIn(m).foreach { tr =>
      tr.group(1).split(",").map(_.trim).filter(_.nonEmpty)
        .foreach(touch(spark, _))
    }
    // DELETE/UPDATE are NOT scanned here: every delete/update path
    // funnels through Dml.deleteWhere/updateWhere/updateFrom, whose
    // own touch hooks snapshot with the statement's partition pruning
    // (a region copy instead of the whole table)
    (insertRe.findAllMatchIn(m) ++
      mergeRe.findAllMatchIn(m) ++ copyFromRe.findAllMatchIn(m) ++
      alterRe.findAllMatchIn(m))
      .foreach(mm => touch(spark, mm.group(1)))
    selIntoRe.findFirstMatchIn(m).foreach { mm =>
      if ("(?is)^\\s*SELECT\\b".r.findFirstIn(m).isDefined &&
          !spark.catalog.tableExists(
            mm.group(1).replace("\"", "").replace("`", "")))
        recordCreated(spark, mm.group(1))
    }
  }

  /** Abandon any open scope without restoring (test-harness reset). */
  def reset(spark: SparkSession): Unit = state.foreach { st =>
    (st.snapshots.values.flatMap(_.parts.map(_._1)) ++
      st.dropped.values.flatten)
      .foreach(s => try spark.sql(s"DROP TABLE IF EXISTS $s")
               catch { case _: Exception => () })
    state = None
  }
}
