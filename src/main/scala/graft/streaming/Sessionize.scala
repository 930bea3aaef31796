package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Custom-state sessionization over KeyValueGroupedDataset — the typed
  * grouped-state surface (mapGroups/flatMapGroupsWithState family) the
  * reference approximates with window-function gaps-and-islands SQL.
  * Semantics identical to session_window(ts, gap): sessions merge while
  * consecutive events are strictly less than `gap` apart; session end =
  * last event + gap. All arithmetic in microseconds (event timestamps
  * carry sub-millisecond precision).
  */
object Sessionize {

  case class Session(s_start: Instant, s_end: Instant,
                     user_id: Long, n_events: Long)

  private def micros(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  private def instant(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L)

  def byGroups(events: DataFrame, gapMinutes: Int): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    // flatMapSortedGroups = secondary sort: events arrive per-user in ts
    // order straight off the shuffle sort, so sessions stream in one pass
    // with O(1) state per key — a hot key (null/bot user) never
    // materializes its event list in executor memory.
    events.select(col("user_id"), col("ts"))
      .as[(Long, Instant)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ts")) { (uid: Long, it: Iterator[(Long, Instant)]) =>
        new Iterator[Session] {
          private var pending: Session = _
          private var start = -1L
          private var prev = -1L
          private var n = 0L
          private def emit(): Session = {
            val s = Session(instant(start), instant(prev + gapUs), uid, n)
            start = -1L; n = 0L
            s
          }
          private def advance(): Unit = {
            while (pending == null && (it.hasNext || start >= 0)) {
              if (it.hasNext) {
                val t = micros(it.next()._2)
                if (start < 0) { start = t; prev = t; n = 1L }
                else if (t - prev >= gapUs) { pending = emit(); start = t; prev = t; n = 1L }
                else { prev = t; n += 1L }
              } else pending = emit() // flush the final open session
            }
          }
          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): Session = {
            advance(); val s = pending; pending = null; s
          }
        }
      }
  }
}
