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
    events.select(col("user_id"), col("ts"))
      .as[(Long, Instant)]
      .groupByKey(_._1)
      .flatMapGroups { (uid: Long, it: Iterator[(Long, Instant)]) =>
        val ts = it.map(t => micros(t._2)).toArray
        java.util.Arrays.sort(ts)
        val out = scala.collection.mutable.ArrayBuffer.empty[Session]
        var start = 0
        var i = 1
        while (i <= ts.length) {
          if (i == ts.length || ts(i) - ts(i - 1) >= gapUs) {
            out += Session(instant(ts(start)), instant(ts(i - 1) + gapUs),
              uid, (i - start).toLong)
            start = i
          }
          i += 1
        }
        out.iterator
      }
  }
}
