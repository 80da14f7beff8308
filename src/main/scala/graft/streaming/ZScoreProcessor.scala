package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** transformWithState processor for B234 (streamed rolling z-score
  * monitor): state = the user's last ≤ 8 cents values in arrival order (a
  * bounded ListState deque — the b228 frame, maintained incrementally).
  * Each arriving event is tested against the CARRIED baseline (the
  * preceding ≤ 8 values, current row excluded — b228's self-exclusion)
  * with the integer inequality (n·x − Σx)² > 4·(n·Σx² − Σx·Σx), n ≥ 4;
  * flagged rows emit (user, event_id, cents, n, dev2, thr). Batch rows
  * sort by (ts_us, event_id) in the handler (the TransitionProcessor
  * rule); cross-batch order holds by chunk construction. */
class ZScoreProcessor
    extends StatefulProcessor[Long, (Long, Long, Long, Long),
      (Long, Long, Long, Long, Long, Long)] {

  @transient private var window: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    window = getHandle.getListState[Long](
      "window", Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long, Long)] = {
    val sorted = rows.toArray.sortBy(r => (r._2, r._3))
    val deque = scala.collection.mutable.ArrayBuffer[Long](window.get().toSeq: _*)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long, Long)]()
    sorted.foreach { case (_, _, eid, x) =>
      val n = deque.length.toLong
      if (n >= 4) {
        val sx = deque.sum
        val sxx = deque.map(v => v * v).sum
        val dev2 = (n * x - sx) * (n * x - sx)
        val thr = 4 * (n * sxx - sx * sx)
        if (dev2 > thr) out += ((key, eid, x, n, dev2, thr))
      }
      deque += x
      if (deque.length > 8) deque.remove(0)
    }
    window.put(deque.toArray)
    out.iterator
  }
}
