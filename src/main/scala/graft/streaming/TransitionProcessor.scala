package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** transformWithState processor for B214 (streamed event-transition
  * maintenance): state = the user's LAST event (ts_us, event_id, type);
  * each batch's rows are sorted by (ts_us, event_id) INSIDE the handler —
  * the key shuffle does not preserve file order, so within-batch order is
  * made a non-assumption rather than a contract — then folded against the
  * carried last event, emitting one (prev_type, next_type) adjacency per
  * row. Across batches the in-order replay contract holds by
  * construction: chunks are globally (ts, event_id)-sorted, so a user's
  * later events never arrive in an earlier micro-batch. */
class TransitionProcessor
    extends StatefulProcessor[Long, (Long, Long, Long, String), (String, String)] {

  @transient private var state: ValueState[(Long, Long, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long, String)](
      "last",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, String)],
      timerValues: TimerValues): Iterator[(String, String)] = {
    val sorted = rows.toArray.sortBy(r => (r._2, r._3))
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var last = Option(state.get())
    sorted.foreach { case (_, ts, id, t) =>
      last.foreach { case (_, _, pt) => out += ((pt, t)) }
      last = Some((ts, id, t))
    }
    last.foreach(state.update)
    out.iterator
  }
}
