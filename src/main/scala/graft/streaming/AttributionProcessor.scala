package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** transformWithState processor for B224 (streamed last-touch
  * attribution): state = the user's most recent NON-purchase event type;
  * each purchase row emits (channel, cents) against the carried touch —
  * '(none)' before any touch exists. Batch rows sort by (ts_us, event_id)
  * inside the handler (the TransitionProcessor rule: the key shuffle does
  * not preserve file order); cross-batch in-order arrival holds by chunk
  * construction. */
class AttributionProcessor
    extends StatefulProcessor[Long, (Long, Long, Long, String, Long), (String, Long)] {

  @transient private var state: ValueState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[String](
      "lastTouch", Encoders.STRING,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, String, Long)],
      timerValues: TimerValues): Iterator[(String, Long)] = {
    val sorted = rows.toArray.sortBy(r => (r._2, r._3))
    val out = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    var touch = Option(state.get())
    sorted.foreach { case (_, _, _, t, cents) =>
      if (t == "purchase") out += ((touch.getOrElse("(none)"), cents))
      else touch = Some(t)
    }
    touch.foreach(state.update)
    out.iterator
  }
}
