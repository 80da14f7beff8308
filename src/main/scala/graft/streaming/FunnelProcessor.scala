package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Per-user funnel state machine for B120 — the streaming twin of B117's
  * declarative min-anchor chain. State is (step, anchorMicros): step k was
  * reached at the anchor instant; a step-(k+1) event advances the machine
  * iff its timestamp is STRICTLY after the anchor (the shared batch rule —
  * an event at exactly the anchor instant does not advance, so in-batch
  * sort order at equal timestamps cannot change the outcome). Rows within
  * a micro-batch are sorted by event time before folding (file replay
  * preserves no intra-group order — the SessionProcessorBase lesson);
  * across batches the replay arrives globally time-ordered, so the fold
  * sees each user's history in order and its first qualifying event IS
  * the batch `min`.
  *
  * Emits (user_id, step) whenever a user advances; the entry keeps the
  * furthest step per user and presents the standard 3-row funnel.
  * State is O(1) per user — two longs — the bounded-state contract every
  * 100 TB stateful op here follows. */
class FunnelProcessor
    extends StatefulProcessor[Long, (Long, Long, String), (Long, Long)] {

  private val StepTypes = Array("view", "click", "purchase")

  @transient private var state: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long)](
      "funnel",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, String)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val sorted = rows.toSeq.sortBy(_._2)
    var (step, anchor) = Option(state.get()).getOrElse((0L, Long.MinValue))
    var out = List.empty[(Long, Long)]
    sorted.foreach { case (_, tsm, tpe) =>
      if (step < StepTypes.length && tpe == StepTypes(step.toInt) &&
          (step == 0L || tsm > anchor)) {
        step += 1; anchor = tsm
        out ::= (key, step)
      }
    }
    state.update((step, anchor))
    out.reverseIterator
  }
}
