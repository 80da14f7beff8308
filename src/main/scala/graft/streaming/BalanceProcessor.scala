package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** transformWithState processor for the per-user running balance (B53
  * native path): state = one (count, sum) pair per key in a typed
  * ValueState; each micro-batch emits the updated (user, n, balance). */
class BalanceProcessor
    extends StatefulProcessor[Long, (Long, Long, Double), (Long, Long, Double)] {

  @transient private var state: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Double)](
      "balance", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    var (n, bal) = Option(state.get()).getOrElse((0L, 0.0))
    rows.foreach { case (_, _, v) => n += 1; bal += v }
    state.update((n, bal))
    Iterator((key, n, math.rint(bal * 10000) / 10000))
  }
}
