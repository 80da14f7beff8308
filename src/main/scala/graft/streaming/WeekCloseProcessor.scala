package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** B259 — WATERMARK-CLOSED CORPUS FOLD: the per-(user, week) purchase-
  * cents accumulator re-expressed with [[SessionProcessorBase]]'s
  * event-time-timer pattern instead of b248's complete-mode fold. Each
  * key arms ONE timer at its week's event-time close; when the watermark
  * passes it, the week emits its FINAL total and the state clears — so
  * live state is ∝ weeks still inside the watermark horizon, never ∝
  * (user, week) pairs seen (the complete-mode harness bound b248
  * documents). This is the production state story for any corpus-scale
  * streamed fold: the emit-on-close variant the r15 verdict asked for,
  * with the bound asserted on the state-store metrics (StreamingSpec).
  *
  * Correctness subtlety the timer absorbs: a week's sum can STRADDLE
  * micro-batches — the timer fires only when the WATERMARK (not the
  * batch boundary) proves no more purchases can arrive for that week, so
  * straddling accumulates into state exactly like b248's complete fold
  * and the emitted totals hash-match the same batch oracle (b216's SQL,
  * verbatim).
  *
  * State: one BIGINT per open (user, week). Timer: exactly one per key,
  * at the week-close instant — a CONSTANT per key, registered on first
  * touch (no re-arming, no stale-timer guard needed: the expiry cannot
  * move). Rows need no intra-batch ordering — integer addition commutes
  * (unlike [[SessionProcessorBase]]'s order-sensitive gap fold). */
class WeekCloseProcessor
    extends StatefulProcessor[(Long, Long), (Long, Long, Long, java.sql.Timestamp),
      (Long, Long, Long)] {

  // the b216 week algebra: anchor epoch µs of 2024-01-01, 1-week µs
  private val AnchorUs = 1704067200000000L
  private val WeekUs = 604800000000L

  @transient private var cents: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cents = getHandle.getValueState[Long]("cents", Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  /** Event-time ms at which week `wk` can no longer receive data. */
  private def closeMs(wk: Long): Long = (AnchorUs + (wk + 1) * WeekUs) / 1000 + 1

  override def handleInputRows(
      key: (Long, Long),
      rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val add = rows.map(_._3).sum
    if (cents.exists()) cents.update(cents.get() + add)
    else {
      cents.update(add)
      getHandle.registerTimer(closeMs(key._2))
    }
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: (Long, Long),
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long)] =
    if (cents.exists()) {
      val total = cents.get()
      cents.clear()
      Iterator((key._1, key._2, total))
    } else Iterator.empty
}
