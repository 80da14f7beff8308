package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** transformWithState processor with EVENT-TIME TIMERS (the B50 session
  * semantics re-expressed through user-managed state — SURVEY §7 hard
  * point 4's newest-API surface beyond [[BalanceProcessor]]'s ValueState):
  * per-user sessions close EITHER when a later event arrives past the
  * 30-minute gap, OR when the WATERMARK passes last_ts + gap and the
  * registered timer fires — which is the only way the final session of a
  * key can ever emit in a stream. StreamingSpec pins the emitted set
  * against the b50 batch twin (flush sentinel advances the watermark so
  * every real session closes); the integer-cents instance is
  * driver-visible as b88_stream_session_timers.
  *
  * State: one (session_start, last_ts, n, total) per user (micros; the
  * b50 micros-exact gap rule). Timers: exactly one per user, re-armed to
  * last_ts + gap + 1ms on every batch the user appears in (stale timers
  * deleted — a fired stale timer is additionally ignored by the expiry
  * guard, so double-emission is impossible). Rows within a batch are
  * sorted by event time before folding: a file-replayed micro-batch
  * preserves no intra-group order, and the fold is order-sensitive.
  *
  * Generic in the folded value type: [[SessionProcessor]] folds doubles
  * (spec path), [[SessionProcessorCents]] folds exact integer cents (the
  * b53 convention — what makes the t2 hash deterministic). */
abstract class SessionProcessorBase[V](valueEncoder: Encoder[V], plus: (V, V) => V)
    extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Long, V),
      (Long, Long, Long, V)] {

  private val GapMicros = 30L * 60 * 1000 * 1000

  @transient private var state: ValueState[(Long, Long, Long, V)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long, Long, V)](
      "session",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, valueEncoder),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  private def timerFor(lastTsMicros: Long): Long = lastTsMicros / 1000 + GapMicros / 1000 + 1

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, java.sql.Timestamp, Long, V)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, V)] = {
    val sorted = rows.toSeq.sortBy(_._3)
    var out = List.empty[(Long, Long, Long, V)]
    var cur = Option(state.get())
    sorted.foreach { case (_, _, tsm, v) =>
      cur match {
        case Some((start, last, n, total)) if tsm - last <= GapMicros =>
          cur = Some((start, tsm, n + 1, plus(total, v)))
        case Some(closed) =>
          out ::= (key, closed._1, closed._3, closed._4)
          cur = Some((tsm, tsm, 1L, v))
        case None =>
          cur = Some((tsm, tsm, 1L, v))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // one live timer per key: re-arm to the (possibly new) session end
      getHandle.listTimers().foreach(getHandle.deleteTimer(_))
      getHandle.registerTimer(timerFor(s._2))
    }
    out.reverseIterator
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, V)] = {
    Option(state.get()) match {
      // expiry guard: only the timer armed for the CURRENT session end may
      // close it — a stale timer (re-armed race) is ignored
      case Some((start, last, n, total))
          if expiredTimerInfo.getExpiryTimeInMs() >= timerFor(last) =>
        state.clear()
        Iterator((key, start, n, total))
      case _ => Iterator.empty
    }
  }
}

/** Double-folding instance (StreamingSpec equivalence path). */
class SessionProcessor
    extends SessionProcessorBase[Double](Encoders.scalaDouble, _ + _)

/** Exact-integer-cents instance (driver-visible t2 path, b88). */
class SessionProcessorCents
    extends SessionProcessorBase[Long](Encoders.scalaLong, _ + _)
