package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Per-user cohort-attribution state for B121 — the streaming twin of
  * B118's first-touch × activity join. State is (cohortWeek, baseWeek,
  * seenMask): the week of the user's first event (the replay arrives
  * time-ordered, so the first event's week IS the min — the B120
  * in-order contract), the week the bitmask window starts at, and a
  * bitmask of window weeks already attributed. On the first event of
  * each new week the processor emits (user_id, cohort_week, week)
  * exactly once, so the batch tail's count per (cohort_week, week) is
  * the retention triangle with no distinct pass.
  *
  * State is three longs per user. Two modes:
  *
  *  - '''Strict (default, `horizonWeeks = None`)''': the window is pinned
  *    at week 0 and weeks outside [0, 64) fail loudly rather than alias —
  *    the b121 driver entry's posture, where the fixture spans 5 weeks
  *    and an out-of-range week means corrupt input, not old age.
  *  - '''Windowed TTL (`horizonWeeks = Some(h)`)''': the production
  *    posture (VERDICT r10 item 6). The 64-bit mask becomes a SLIDING
  *    window over the most recent 64 weeks; under the in-order contract
  *    a week that slides out can never recur, so sliding loses no
  *    dedup information for ANY horizon. Weeks at age `>= h` since the
  *    user's cohort week are dropped silently — the TTL semantics a
  *    retention metric wants (a 10-year-old cohort row is never read) —
  *    and out-of-order arrivals older than the window still fail loudly
  *    instead of double-emitting.
  */
class CohortProcessor(horizonWeeks: Option[Long] = None)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var state: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long, Long)](
      "cohort",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val weeks = rows.map(_._2).toSeq.sorted
    var (cohort, base, mask) = Option(state.get()).getOrElse((-1L, 0L, 0L))
    var out = List.empty[(Long, Long, Long)]
    weeks.foreach { w =>
      horizonWeeks match {
        case None =>
          require(0 <= w && w < 64, s"week $w outside the 64-week state horizon")
        case Some(_) =>
          require(w >= 0, s"week $w precedes the cohort anchor")
          require(w >= base,
            s"week $w arrived out of order, older than the 64-week window at $base")
          if (w >= base + 64) { // slide the window forward to cover w
            val shift = w - 63 - base
            mask = if (shift >= 64) 0L else mask >>> shift
            base = w - 63
          }
      }
      if (cohort < 0) cohort = w
      val withinHorizon = horizonWeeks.forall(h => w - cohort < h)
      val bit = w - base
      if (withinHorizon && (mask & (1L << bit)) == 0L) {
        mask |= 1L << bit
        out ::= (key, cohort, w)
      }
    }
    state.update((cohort, base, mask))
    out.reverseIterator
  }
}
