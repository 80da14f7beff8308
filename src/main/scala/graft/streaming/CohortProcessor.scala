package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Per-user cohort-attribution state for B121 — the streaming twin of
  * B118's first-touch × activity join. State is (cohortWeek, seenMask):
  * the week of the user's first event (the replay arrives time-ordered,
  * so the first event's week IS the min — the B120 in-order contract)
  * and a bitmask of weeks already attributed. On the first event of each
  * new week the processor emits (user_id, cohort_week, week) exactly
  * once, so the batch tail's count per (cohort_week, week) is the
  * retention triangle with no distinct pass.
  *
  * State is two longs per user. The bitmask bounds the horizon at 64
  * weeks — the fixture spans 5; a production deployment widens it to a
  * TTL'd list keyed by retention horizon, which is exactly the bounded
  * horizon a retention metric needs anyway (a 10-year-old cohort row is
  * never read). Weeks ≥ 64 fail loudly rather than alias. */
class CohortProcessor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var state: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long)](
      "cohort",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val weeks = rows.map(_._2).toSeq.sorted
    var (cohort, mask) = Option(state.get()).getOrElse((-1L, 0L))
    var out = List.empty[(Long, Long, Long)]
    weeks.foreach { w =>
      require(0 <= w && w < 64, s"week $w outside the 64-week state horizon")
      if (cohort < 0) cohort = w
      if ((mask & (1L << w)) == 0L) {
        mask |= 1L << w
        out ::= (key, cohort, w)
      }
    }
    state.update((cohort, mask))
    out.reverseIterator
  }
}
