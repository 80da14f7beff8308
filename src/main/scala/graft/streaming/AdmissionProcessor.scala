package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-(source, shard) token-budget admission for B128 — the streaming
  * ARRIVAL-ORDER dual of B124's priority-order cap: documents stream in
  * doc_id order and each (source, shard) admits greedily until its budget
  * slice is spent. State is ONE long (tokens admitted so far); a doc is
  * admitted iff the slice's running total is still below the budget when
  * it arrives (the B97/B124 greedy-overshoot convention — the last
  * admitted doc may cross the line).
  *
  * Only ADMITTED tokens accumulate, which is still exactly the batch
  * running-sum rule: n_tok ≥ 1 makes the prefix strictly increasing, so
  * every doc before the first rejection is admitted (state = full
  * prefix), and from the first rejection on the state already sits at or
  * above the budget — both spellings reject everything after. The
  * emitted `start` is therefore the batch window's `sum - n_tok` for
  * every admitted row, and the t2 hash can pin the equivalence.
  *
  * Rows within a micro-batch are sorted by doc_id before folding (file
  * replay preserves no intra-group order — the SessionProcessorBase
  * lesson); across batches the replay arrives doc_id-ordered.
  *
  * Scale: budget SHARDING is the point — a per-source admission counter
  * is inherently sequential, so the budget splits across hash shards
  * (each a key with an independent B/shards slice) and admission
  * parallelizes to sources × shards keys with 8 bytes of state each. */
class AdmissionProcessor(budgetPerShard: Long)
    extends StatefulProcessor[(String, Long), (Long, String, Long, Long),
      (Long, String, Long, Long)] {

  @transient private var used: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    used = getHandle.getValueState[Long](
      "admitted", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: (String, Long),
      rows: Iterator[(Long, String, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, String, Long, Long)] = {
    val sorted = rows.toSeq.sortBy(_._1)
    var acc = if (used.exists()) used.get() else 0L
    var out = List.empty[(Long, String, Long, Long)]
    sorted.foreach { case (docId, src, nTok, _) =>
      if (acc < budgetPerShard) {
        out ::= ((docId, src, nTok, acc))
        acc += nTok
      }
    }
    used.update(acc)
    out.reverseIterator
  }
}
