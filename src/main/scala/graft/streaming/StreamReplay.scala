package graft.streaming

import org.apache.spark.sql.functions._
import graft.Registry._

/** B54 driver-visible streaming proof: a full chunked-file replay of the
  * events table through the streaming tumbling aggregation, run to
  * completion with Trigger.AvailableNow into the memory sink (complete
  * mode). Deterministic — complete mode's final table IS the batch
  * aggregation — so it shares the b48 twin's DuckDB oracle.
  */
object StreamReplay {

  /** One chunk dir per JVM (see b54's comment). */
  private lazy val chunkDir: String =
    java.nio.file.Files.createTempDirectory("graft_b54_chunks").toString

  private val b54 = entry(
    "b54_stream_replay",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS ws,
      |       event_type, count(*) AS n, round(sum(value), 4) AS total
      |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s, d) =>
    // unique dir per JVM (lazy): a FIXED path races against any concurrent
    // PROCESS running this query (the overwrite deletes parquet part-files
    // out from under the other run's stream), while per-invocation dirs
    // would accumulate full event-table copies across sequential runs
    val dir = StreamReplay.chunkDir
    StreamingOps.writeChunks(s, d, dir, n = 8)
    val agg = StreamingOps.tumbling(StreamingOps.readStream(s, dir))
    s.catalog.dropTempView("b54_replay") // idempotent re-runs
    StreamingOps.runToMemory(agg, "b54_replay", "complete")
      .orderBy("ws", "event_type")
  }

  val entries: Seq[Entry] = Seq(b54)
}
