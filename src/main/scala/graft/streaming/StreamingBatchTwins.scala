package graft.streaming

import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** t2-checked batch twins of the streaming aggregations (SURVEY B48-B50
  * rule: "declare the batch twins as t2 queries"). The streaming runs must
  * converge to exactly these results over a chunked replay — asserted in
  * StreamingSpec; the DuckDB oracle hash-checks the batch semantics.
  */
object StreamingBatchTwins {

  /** B48 twin — tumbling 1h window ≡ group by date_trunc(hour). */
  private val b48 = entry(
    "b48_window_tumbling_batch",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS ws,
      |       event_type, count(*) AS n, round(sum(value), 4) AS total
      |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("ws"),
        col("event_type"), col("n"), col("total"))
      .orderBy("ws", "event_type")
  }

  /** B49 twin — sliding 1h/15min window: each event belongs to 4 windows
    * (epoch-aligned; DuckDB's time_bucket origin is 15-min-aligned too). */
  private val b49 = entry(
    "b49_window_sliding_batch",
    """SELECT strftime(wstart, '%Y-%m-%d %H:%M') AS ws,
      |       event_type, count(*) AS n, round(sum(value), 4) AS total
      |FROM (
      |  SELECT e.*, time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS wstart
      |  FROM events e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k) t
      |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin, bench = true) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("ws"),
        col("event_type"), col("n"), col("total"))
      .orderBy("ws", "event_type")
  }

  /** B50 twin — session windows (gap 30min per user). Spark side uses the
    * native session_window even in batch; the oracle is the classic
    * gaps-and-islands SQL (lag → new-session flag → running island id).
    * session_window.start == min(ts) of the session. */
  private val b50 = entry(
    "b50_window_session_batch",
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |islands AS (
      |  SELECT user_id, ts, value,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM flagged)
      |SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |       user_id, count(*) AS n, round(sum(value), 4) AS total
      |FROM islands GROUP BY user_id, sess
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_start"),
        col("user_id"), col("n"), col("total"))
      .orderBy("user_id", "session_start")
  }

  /** B55 twin — the stream-stream interval join (StreamingOps
    * .viewPurchaseJoin) as a batch equi+range join: purchases matched to
    * the same user's views within the preceding 4 hours. Gap emitted as
    * exact integer microseconds (the B16 rounding lesson). */
  private val b55 = entry(
    "b55_stream_join_batch",
    """SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
      |       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      |FROM events p JOIN events v
      |  ON p.user_id = v.user_id
      |  AND p.event_type = 'purchase' AND v.event_type = 'view'
      |  AND v.ts >= p.ts - INTERVAL 240 MINUTE AND v.ts <= p.ts
      |ORDER BY purchase_id, view_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    purchases.join(views,
        col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 240 MINUTES") &&
        col("v_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
      .orderBy("purchase_id", "view_id")
  }

  /** B80 twin — stream-static enrichment join + windowed cohort agg,
    * executed in batch through the SAME [[StreamingOps.cohortHourly]] the
    * streaming path runs (StreamingSpec pins stream ≡ this twin); the
    * oracle replays join + date_trunc in SQL. */
  private val b80 = entry(
    "b80_stream_static_batch",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS ws,
      |       cohort, count(*) AS n, round(sum(value), 4) AS total
      |FROM events
      |JOIN (SELECT DISTINCT user_id, user_id % 10 AS cohort FROM events) d
      |  USING (user_id)
      |GROUP BY 1, 2 ORDER BY ws, cohort""".stripMargin) { (s, d) =>
    StreamingOps.cohortHourly(Tables.events(s, d), StreamingOps.cohortDim(s, d))
      .orderBy("ws", "cohort")
  }

  /** B83 twin — the LEFT OUTER interval join, batch-executed through the
    * SAME [[StreamingOps.viewPurchaseJoinOuter]] the stream runs. The
    * oracle LEFT-joins filtered subqueries (the event_type predicates
    * must NOT sit in the outer join's ON clause — they would turn it
    * back into a semi-filtered inner match); NULLS FIRST matches Spark's
    * asc default on the nullable view_id. */
  private val b83 = entry(
    "b83_stream_join_outer_batch",
    """SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
      |       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id
      |  AND v.ts >= p.ts - INTERVAL 240 MINUTE AND v.ts <= p.ts
      |ORDER BY purchase_id, view_id NULLS FIRST""".stripMargin) { (s, d) =>
    StreamingOps.viewPurchaseJoinOuter(Tables.events(s, d))
      .orderBy("purchase_id", "view_id")
  }

  val entries: Seq[Entry] = Seq(b48, b49, b50, b55, b80, b83)
}
