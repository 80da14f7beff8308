package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** SURVEY §2B temporal joins: B15 (range/interval join) and B16 (as-of
  * join). Spark has no native range- or as-of-join operator, so both are
  * composed from built-ins with scale-safe plans (SURVEY §2C preference
  * order (a): compose existing ops):
  *
  *   - B15 rewrites the range predicate into an equi-join on coarse time
  *     buckets (the right side exploded to its bucket and the previous one)
  *     + a residual range filter. A naive `ts BETWEEN` join would plan as a
  *     broadcast-nested-loop — O(n²) scans at 100 TB; the bucketed form is
  *     a plain shuffled hash join whose fan-out is bounded by the window
  *     width / bucket ratio.
  *   - B16 folds both event streams into ONE window pass per key
  *     (last_value IGNORE NULLS over a union), i.e. a single shuffle on
  *     user_id — instead of join-then-deduplicate, which shuffles twice and
  *     explodes on skewed keys.
  */
object TemporalJoins {

  /** B15 — events self range join: for each event, count other events in
    * (ts, ts + 5 minutes]. Bucket width == window width (300s) so the right
    * side covers candidates with buckets {b, b-1}. */
  private val b15 = entry(
    "b15_join_range",
    """SELECT e1.event_id, count(e2.event_id) AS n_following
      |FROM events e1
      |LEFT JOIN events e2
      |  ON e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
      |  AND e2.event_id <> e1.event_id
      |GROUP BY e1.event_id ORDER BY e1.event_id""".stripMargin, bench = true) { (s, d) =>
    val e = Tables.events(s, d).select(col("event_id"), col("ts"))
    val bucket = expr("unix_micros(ts) div 300000000")
    val e1 = e.withColumn("b", bucket)
    val e2 = e.select(col("event_id").as("event_id2"), col("ts").as("ts2"))
      .withColumn("b", explode(array(
        expr("unix_micros(ts2) div 300000000"),
        expr("unix_micros(ts2) div 300000000") - 1)))
    e1.join(e2,
        e1("b") === e2("b") &&
        col("ts2") >= col("ts") &&
        col("ts2") <= col("ts") + expr("INTERVAL 5 MINUTES") &&
        col("event_id2") =!= col("event_id"),
        "left")
      .groupBy(col("event_id"))
      .agg(count(col("event_id2")).as("n_following"))
      .orderBy("event_id")
  }

  /** B15b — the SAME range join written NAIVELY (`BETWEEN`-style theta
    * join), relying on [[graft.plans.RangeJoinBucketing]] to rewrite the
    * would-be BroadcastNestedLoopJoin into the bucketed equi join at
    * optimization time. Same oracle as b15; RangeJoinRuleSpec asserts the
    * plan shape. Sessions built without GraftExtensions get the rule via
    * experimental.extraOptimizations (runtime-injectable, idempotent). */
  private val b15b = entry(
    "b15b_join_range_rule",
    """SELECT e1.event_id, count(e2.event_id) AS n_following
      |FROM events e1
      |LEFT JOIN events e2
      |  ON e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
      |  AND e2.event_id <> e1.event_id
      |GROUP BY e1.event_id ORDER BY e1.event_id""".stripMargin) { (s, d) =>
    graft.plans.RuleInstall.ensure(s, graft.plans.RangeJoinBucketing)
    val e = Tables.events(s, d).select(col("event_id"), col("ts"))
    val e2 = e.select(col("event_id").as("event_id2"), col("ts").as("ts2"))
    e.join(e2,
        col("ts2") >= col("ts") &&
        col("ts2") <= col("ts") + expr("INTERVAL 5 MINUTES") &&
        col("event_id2") =!= col("event_id"),
        "left")
      .groupBy(col("event_id"))
      .agg(count(col("event_id2")).as("n_following"))
      .orderBy("event_id")
  }

  /** B16 — as-of join: each purchase event matched to the latest prior view
    * event of the same user ("prior" = earlier in (ts, event_id) order; the
    * same tie rule is spelled out in the oracle, per SURVEY B16's warning
    * about engine-specific ASOF tie semantics). */
  private val b16 = entry(
    "b16_join_asof",
    """SELECT event_id, user_id,
      |       prev_view_id,
      |       epoch_us(ts) - epoch_us(prev_view_ts) AS gap_us
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |         last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
      |           OVER w AS prev_view_id,
      |         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
      |           OVER w AS prev_view_ts
      |  FROM events
      |  WHERE event_type IN ('view', 'purchase')
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |) t
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin, bench = true) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .select(
        col("event_id"), col("user_id"), col("ts"), col("event_type"),
        last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true)
          .over(w).as("prev_view_id"),
        last(when(col("event_type") === "view", col("ts")), ignoreNulls = true)
          .over(w).as("prev_view_ts"))
      .filter(col("event_type") === "purchase")
      // exact integer microseconds: a seconds double rounded to 4dp can tie
      // at the 5e-5 boundary, where Spark (shortest-decimal-repr HALF_UP)
      // and DuckDB (binary-value rounding) disagree — integers can't
      .select(
        col("event_id"), col("user_id"), col("prev_view_id"),
        (unix_micros(col("ts")) - unix_micros(col("prev_view_ts"))).as("gap_us"))
      .orderBy("event_id")
  }

  val entries: Seq[Entry] = Seq(b15, b15b, b16)
}
