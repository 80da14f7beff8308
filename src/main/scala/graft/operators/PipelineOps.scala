package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** Round-5 dataset-maintenance + event-shaping operators: row-level
  * sessionization (B67), snapshot diff/reconciliation (B68 — the inverse
  * of B62's merge), and incremental aggregate maintenance (B69).
  *
  * Shared posture: all three are single-shuffle plans (one window or one
  * join or one agg family on the natural key), exact-integer money (the
  * b22 lesson), and t2-deterministic (unique-key ORDER BY, timestamps
  * formatted, micros exact).
  */
object PipelineOps {

  /** B67 — sessionization: assign each EVENT its session id (gap rule:
    * >30 min of user inactivity starts a new session). B50 aggregates
    * sessions; this keeps row grain — the shape a training pipeline needs
    * to group interaction logs into conversation/episode examples.
    *
    * One shuffle on user_id; both window passes (lag flag + running sum)
    * share the same (user_id, ts, event_id) sort, so Spark plans a single
    * Exchange + single Sort. The session id is `user#k` with k dense per
    * user — stable under re-partitioning because it is a pure function of
    * the user's event history order, not of task layout. */
  private val b67 = entry(
    "b67_sessionize",
    """WITH flagged AS (
      |  SELECT event_id, user_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_id, user_id,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
      |       CAST(user_id AS VARCHAR) || '#' ||
      |       CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS VARCHAR)
      |         AS session_id
      |FROM flagged ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("new_s",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") > lag(col("ts"), 1).over(w) + expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        concat(col("user_id").cast("string"), lit("#"),
          sum(col("new_s"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("string")).as("session_id"))
      .orderBy("event_id")
  }

  /** The deterministic snapshot pair — shared with B62 via [[CdcSnapshots]]
    * so the merge/diff inverse relationship stays literally locked. */
  private val snapshotsSql =
    s"""base AS (
       |  ${CdcSnapshots.baseSql}),
       |curr AS (
       |  ${CdcSnapshots.currSql})""".stripMargin

  /** B68 — snapshot diff (reconciliation): given yesterday's and today's
    * keyed snapshots, emit what changed — added / removed / changed rows
    * with old and new payloads. The inverse of B62: merge applies a change
    * batch, diff recovers one; together they close the CDC loop (and diff
    * is the validation step that catches silent corruption between
    * refreshes of a 100 TB table).
    *
    * One full-outer join on the key; the payload comparison is null-safe
    * (IS DISTINCT FROM / <=>) so NULL payloads diff correctly. Equal rows
    * — the overwhelming majority at scale — are filtered out immediately
    * after the join, so only the change set survives to the sort. At 100 TB
    * the same bucketed-base argument as B62 removes the big side's
    * shuffle. */
  private val b68 = entry(
    "b68_table_diff",
    s"""WITH $snapshotsSql
       |SELECT coalesce(b.k, c.k) AS k,
       |       CASE WHEN b.k IS NULL THEN 'A'
       |            WHEN c.k IS NULL THEN 'R' ELSE 'C' END AS kind,
       |       b.status AS old_status, c.status AS new_status,
       |       b.cents AS old_cents, c.cents AS new_cents
       |FROM base b FULL OUTER JOIN curr c ON b.k = c.k
       |WHERE b.k IS NULL OR c.k IS NULL
       |   OR b.status IS DISTINCT FROM c.status
       |   OR b.cents IS DISTINCT FROM c.cents
       |ORDER BY k""".stripMargin) { (s, d) =>
    val base = CdcSnapshots.base(s, d)
    val curr = CdcSnapshots.curr(base)
    val b = base.select(col("k").as("b_k"), col("status").as("old_status"),
      col("cents").as("old_cents"))
    val c = curr.select(col("k").as("c_k"), col("status").as("new_status"),
      col("cents").as("new_cents"))
    b.join(c, col("b_k") === col("c_k"), "full_outer")
      .filter(col("b_k").isNull || col("c_k").isNull ||
        !(col("old_status") <=> col("new_status")) ||
        !(col("old_cents") <=> col("new_cents")))
      .select(
        coalesce(col("b_k"), col("c_k")).as("k"),
        when(col("b_k").isNull, "A").when(col("c_k").isNull, "R")
          .otherwise("C").as("kind"),
        col("old_status"), col("new_status"), col("old_cents"), col("new_cents"))
      .orderBy("k")
  }

  /** B69 — incremental aggregate maintenance: merge a stored per-group
    * aggregate STATE with a new batch's partial aggregate instead of
    * re-scanning history — how a 100 TB rolling metrics table actually
    * stays current (the base partial is READ from storage there; computing
    * it here stands in for that read). The t2 oracle is the full
    * recompute over base ∪ delta, so the hash proves merge ≡ recompute —
    * valid because (count, sum) states are commutative monoids, the same
    * algebra Spark's own partial aggregation relies on. Exact integer
    * cents: float sums would make merge order observable (the b22 trap).
    *
    * The merge shuffles |groups| state rows, not |delta| (map-side partial
    * combine on each side first) — at 100 TB the delta agg dominates and
    * history is never touched. */
  private val b69 = entry(
    "b69_agg_incremental",
    """WITH ev AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events)
      |SELECT event_type, count(*) AS n,
      |       CAST(sum(cents) AS BIGINT) AS cents
      |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    def partialState(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
    val baseState = partialState(ev.filter(col("event_id") % 10 =!= 0))
    val deltaState = partialState(ev.filter(col("event_id") % 10 === 0))
    baseState.unionByName(deltaState)
      .groupBy("event_type")
      .agg(sum(col("n")).as("n"), sum(col("cents")).cast("long").as("cents"))
      .orderBy("event_type")
  }

  /** B71 — time-series gap fill: regularize an irregular event stream onto
    * a dense per-user hourly grid, with both zero-fill and forward-fill
    * (last observation carried forward) columns — the resample step
    * feeding any windowed feature computation over activity logs.
    *
    * Plan: hourly buckets (one hash agg), per-user span (agg on the
    * bucketed — already small — relation), grid = explode_outer of
    * `sequence(lo, hi, 1 hour)` (OUTER: the generate-guard lesson — a
    * plain explode would duplicate the sequence expression into an
    * inferred filter; the span guarantees non-empty anyway), one left
    * join back, one window pass for the carry-forward. Rounding happens
    * IN the bucket agg so the window carries already-rounded doubles —
    * both engines then hash identical bytes (the b22 discipline).
    *
    * Scale: grid size is users × span-hours — output-proportional, never
    * input-proportional; the forward-fill window shuffles the grid once
    * on user_id. The user_id < 20 probe bound is the t2 fixture's output
    * cap, not an operator limit. */
  private val b71 = entry(
    "b71_timeseries_gapfill",
    """WITH b AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h, round(sum(value), 4) AS v
      |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
      |spans AS (SELECT user_id, min(h) AS lo, max(h) AS hi FROM b GROUP BY 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      |  FROM spans)
      |SELECT g.user_id, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS h_s,
      |       coalesce(b.v, 0) AS v,
      |       last_value(b.v IGNORE NULLS)
      |         OVER (PARTITION BY g.user_id ORDER BY g.h) AS v_ff
      |FROM grid g LEFT JOIN b ON b.user_id = g.user_id AND b.h = g.h
      |ORDER BY g.user_id, h_s""".stripMargin) { (s, d) =>
    val b = Tables.events(s, d).filter(col("user_id") < 20)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(sum(col("value")), 4).as("v"))
    val spans = b.groupBy("user_id").agg(min("h").as("lo"), max("h").as("hi"))
    val grid = spans.select(col("user_id"),
      explode_outer(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    val w = Window.partitionBy("user_id").orderBy("h")
    grid.join(b, Seq("user_id", "h"), "left")
      .select(col("user_id"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("h_s"),
        coalesce(col("v"), lit(0.0)).as("v"),
        last(col("v"), ignoreNulls = true).over(w).as("v_ff"))
      .orderBy("user_id", "h_s")
  }

  /** B73 — data-quality constraint checks (expectations): primary-key
    * uniqueness, referential integrity, null rate, and value-range rules
    * evaluated as one report — the validation gate every ingest runs
    * before publishing a snapshot (and the natural companion of B68's
    * diff: diff says WHAT changed, this says whether the result is sane).
    *
    * Each check is an independent aggregate over its table — map-side
    * combined, |violations| never materialized (only counted), checks
    * union into a fixed-height report. At 100 TB the checks share each
    * table's scan via one pass per table (Spark dedups the scan across
    * the union branches when the source is cached/bucketed; here each
    * check is already a single narrow-column scan). */
  private val b73 = entry(
    "b73_data_quality",
    """SELECT * FROM (
      |  SELECT 'events_pk_dup' AS check_name,
      |         CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS n_violations
      |  FROM (SELECT event_id, count(*) AS n FROM events
      |        GROUP BY 1 HAVING count(*) > 1)
      |  UNION ALL
      |  SELECT 'lineitem_fk_orphan',
      |         CAST(count(*) AS BIGINT)
      |  FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'lineitem_qty_range',
      |         CAST(count(*) AS BIGINT)
      |  FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
      |  UNION ALL
      |  SELECT 'orders_null_status',
      |         CAST(count(*) AS BIGINT)
      |  FROM orders WHERE o_orderstatus IS NULL)
      |ORDER BY check_name""".stripMargin) { (s, d) =>
    val events = Tables.events(s, d)
    val lineitem = Tables.lineitem(s, d)
    val orders = Tables.orders(s, d)
    val pkDup = events.groupBy("event_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum(col("n") - 1), lit(0)).cast("long").as("n_violations"))
      .select(lit("events_pk_dup").as("check_name"), col("n_violations"))
    val fkOrphan = lineitem.select("l_orderkey")
      .join(orders.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"))
      .select(lit("lineitem_fk_orphan").as("check_name"), col("n_violations"))
    val qtyRange = lineitem
      .filter(col("l_quantity") < 1 || col("l_quantity") > 50)
      .agg(count(lit(1)).cast("long").as("n_violations"))
      .select(lit("lineitem_qty_range").as("check_name"), col("n_violations"))
    val nullStatus = orders.filter(col("o_orderstatus").isNull)
      .agg(count(lit(1)).cast("long").as("n_violations"))
      .select(lit("orders_null_status").as("check_name"), col("n_violations"))
    pkDup.unionByName(fkOrphan).unionByName(qtyRange).unionByName(nullStatus)
      .orderBy("check_name")
  }

  /** B77 — table integrity fingerprint: per-segment (ship year) row count
    * plus an ORDER-INDEPENDENT checksum — `bit_xor` of a per-row
    * fingerprint — so two replicas of a 100 TB table compare by exchanging
    * |segments| tiny rows instead of running b68's full-diff join. XOR is
    * the right combine: commutative/associative (partition-order and
    * shuffle-layout invariant, map-side combined), overflow-free (unlike
    * an integer sum of hashes), and self-inverse, so replica drift shows
    * up as the XOR of exactly the differing rows' fingerprints.
    *
    * The per-row fingerprint is the shared cross-engine polynomial fold
    * ([[graft.llm.Winnowing.polyFoldSpark]]) over a canonical '|'-joined
    * rendering of key + payload columns — the one row-hash both engines
    * compute identically, which is what makes this t2-checkable. Engine-
    * local callers swap in xxhash64 (one codegen'd hash vs a per-char
    * fold — the Winnowing XxGramHash precedent); the checksum algebra is
    * hash-agnostic.
    *
    * Scale: one narrow scan, one hash agg to |segments| rows; nothing
    * driver-side but the report itself. */
  private val b77 = {
    import graft.llm.Winnowing
    // null-total rendering: every field coalesces to chr(1) (a control
    // char that cannot appear in these rendered values), so a NULL field
    // hashes deterministically and identically in both engines — Spark's
    // concat_ws would silently SKIP a null argument (colliding with a
    // different row's rendering) and DuckDB's '||' would null the whole
    // row, which bit_xor then skips: both would mis-fingerprint.
    def rendered(cast: String => String, dateFmt: String) = Seq(
      cast("l_orderkey"), cast("l_linenumber"),
      cast("CAST(l_quantity AS BIGINT)"), "l_returnflag", dateFmt)
      .map(f => s"coalesce($f, chr(1))")
    val sparkRow = "concat_ws('|', " +
      rendered(c => s"CAST($c AS STRING)", "date_format(l_shipdate, 'yyyy-MM-dd')")
        .mkString(", ") + ")"
    val duckRow = "(" +
      rendered(c => s"CAST($c AS VARCHAR)", "strftime(l_shipdate, '%Y-%m-%d')")
        .mkString(" || '|' || ") + ")"
    entry(
      "b77_integrity_checksum",
      s"""WITH f AS (
         |  SELECT year(l_shipdate) AS yr,
         |         ${Winnowing.polyFoldDuck(duckRow)} AS fp
         |  FROM lineitem)
         |SELECT yr, count(*) AS n, CAST(bit_xor(fp) AS BIGINT) AS chk
         |FROM f GROUP BY yr ORDER BY yr""".stripMargin) { (s, d) =>
      // the rendered row string is its OWN projection: polyFold's lambda
      // references its input per character, and interpreted HOF lambdas
      // don't CSE-hoist — inlining the concat would rebuild the full
      // string for every character position (the b36/langid lesson)
      Tables.lineitem(s, d)
        .select(year(col("l_shipdate")).as("yr"), expr(sparkRow).as("row_str"))
        .select(col("yr"), expr(Winnowing.polyFoldSpark("row_str")).as("fp"))
        .groupBy("yr")
        .agg(count(lit(1)).as("n"), expr("bit_xor(fp)").cast("long").as("chk"))
        .orderBy("yr")
    }
  }

  /** B78 — sketch-state maintenance: the approximate twin of B69. Per-group
    * HLL sketches (DataSketches binary state) are stored for the base, the
    * delta is sketched alone, and the rollup is `hll_union_agg` over the
    * partial sketches — never a rescan of history. The invariant that makes
    * stored sketch states trustworthy is MERGE ≡ RECOMPUTE: unioning the
    * base and delta sketches yields bit-for-bit the same estimate as
    * sketching all rows from scratch (asserted in ScaleOpsSpec, along
    * with a 2% tolerance against exact distinct). Approximate by design →
    * rows-only here (the estimate is not SQL-replicable in DuckDB's
    * different HLL implementation).
    *
    * Scale: this is how 100 TB distinct-user metrics stay fresh — the
    * delta agg shuffles |groups| KB-sized sketch states, history is one
    * stored table of the same shape; estimates extract map-side. */
  private val b78 = entryNoOracle("b78_sketch_maintenance") { (s, d) =>
    val ev = Tables.events(s, d).select(col("event_id"), col("event_type"), col("user_id"))
    def sketchState(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type").agg(hll_sketch_agg(col("user_id")).as("sk"))
    val baseState = sketchState(ev.filter(col("event_id") % 10 =!= 0))
    val deltaState = sketchState(ev.filter(col("event_id") % 10 === 0))
    baseState.unionByName(deltaState)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
      .orderBy("event_type")
  }

  /** Full-recompute twin of [[b78]]'s merged estimate (spec hook): sketch
    * every row from scratch. ScaleOpsSpec asserts merge ≡ recompute
    * exactly, and both within tolerance of exact count(distinct). */
  def sketchRecompute(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables.events(s, d).select(col("event_type"), col("user_id"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("approx_users"))
      .orderBy("event_type")

  /** B117 — ORDERED-SEQUENCE FUNNEL (view → click → purchase): how many
    * users complete each prefix of the step sequence IN TIMESTAMP ORDER —
    * the classic product-analytics query. Each step k is the user's
    * EARLIEST step-k event strictly after their step-(k-1) anchor
    * (first-touch attribution; ties broken by the strict `>` — an event
    * at exactly the anchor instant does not advance the funnel, same rule
    * both engines).
    *
    * Shape: one groupBy per step over the step-filtered events, chained
    * by an equi-join on user_id — each stage shuffles O(users who reached
    * step k-1) rows, never the full log twice; predicates (event_type)
    * reach the scan. At 100 TB the per-step tables are tiny relative to
    * the log, and AQE broadcast-joins them back against the next
    * step-filtered scan. Output is 3 exact counts — integers, trivially
    * deterministic. */
  /** Shared verbatim by b117 (batch) and b120 (streaming state machine) —
    * hash-green on both proves the per-user fold ≡ the declarative
    * min-anchor chain. */
  private[graft] val funnelOracleSql: String =
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |      JOIN v ON v.user_id = e.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |      JOIN c ON c.user_id = e.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
      |SELECT step, event_type, users FROM (
      |  SELECT 1 AS step, 'view' AS event_type, count(*) AS users FROM v
      |  UNION ALL SELECT 2, 'click', count(*) FROM c
      |  UNION ALL SELECT 3, 'purchase', count(*) FROM p) t
      |ORDER BY step""".stripMargin

  /** The 3-row (step, event_type, users) presentation shared by b117 and
    * b120's [[funnelCounts]]: each input DataFrame is that step's user
    * population; its count is the funnel row. */
  private[graft] def funnelPresentation(
      steps: Seq[(Int, String, org.apache.spark.sql.DataFrame)])
      : org.apache.spark.sql.DataFrame =
    steps.map { case (k, name, df) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(k).as("step"), lit(name).as("event_type"), col("users"))
    }.reduce(_.unionByName(_)).orderBy("step")

  /** b120's spelling: per step, how many users reached it
    * (`reached` = (user_id, mx) with mx = furthest step). */
  private[graft] def funnelCounts(reached: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    funnelPresentation(Seq((1, "view"), (2, "click"), (3, "purchase"))
      .map { case (k, name) => (k, name, reached.filter(col("mx") >= k)) })

  private val b117 = entry("b117_funnel_steps", funnelOracleSql) { (s, d) =>
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    // each step table is O(users) and feeds TWO consumers (the next step's
    // join + its own funnel count) — materialize once so the three count
    // aggregations don't re-execute the whole chain per step
    def step(of: String): org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      prev => ev.filter(col("event_type") === of)
        .join(prev, "user_id")
        .filter(col("ts") > col("anchor"))
        .groupBy("user_id").agg(min(col("ts")).as("anchor"))
        .localCheckpoint(true)
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("anchor"))
      .localCheckpoint(true)
    val c = step("click")(v)
    val p = step("purchase")(c)
    funnelPresentation(Seq((1, "view", v), (2, "click", c), (3, "purchase", p)))
  }

  /** B118 — COHORT RETENTION: users bucketed by the week of their FIRST
    * event (exact integer micros arithmetic — `(epoch_us - t0) div week`,
    * no calendar/timezone semantics to drift between engines), crossed
    * with every week they were active → the (cohort_week, active_week,
    * n_users) retention triangle.
    *
    * Shape: two aggregations over the log (first-touch per user, distinct
    * user-weeks) joined on user_id, then one small groupBy — the
    * first-touch table is O(users) and broadcast-joinable against the
    * distinct-activity table at any scale; all keys and counts are exact
    * BIGINTs. */
  /** Shared verbatim by b118 (batch) and b121 (streaming first-touch
    * state machine). */
  private[graft] val cohortOracleSql: String =
    """WITH wk AS (
      |  SELECT user_id,
      |         (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
      |           // 604800000000
      |           - CAST((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
      |                  % 604800000000 < 0 AS BIGINT) AS week
      |  FROM events),
      |f AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id),
      |a AS (SELECT DISTINCT user_id, week FROM wk)
      |SELECT f.cohort_week, a.week, count(*) AS n_users
      |FROM f JOIN a ON a.user_id = f.user_id
      |GROUP BY f.cohort_week, a.week
      |ORDER BY f.cohort_week, a.week""".stripMargin

  /** Week bucket with FLOOR-division semantics. BOTH engines' integer
    * division truncates toward zero (Spark `div` AND DuckDB `//` —
    * verified −7 // 2 = −3; only DuckDB's float `//` floors), so the
    * `%`-sign correction is spelled on BOTH sides ([[weekFloorSqlDuck]],
    * cohortOracleSql) to commit FLOOR for ANY event time — a pre-anchor
    * timestamp must land in the week CONTAINING it, not one week later
    * (ADVICE r10, semantics corrected r14). Shared by b118/b121 and the
    * b216/b218/b222 family. */
  private[graft] val weekFloorExpr: String =
    // 1704067200000000 = epoch µs of 2024-01-01T00:00Z; 604800000000 = 1 week
    "(unix_micros(ts) - 1704067200000000L) div 604800000000L" +
      " - cast((unix_micros(ts) - 1704067200000000L) % 604800000000L < 0 as bigint)"

  /** [[weekFloorExpr]]'s DuckDB spelling. DuckDB's integer `//` ALSO
    * truncates toward zero (verified: −7 // 2 = −3 on BIGINT — b196's
    * pin; only the FLOAT `//` floors), so the floor needs the same sign
    * correction here. On this corpus every event is post-anchor (the
    * numerator is positive, trunc ≡ floor — the hash can't tell), but
    * the committed FLOOR semantics must hold for any event time. Shared
    * by the b216/b218/b222 oracles. */
  private[graft] val weekFloorSqlDuck: String =
    "((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))" +
      " // 604800000000" +
      " - CAST((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))" +
      " % 604800000000 < 0 AS BIGINT))"

  private val b118 = entry("b118_cohort_retention", cohortOracleSql) { (s, d) =>
    val wk = Tables.events(s, d).select(col("user_id"),
      expr(weekFloorExpr).as("week"))
    val f = wk.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val a = wk.distinct()
    f.join(a, "user_id")
      .groupBy("cohort_week", "week").agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week")
  }

  /** B195 — EVENT-TRANSITION MATRIX (the first-order Markov model of
    * user behavior — the product-analytics "what happens after X" table,
    * and the sequence-statistics counterpart to B129's word bigrams on
    * the EVENTS domain): per user, events order by (ts, event_id) —
    * event_id breaks timestamp ties deterministically — adjacent pairs
    * count into the corpus-wide (prev, next) matrix, and each row
    * normalizes to transition probabilities in integer basis points
    * (n·10⁴ div row-total; B117/B118 answer funnel/cohort questions,
    * this is the unconditioned dynamics table they're special cases of).
    *
    * Scale posture: one lag window PARTITIONED BY USER (state bounded by
    * a user's event count, never corpus-global), then a map-combinable
    * (prev, next) count; the row-normalize join runs over the
    * |event_types|² matrix — dashboard-sized. */
  /** B195's oracle — shared VERBATIM by B214's streamed maintenance (the
    * b144/b148 twin convention: the stream must land on exactly the
    * batch matrix). */
  private[graft] val transitionOracleSql: String =
    s"""WITH seq AS (
       |  SELECT user_id, event_type,
       |         lag(event_type) OVER (PARTITION BY user_id
       |                               ORDER BY ts, event_id) AS prev_type
       |  FROM events),
       |pairs AS (
       |  SELECT prev_type, event_type AS next_type, count(*) AS n
       |  FROM seq WHERE prev_type IS NOT NULL
       |  GROUP BY prev_type, event_type),
       |rows_ AS (SELECT prev_type, sum(n) AS tot FROM pairs GROUP BY prev_type)
       |SELECT p.prev_type, p.next_type, CAST(p.n AS BIGINT) AS n,
       |       CAST(p.n * 10000 // r.tot AS BIGINT) AS p_bp
       |FROM pairs p JOIN rows_ r USING (prev_type)
       |ORDER BY p.prev_type, p.next_type""".stripMargin

  /** The row-normalize tail over a (prev_type, next_type, n) pair-count
    * relation — shared by B195 (batch) and B214 (streamed counts), the
    * b161 liftFromBigrams pattern: keeping the tail literally shared is
    * what makes the twins' equality a statement about the FOLD, not
    * about two copies of the presentation. */
  private[graft] def normalizeTransitions(pairs: DataFrame): DataFrame = {
    val totals = pairs.groupBy("prev_type").agg(sum("n").as("tot"))
    pairs.join(broadcast(totals), "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("CAST(n * 10000 div tot AS BIGINT)").as("p_bp"))
      .orderBy("prev_type", "next_type")
  }

  private val b195 = entry(
    "b195_event_transitions", transitionOracleSql, bench = true) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    normalizeTransitions(pairs)
  }

  val entries: Seq[Entry] =
    Seq(b67, b68, b69, b71, b73, b77, b78, b117, b118, b195)
}
