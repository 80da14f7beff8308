package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** SURVEY §2B aggregation depth + window/sort/limit/set-op repertoire
  * (B19-B23, B25-B31). Built-ins only; the work is determinism (unique
  * order tiebreakers, round(x,4) on doubles, explicit NULLS FIRST on the
  * DuckDB side) and scale notes.
  *
  * Scale posture: window functions shuffle once on partitionBy keys;
  * grouping-set aggregates expand rows (one per grouping set) before a
  * single shuffle; set ops are hash-partitioned joins/aggregates. Nothing
  * here materializes on the driver.
  */
object WindowsAndAggs {

  /** B19 — HLL approximate distinct. Never t2 (approximate by design):
    * the tolerance test vs exact lives in ApproxSpec; the driver records a
    * rows-only check. At 100 TB this replaces B18's exact distinct with a
    * constant-size sketch per group — no (group,value) shuffle. */
  private val b19 = entryNoOracle("b19_agg_approx_distinct") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag")
  }

  /** B20 — cube with grouping indicators. gid is computed portably as
    * grouping(a)*2+grouping(b) (Spark's grouping_id and DuckDB's multi-arg
    * grouping agree, but the explicit form is dialect-proof). */
  private val b20 = entry(
    "b20_agg_cube",
    """SELECT CAST(grouping(o_orderstatus)*2 + grouping(o_orderpriority) AS INTEGER) AS gid,
      |       o_orderstatus, o_orderpriority,
      |       count(*) AS n, round(sum(o_totalprice), 4) AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
          .cast("int").as("gid"),
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 4).as("total"))
      .select("gid", "o_orderstatus", "o_orderpriority", "n", "total")
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** B20+ — pivot (wide aggregation): order counts and totals per status,
    * pivoted by priority class. Spark's native .pivot(values) — explicit
    * value list, so no extra distinct-values pass over the data; the
    * oracle spells it as FILTERed aggregates (dialect-portable form). */
  private val b20p = entry(
    "b20_agg_pivot",
    """SELECT o_orderstatus,
      |       CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS urgent_n,
      |       CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS medium_n,
      |       CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS low_n,
      |       round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 0), 4) AS urgent_total,
      |       round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderpriority = '5-LOW'), 0), 4) AS low_total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    val pivoted = Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", Seq("1-URGENT", "3-MEDIUM", "5-LOW"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))
    // absent (status, priority) combos pivot to null, but COUNT FILTER
    // yields 0 — coalesce aligns the two
    pivoted.select(
        col("o_orderstatus"),
        coalesce(col("`1-URGENT_n`"), lit(0L)).as("urgent_n"),
        coalesce(col("`3-MEDIUM_n`"), lit(0L)).as("medium_n"),
        coalesce(col("`5-LOW_n`"), lit(0L)).as("low_n"),
        round(coalesce(col("`1-URGENT_total`"), lit(0)), 4).as("urgent_total"),
        round(coalesce(col("`5-LOW_total`"), lit(0)), 4).as("low_total"))
      .orderBy("o_orderstatus")
  }

  /** B20++ — unpivot/melt (the inverse of pivot): wide per-part metrics to
    * long (part, metric, value) form via Spark's native Dataset.unpivot —
    * one narrow projection, no shuffle. The oracle uses INCLUDE NULLS:
    * Spark's unpivot RETAINS null values where DuckDB's UNPIVOT drops
    * them by default — identical today only because these columns are
    * non-null, so the semantics are pinned explicitly. */
  private val b20u = entry(
    "b20_agg_unpivot",
    """WITH wide AS (SELECT p_partkey,
      |                     CAST(p_size AS DOUBLE) AS size_d,
      |                     CAST(p_retailprice AS DOUBLE) AS price_d
      |              FROM part)
      |SELECT p_partkey, metric, round(value, 4) AS value
      |FROM wide UNPIVOT INCLUDE NULLS (value FOR metric IN (size_d, price_d))
      |ORDER BY p_partkey, metric""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size_d"),
        col("p_retailprice").cast("double").as("price_d"))
      .unpivot(Array(col("p_partkey")), Array(col("size_d"), col("price_d")),
        "metric", "value")
      .select(col("p_partkey"), col("metric"), round(col("value"), 4).as("value"))
      .orderBy("p_partkey", "metric")
  }

  /** B21 — collect_list/collect_set, always sort_array'd for determinism
    * (SURVEY §2B rules; collection order is otherwise partition-dependent).
    * Output is serialized to a joined string: the driver's compare sorts the
    * result frame in pandas, which cannot hash array cells (r01 failure). */
  private val b21 = entry(
    "b21_agg_collect",
    """SELECT o_custkey,
      |       array_to_string(list_sort(list(o_orderpriority)), '|') AS prios,
      |       array_to_string(list_sort(list(DISTINCT o_orderstatus)), '|') AS statuses
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        array_join(sort_array(collect_list(col("o_orderpriority"))), "|").as("prios"),
        array_join(sort_array(collect_set(col("o_orderstatus"))), "|").as("statuses"))
      .orderBy("o_custkey")
  }

  /** B22 — statistical aggregates (stddev/variance/corr/covar semantics).
    *
    * Float partial-aggregate merge order is partition-scheduling-dependent in
    * BOTH engines, so `round(stddev_samp(double), 4)` can flip at a rounding
    * boundary between runs (r01: hash_match=false). The t2 twin therefore
    * derives the same statistics from EXACT integer sums (values ×100 as
    * BIGINT — order-independent, overflow-free at 600k rows) with the
    * identical double formula text on both sides: deterministic across runs
    * and identical pre-round doubles in both engines. One residual trap
    * remained (r02: hash_match=false): tiny negative covariances
    * (≈ -5.5e-06) round to `-0.0` in DuckDB (IEEE rounding of the binary
    * value keeps the sign) but `+0.0` in Spark (BigDecimal has no signed
    * zero), and the two serialize differently. Every rounded output is
    * therefore normalized with `+ 0.0` on BOTH sides — IEEE 754 guarantees
    * `-0.0 + 0.0 = +0.0`, and every other double is unchanged.
    * The native stddev_samp/var_samp/corr/covar_samp/covar_pop aggregates are
    * exercised against these closed forms in ApproxSpec (tolerance).
    */
  private val b22 = entry(
    "b22_agg_stats",
    """WITH s AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS DOUBLE) AS n,
      |         CAST(CAST(sum(qi * qi) AS BIGINT) AS DOUBLE) AS sqq,
      |         CAST(CAST(sum(qi) AS BIGINT) AS DOUBLE) AS sq,
      |         CAST(CAST(sum(di) AS BIGINT) AS DOUBLE) AS sd,
      |         CAST(CAST(sum(di * di) AS BIGINT) AS DOUBLE) AS sdd,
      |         CAST(CAST(sum(ti) AS BIGINT) AS DOUBLE) AS st,
      |         CAST(CAST(sum(ti * ti) AS BIGINT) AS DOUBLE) AS stt,
      |         CAST(CAST(sum(di * ti) AS BIGINT) AS DOUBLE) AS sdt
      |  FROM (SELECT l_returnflag,
      |               CAST(round(l_quantity * 100) AS BIGINT) AS qi,
      |               CAST(round(l_discount * 100) AS BIGINT) AS di,
      |               CAST(round(l_tax * 100) AS BIGINT) AS ti
      |        FROM lineitem)
      |  GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |       round(sqrt((sqq - sq * sq / n) / nullif(n - 1, 0.0)) / 100, 4) + 0.0 AS sd_qty,
      |       round((sqq - sq * sq / n) / nullif(n - 1, 0.0) / 10000, 4) + 0.0 AS var_qty,
      |       round((n * sdt - sd * st) / nullif(sqrt(n * sdd - sd * sd) * sqrt(n * stt - st * st), 0.0), 4) + 0.0 AS corr_disc_tax,
      |       round((sdt - sd * st / n) / nullif(n - 1, 0.0) / 10000, 4) + 0.0 AS covar_s,
      |       round((sdt - sd * st / n) / n / 10000, 4) + 0.0 AS covar_p
      |FROM s ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag"),
      round(col("l_quantity") * 100).cast("long").as("qi"),
      round(col("l_discount") * 100).cast("long").as("di"),
      round(col("l_tax") * 100).cast("long").as("ti"))
    val sums = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("qi") * col("qi")).cast("double").as("sqq"),
      sum(col("qi")).cast("double").as("sq"),
      sum(col("di")).cast("double").as("sd"),
      sum(col("di") * col("di")).cast("double").as("sdd"),
      sum(col("ti")).cast("double").as("st"),
      sum(col("ti") * col("ti")).cast("double").as("stt"),
      sum(col("di") * col("ti")).cast("double").as("sdt"))
    val n = col("n"); val sq = col("sq"); val sqq = col("sqq")
    val sd = col("sd"); val sdd = col("sdd"); val st = col("st")
    val stt = col("stt"); val sdt = col("sdt")
    // nullif'd denominators: a 1-row group has n-1 = 0 and a constant
    // column zeroes the corr denominator — ANSI mode would turn the
    // divide into a runtime error where the native aggregates return NULL
    val nm1 = nullif(n - lit(1), lit(0.0))
    val corrDen = nullif(sqrt(n * sdd - sd * sd) * sqrt(n * stt - st * st), lit(0.0))
    sums.select(
        col("l_returnflag"),
        (round(sqrt((sqq - sq * sq / n) / nm1) / 100, 4) + lit(0.0)).as("sd_qty"),
        (round((sqq - sq * sq / n) / nm1 / 10000, 4) + lit(0.0)).as("var_qty"),
        (round((n * sdt - sd * st) / corrDen, 4) + lit(0.0)).as("corr_disc_tax"),
        (round((sdt - sd * st / n) / nm1 / 10000, 4) + lit(0.0)).as("covar_s"),
        (round((sdt - sd * st / n) / n / 10000, 4) + lit(0.0)).as("covar_p"))
      .orderBy("l_returnflag")
  }

  /** B23 — exact percentile/median (continuous interpolation — Spark
    * `percentile` and DuckDB `quantile_cont` agree; `percentile_approx`
    * would be B19-class and is deliberately not used here). */
  private val b23 = entry(
    "b23_agg_percentile",
    """SELECT l_returnflag,
      |       round(CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE), 4) AS p25,
      |       round(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS p50,
      |       round(CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE), 4) AS p75,
      |       round(CAST(median(l_quantity) AS DOUBLE), 4) AS med
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
        round(expr("median(l_quantity)"), 4).as("med"))
      .orderBy("l_returnflag")
  }

  /** B23+ — approximate percentile (the B19-class sketch companion of the
    * exact b23): Spark's percentile_approx (Greenwald-Khanna quantile
    * summary — constant-size mergeable state per group, the 100 TB path
    * where the exact percentile's full sort-per-group is unaffordable).
    * Approximate by design → rows-only driver check; error-vs-exact bound
    * asserted in ApproxSpec. */
  private val b23a = entryNoOracle("b23_agg_percentile_approx") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile_approx(l_quantity, 0.25, 10000)"), 4).as("p25"),
        round(expr("percentile_approx(l_quantity, 0.5, 10000)"), 4).as("p50"),
        round(expr("percentile_approx(l_quantity, 0.75, 10000)"), 4).as("p75"))
      .orderBy("l_returnflag")
  }

  /** B25 — ranking window functions over a deterministic (unique) order. */
  private val b25 = entry(
    "b25_window_ranking",
    """SELECT o_custkey, o_orderkey,
      |       row_number() OVER w AS rn,
      |       rank() OVER w AS rnk,
      |       dense_rank() OVER w AS drnk,
      |       ntile(4) OVER w AS quartile,
      |       round(percent_rank() OVER w, 4) AS prank,
      |       round(cume_dist() OVER w, 4) AS cdist
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin, bench = true) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 4).as("prank"),
        round(cume_dist().over(w), 4).as("cdist"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** B26 — analytic window functions (lag/lead/first/last/nth). last/nth use
    * the full-partition frame; the default running frame would make
    * last_value degenerate to the current row. */
  private val b26 = entry(
    "b26_window_analytic",
    """SELECT o_custkey, o_orderkey,
      |       lag(o_orderkey, 1) OVER w AS prev_key,
      |       lead(o_orderkey, 1) OVER w AS next_key,
      |       first_value(o_orderkey) OVER wf AS first_key,
      |       last_value(o_orderkey) OVER wf AS last_key,
      |       nth_value(o_orderkey, 2) OVER wf AS second_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        first(col("o_orderkey")).over(wf).as("first_key"),
        last(col("o_orderkey")).over(wf).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(wf).as("second_key"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** B27 — explicit frames: running sum (rows), sliding avg (rows), and a
    * value-range frame over o_totalprice. */
  private val b27 = entry(
    "b27_window_frames",
    """SELECT o_custkey, o_orderkey,
      |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |         ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
      |       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
      |         ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS sliding_avg,
      |       CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
      |         RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_similar
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val wOrd = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRange = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      .rangeBetween(-10000, Window.currentRow)
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
          .as("running_total"),
        round(avg(col("o_totalprice"))
          .over(wOrd.rowsBetween(-3, Window.currentRow)), 4).as("sliding_avg"),
        count(lit(1)).over(wRange).as("n_similar"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** B28 — global multi-key sort with explicit null placement (Spark default
    * is ASC NULLS FIRST / DESC NULLS LAST; both spelled out in the oracle). */
  private val b28 = entry(
    "b28_sort_multikey",
    """SELECT o_orderkey, nullif(o_orderpriority, '3-MEDIUM') AS prio_or_null,
      |       o_orderstatus, o_totalprice
      |FROM orders
      |ORDER BY prio_or_null DESC NULLS LAST, o_orderstatus ASC,
      |         o_totalprice DESC, o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("prio_or_null"),
        col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("prio_or_null").desc_nulls_last, col("o_orderstatus").asc,
        col("o_totalprice").desc, col("o_orderkey"))
  }

  /** B29 — top-k per group (window + filter) composed with a global
    * ORDER BY + LIMIT. At scale, row_number≤k prunes inside each partition
    * before any global ordering; the final limit is a cheap take. */
  private val b29 = entry(
    "b29_limit_topk",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn LIMIT 500""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
      .limit(500)
  }

  /** B30 — union all + union distinct (by name). */
  private val b30 = entry(
    "b30_setop_union",
    """SELECT nk, src FROM (
      |  SELECT c_nationkey AS nk, 'c' AS src FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nk, 'c' AS src FROM supplier) u
      |UNION
      |SELECT n_nationkey AS nk, 'n' AS src FROM nation
      |ORDER BY nk, src""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).select(col("c_nationkey").as("nk"), lit("c").as("src"))
    val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nk"), lit("c").as("src"))
    val n = Tables.nation(s, d).select(col("n_nationkey").as("nk"), lit("n").as("src"))
    c.unionByName(sup).unionByName(n).distinct()
      // distinct-of-union-all ≡ (c ∪ALL s) ∪DISTINCT n per SQL UNION chain
      .orderBy("nk", "src")
  }

  /** B31 — intersect / except with ALL variants (multiset semantics). */
  private val b31 = entry(
    "b31_setop_intersect_except",
    """SELECT nk, 'intersect' AS op FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  INTERSECT SELECT s_nationkey FROM supplier) a
      |UNION ALL
      |SELECT nk, 'except' AS op FROM (
      |  SELECT n_nationkey AS nk FROM nation
      |  EXCEPT SELECT c_nationkey FROM customer) b
      |UNION ALL
      |SELECT nk, 'except_all' AS op FROM (
      |  SELECT o_custkey % 10 AS nk FROM orders WHERE o_orderkey < 100
      |  EXCEPT ALL SELECT c_custkey % 10 FROM customer WHERE c_custkey < 50) c
      |ORDER BY op, nk""".stripMargin) { (s, d) =>
    val cNk = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
    val sNk = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
    val nNk = Tables.nation(s, d).select(col("n_nationkey").as("nk"))
    val oMod = Tables.orders(s, d).filter(col("o_orderkey") < 100)
      .select((col("o_custkey") % 10).as("nk"))
    val cMod = Tables.customer(s, d).filter(col("c_custkey") < 50)
      .select((col("c_custkey") % 10).as("nk"))
    cNk.intersect(sNk).select(col("nk"), lit("intersect").as("op"))
      .unionByName(nNk.except(cNk).select(col("nk"), lit("except").as("op")))
      .unionByName(oMod.exceptAll(cMod).select(col("nk"), lit("except_all").as("op")))
      .orderBy("op", "nk")
  }

  /** B196 — PER-KEY TREND FITTING (exact integer OLS — the per-entity
    * slope table feeding anomaly triage and forecasting dashboards; the
    * regression counterpart to B22's corr): per user, the least-squares
    * slope of event cents over the day index, in MICRO-cents/day, from
    * the four classical sufficient statistics (n, Σx, Σy, Σxy, Σx²) —
    * all BIGINT, one map-combinable aggregate, and the slope is the
    * textbook ⌊(n·Σxy − Σx·Σy)·10⁶ / (n·Σx² − (Σx)²)⌋ with BOTH engines
    * walking the identical subtraction-before-scale order (the committed
    * overflow bound: |n·Σxy| ≤ n²·x_max·y_max ≈ 7·10¹¹ on this corpus,
    * ×10⁶ after the cancellation stays far inside BIGINT; cents via the
    * b53 round(value·100) convention; x = days since 2024-01-01, the
    * corpus epoch). Degenerate keys (all events one day ⇒ zero
    * variance) drop — a slope of an undefined line is not 0. NEGATIVE
    * slopes are first-class here (roughly half the corpus keys), which
    * makes this row the engine's pin that Spark's `div` and DuckDB's
    * `//` agree on negative inexact quotients (both truncate toward
    * zero for integer operands — hash-checked over ~750 negative
    * divisions per SF; the spec adds a direct witness).
    *
    * Scale posture: ONE map-combinable aggregate keyed on user — the
    * sufficient-statistics trick is exactly what makes regression
    * 100 TB-able (no per-key sort, no window, no second pass); output is
    * |keys| rows. */
  private val b196 = entry(
    "b196_trend_ols",
    s"""WITH pts AS (
       |  SELECT user_id,
       |         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
       |         CAST(round(value * 100) AS BIGINT) AS y
       |  FROM events),
       |st AS (
       |  SELECT user_id, count(*) AS n,
       |         sum(x) AS sx, sum(y) AS sy,
       |         sum(x * y) AS sxy, sum(x * x) AS sxx
       |  FROM pts GROUP BY user_id)
       |SELECT user_id, CAST(n AS BIGINT) AS n,
       |       CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
       |            AS BIGINT) AS slope_micro
       |FROM st WHERE n * sxx - sx * sx > 0
       |ORDER BY user_id""".stripMargin) { (s, d) =>
    val pts = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long").as("x"),
        round(col("value") * 100).cast("long").as("y"))
    pts.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .filter(expr("n * sxx - sx * sx > 0"))
      .select(col("user_id"), col("n"),
        expr("CAST((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx) AS BIGINT)")
          .as("slope_micro"))
      .orderBy("user_id")
  }

  /** B211 — ROLLING EXACT MEDIAN over a row frame (the moving-quantile
    * smoother behind latency/price dashboards; b27's frame machinery
    * carrying an ORDER STATISTIC instead of an algebraic aggregate):
    * per user, over the last ≤ 8 events ((ts, event_id) order, ROWS 7
    * PRECEDING), med = the LOWER median — the ⌈n/2⌉-th smallest, an
    * exact BIGINT cents value; interpolated medians are doubles whose
    * halving diverges between engines, order statistics hash. Spelled
    * as collect-over-frame → sort → element_at((n+1) div 2) in BOTH
    * engines (Spark collect_list window / DuckDB list window — the
    * per-row list is frame-bounded, ≤ 8 elements).
    *
    * Scale posture: one user-partitioned frame window; per-row state is
    * the 8-element frame, O(1) — never a per-key sort of the whole
    * history. The b27 cost class with a constant-factor list. */
  private val b211 = entry(
    "b211_rolling_median",
    """WITH seq AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |f AS (
      |  SELECT user_id, event_id, cents,
      |         list_sort(list(cents) OVER (PARTITION BY user_id
      |                                     ORDER BY ts_us, event_id
      |                                     ROWS BETWEEN 7 PRECEDING
      |                                     AND CURRENT ROW)) AS win
      |  FROM seq)
      |SELECT user_id, event_id, cents,
      |       CAST(len(win) AS BIGINT) AS win_n,
      |       win[CAST((len(win) + 1) // 2 AS INT)] AS med_cents
      |FROM f ORDER BY user_id, event_id""".stripMargin, bench = true) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-7, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("win", array_sort(collect_list(col("cents")).over(w)))
      .select(col("user_id"), col("event_id"), col("cents"),
        size(col("win")).cast("long").as("win_n"),
        element_at(col("win"), expr("CAST((size(win) + 1) div 2 AS INT)"))
          .as("med_cents"))
      .orderBy("user_id", "event_id")
  }

  val entries: Seq[Entry] =
    Seq(b19, b20, b20p, b20u, b21, b22, b23, b23a, b25, b26, b27, b28, b29,
      b30, b31, b196, b211)
}
