package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** B276 — CUSUM LEVEL-SHIFT DETECTION (Page, Biometrika 1954 — the
  * classic sequential changepoint detector; the volume-monitoring twin of
  * B264's rate-drift rules: drift monitors compare two SNAPSHOTS, CUSUM
  * watches ONE series and localizes WHEN the level moved): over the
  * daily event-count series, the one-sided cumulative sums
  *
  *   S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − k)),   S⁻ symmetric,
  *
  * with target μ = mean daily count (integer floor), allowance
  * k = μ div 10 and decision threshold h = 2μ — all RELATIVE to the
  * measured level so one spelling holds across SFs (measured: clean max
  * excursion ≤ 0.55μ at every SF; planted shifts reach ≥ 3.6μ).
  *
  * The nonlinear max-recursion is NOT window-expressible directly; both
  * engines use the PREFIX-MIN IDENTITY instead:
  *
  *   S_t = P_t − min(0, min_{j≤t} P_j),  P = running sum of (±(x−μ) − k)
  *
  * — two stacked windows over the bounded day rollup (the b273 shape).
  * CusumSpec pins the identity against the literal recursion on the
  * fixture and on adversarial series.
  *
  * Three legs (the b258/b264 planted convention): `clean` (no alarm in
  * either direction — the detector is quiet on the real series),
  * `shift_up` (counts DOUBLE from day [[PlantFromDay]] — the up alarm
  * fires, localized at/after the plant; the down side stays quiet) and
  * `shift_down` (counts halve — symmetric). Output per (leg, direction):
  * max excursion, first alarm day (−1 if none), alarm-day count.
  *
  * Integer-exact throughout: counts, floor-division μ/k/h, BIGINT sums.
  *
  * Scale posture: ONE map-combinable day aggregate over the fact table;
  * the leg × direction expansion and both windows run over the |days|
  * rollup (bounded — the b125 exception); μ broadcasts as a one-row
  * aggregate. */
object ChangepointOps {

  /** Allowance divisor: k = μ div 10 (half-width of the dead band). */
  val AllowanceDiv = 10L

  /** Decision threshold in target units: h = 2·μ. */
  val ThresholdMul = 2L

  /** Plant day: the level shifts from this day (day 21 of the 30-day
    * event horizon — day_id is datediff from 2024-01-01). */
  val PlantFromDay = 21L

  /** The b276 oracle — shared VERBATIM by the streamed twin b283 (the
    * b246/b248 twin convention). */
  private[graft] val cusumOracleSql: String =
    s"""WITH daily AS (
       |  SELECT CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
       |              AS BIGINT) AS day_id,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1),
       |st AS (SELECT sum(n) // count(*) AS mu,
       |              (sum(n) // count(*)) // $AllowanceDiv AS k,
       |              $ThresholdMul * (sum(n) // count(*)) AS h
       |       FROM daily),
       |series AS (
       |  SELECT l.leg, d.sign, day_id,
       |         CASE l.leg
       |           WHEN 'shift_up' THEN
       |             CASE WHEN day_id >= $PlantFromDay THEN n * 2 ELSE n END
       |           WHEN 'shift_down' THEN
       |             CASE WHEN day_id >= $PlantFromDay THEN n // 2 ELSE n END
       |           ELSE n END AS x
       |  FROM daily
       |  CROSS JOIN (VALUES ('clean'), ('shift_down'), ('shift_up')) l(leg)
       |  CROSS JOIN (VALUES (1), (-1)) d(sign)),
       |y AS (SELECT leg, sign, day_id, sign * (x - mu) - k AS y
       |      FROM series CROSS JOIN st),
       |p AS (SELECT leg, sign, day_id, y,
       |             sum(y) OVER (PARTITION BY leg, sign ORDER BY day_id
       |                          ROWS UNBOUNDED PRECEDING) AS p
       |      FROM y),
       |srel AS (
       |  SELECT leg, sign, day_id,
       |         p - least(0, min(p) OVER (PARTITION BY leg, sign
       |                                   ORDER BY day_id
       |                                   ROWS UNBOUNDED PRECEDING)) AS s
       |  FROM p)
       |SELECT leg, CAST(sign AS BIGINT) AS dir,
       |       CAST(max(s) AS BIGINT) AS max_s,
       |       CAST(coalesce(min(CASE WHEN s > h THEN day_id END), -1)
       |            AS BIGINT) AS first_alarm,
       |       CAST(sum(CASE WHEN s > h THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_alarm_days
       |FROM srel CROSS JOIN st
       |GROUP BY leg, sign ORDER BY leg, dir""".stripMargin

  /** The b276 tail over any (day_id, n) rollup — shared by the batch
    * entry and the streamed twin b283, so the two spellings cannot
    * drift (the b264/b274 shared-tail convention). */
  private[graft] def cusumFromDaily(daily: DataFrame): DataFrame = {
    val sp = daily.sparkSession
    import sp.implicits._
    import org.apache.spark.sql.expressions.Window
    val st = daily.agg(
        expr("sum(n) div count(*)").as("mu"),
        expr("(sum(n) div count(*)) div " + AllowanceDiv).as("k"),
        expr(s"$ThresholdMul * (sum(n) div count(*))").as("h"))
      .localCheckpoint(true)
    val legs = Seq("clean", "shift_down", "shift_up").toDF("leg")
    val dirs = Seq(1L, -1L).toDF("sign")
    val w = Window.partitionBy(col("leg"), col("sign"))
      .orderBy(col("day_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .crossJoin(broadcast(legs)).crossJoin(broadcast(dirs))
      .select(col("leg"), col("sign"), col("day_id"),
        expr(s"""CASE leg
                 |  WHEN 'shift_up' THEN
                 |    CASE WHEN day_id >= $PlantFromDay THEN n * 2 ELSE n END
                 |  WHEN 'shift_down' THEN
                 |    CASE WHEN day_id >= $PlantFromDay THEN n div 2 ELSE n END
                 |  ELSE n END""".stripMargin).as("x"))
      .crossJoin(broadcast(st))
      .withColumn("y", expr("sign * (x - mu) - k"))
      .withColumn("p", sum(col("y")).over(w))
      .withColumn("s",
        col("p") - least(lit(0L), min(col("p")).over(w)))
      .groupBy("leg", "sign")
      .agg(max(col("s")).cast("long").as("max_s"),
        coalesce(min(when(col("s") > col("h"), col("day_id"))), lit(-1L))
          .cast("long").as("first_alarm"),
        sum(when(col("s") > col("h"), 1L).otherwise(0L)).as("n_alarm_days"))
      .select(col("leg"), col("sign").cast("long").as("dir"),
        col("max_s"), col("first_alarm"), col("n_alarm_days"))
      .orderBy("leg", "dir")
  }

  private val b276 = entry("b276_cusum_changepoint", cusumOracleSql) {
    (s, d) =>
    cusumFromDaily(Tables.events(s, d)
      .groupBy(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
        " AS BIGINT)").as("day_id"))
      .agg(count(lit(1)).as("n")))
  }

  /** Seasonal period for the seasonal-naive forecaster: weekly. */
  val SeasonDays = 7L

  /** B277 — FORECAST BACKTEST (Hyndman & Athanasopoulos, "Forecasting:
    * Principles and Practice" §5.8 — the expanding-window backtest every
    * demand-forecast pipeline runs before trusting a model, scored
    * against the baselines any candidate must beat): over the daily
    * purchase-revenue series, three leakage-free one-step forecasters —
    * `naive` (yesterday), `snaive` (same weekday last week, the seasonal
    * baseline) and `mean` (expanding mean of all PRIOR days, integer
    * floor) — each evaluated on every day where all three are defined
    * (t ≥ [[SeasonDays]]), reporting per model the eval count, total and
    * mean absolute error in cents, and WINS (days where the model's
    * error ties the per-day minimum — ties credit every minimal model,
    * spelled identically in both engines).
    *
    * Leakage-freedom is structural: every forecast reads strictly
    * `1 PRECEDING`-bounded frames, so the backtest cannot peek at the
    * day it scores — the protocol property (b140's split-leakage rule,
    * time-series edition), pinned by ForecastSpec's JVM replay.
    *
    * Integer-exact: revenue in cents, MAE by floor division, win counts.
    *
    * Scale posture: ONE map-combinable day aggregate over purchases;
    * all forecast/error windows run over the |days| rollup (bounded —
    * the b125 exception); the model rollup is O(models). */
  private val b277 = entry(
    "b277_forecast_backtest",
    s"""WITH daily AS (
       |  SELECT CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
       |              AS BIGINT) AS d,
       |         CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |f AS (
       |  SELECT d, cents,
       |         lag(cents, 1) OVER (ORDER BY d) AS f_naive,
       |         lag(cents, $SeasonDays) OVER (ORDER BY d) AS f_snaive,
       |         sum(cents) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
       |                          PRECEDING AND 1 PRECEDING)
       |           // count(*) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
       |                             PRECEDING AND 1 PRECEDING) AS f_mean
       |  FROM daily),
       |e AS (
       |  SELECT d, abs(cents - f_naive) AS e_naive,
       |         abs(cents - f_snaive) AS e_snaive,
       |         abs(cents - f_mean) AS e_mean
       |  FROM f WHERE f_snaive IS NOT NULL),
       |em AS (SELECT *, least(e_naive, e_snaive, e_mean) AS e_min FROM e),
       |models AS (
       |  SELECT 'mean' AS model, count(*) AS n_evals,
       |         sum(e_mean) AS sae, sum(e_mean) // count(*) AS mae_cents,
       |         sum(CASE WHEN e_mean = e_min THEN 1 ELSE 0 END) AS wins
       |  FROM em
       |  UNION ALL
       |  SELECT 'naive', count(*), sum(e_naive), sum(e_naive) // count(*),
       |         sum(CASE WHEN e_naive = e_min THEN 1 ELSE 0 END)
       |  FROM em
       |  UNION ALL
       |  SELECT 'snaive', count(*), sum(e_snaive),
       |         sum(e_snaive) // count(*),
       |         sum(CASE WHEN e_snaive = e_min THEN 1 ELSE 0 END)
       |  FROM em)
       |SELECT model, CAST(n_evals AS BIGINT) AS n_evals,
       |       CAST(sae AS BIGINT) AS sae_cents,
       |       CAST(mae_cents AS BIGINT) AS mae_cents,
       |       CAST(wins AS BIGINT) AS wins
       |FROM models ORDER BY model""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
        " AS BIGINT)").as("d"))
      .agg(expr("CAST(sum(floor(value * 100 + 0.5)) AS BIGINT)").as("cents"))
    val ord = Window.orderBy(col("d"))
    val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
    val e = daily
      .withColumn("f_naive", lag(col("cents"), 1).over(ord))
      .withColumn("f_snaive", lag(col("cents"), SeasonDays.toInt).over(ord))
      .withColumn("psum", sum(col("cents")).over(prior))
      .withColumn("pcnt", count(lit(1)).over(prior))
      .withColumn("f_mean", expr("psum div pcnt"))
      .filter(col("f_snaive").isNotNull)
      .select(col("d"),
        abs(col("cents") - col("f_naive")).as("e_naive"),
        abs(col("cents") - col("f_snaive")).as("e_snaive"),
        abs(col("cents") - col("f_mean")).as("e_mean"))
      .withColumn("e_min",
        least(col("e_naive"), col("e_snaive"), col("e_mean")))
      .localCheckpoint(true) // 23 rows feeding three rollups
    def model(name: String, err: String) = e.agg(
        count(lit(1)).as("n_evals"),
        sum(col(err)).as("sae_cents"),
        expr(s"sum($err) div count(*)").as("mae_cents"),
        sum(when(col(err) === col("e_min"), 1L).otherwise(0L)).as("wins"))
      .select(lit(name).as("model"), col("n_evals"),
        col("sae_cents").cast("long").as("sae_cents"),
        col("mae_cents").cast("long").as("mae_cents"), col("wins"))
    model("mean", "e_mean")
      .unionByName(model("naive", "e_naive"))
      .unionByName(model("snaive", "e_snaive"))
      .orderBy("model")
  }

  val entries: Seq[Entry] = Seq(b276, b277)
}
