package graft.operators

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

  private val b276 = entry(
    "b276_cusum_changepoint",
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
       |GROUP BY leg, sign ORDER BY leg, dir""".stripMargin) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
        " AS BIGINT)").as("day_id"))
      .agg(count(lit(1)).as("n"))
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

  val entries: Seq[Entry] = Seq(b276)
}
