package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ChangepointOps

/** B277 forecast backtest: full JVM replay from the daily series, the
  * leakage-freedom property (shifting a future value never changes a
  * past forecast), and the tie-credit win rule. */
class ForecastSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private def backtest(xs: Seq[Long])
      : Map[String, (Long, Long, Long, Long)] = {
    val period = ChangepointOps.SeasonDays.toInt
    val evals = (period until xs.length).map { t =>
      val f = Map(
        "naive" -> xs(t - 1),
        "snaive" -> xs(t - period),
        "mean" -> xs.take(t).sum / t)
      f.map { case (m, v) => m -> math.abs(xs(t) - v) }
    }
    Seq("mean", "naive", "snaive").map { m =>
      val errs = evals.map(_(m))
      val wins = evals.count(e => e(m) == e.values.min)
      m -> (evals.length.toLong, errs.sum, errs.sum / evals.length,
        wins.toLong)
    }.toMap
  }

  private lazy val daily = graft.sources.Tables.events(spark, sf)
    .filter(col("event_type") === "purchase")
    .groupBy(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
      " AS BIGINT)").as("d"))
    .agg(expr("CAST(sum(floor(value * 100 + 0.5)) AS BIGINT)").as("cents"))
    .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)

  test("all three models replay in the JVM from the daily series") {
    // the fixture is day-dense, so row-lag == day-lag
    assert(daily.map(_._1) === (daily.head._1 to daily.last._1),
      "fixture days not dense — row-lag forecasts would drift from day-lag")
    val expected = backtest(daily.map(_._2).toSeq)
    val got = SparkEntry.queries("b277_forecast_backtest")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expected)
    // the backtest must discriminate: not all models tie on MAE
    assert(got.values.map(_._3).toSeq.distinct.length > 1,
      "all models equal MAE — the backtest is vacuous")
    // tie-credit rule: wins sum to >= n_evals (every day credits >= 1)
    val n = got.values.head._1
    assert(got.values.map(_._4).sum >= n)
  }

  test("leakage-freedom: perturbing day t changes NO forecast before" +
    " t + 1 (the expanding-window protocol property)") {
    val xs = daily.map(_._2).toSeq
    val t = xs.length - 3
    val bumped = xs.updated(t, xs(t) + 1000000L)
    val period = ChangepointOps.SeasonDays.toInt
    def forecasts(series: Seq[Long]) =
      (period until series.length).map { i =>
        (i, series(i - 1), series(i - period), series.take(i).sum / i)
      }
    val (a, b) = (forecasts(xs), forecasts(bumped))
    for (((i, n1, s1, m1), (_, n2, s2, m2)) <- a.zip(b) if i <= t) {
      assert(n1 === n2 && s1 === s2 && m1 === m2,
        s"forecast at day $i saw the future perturbation at day $t")
    }
    assert(a.zip(b).exists { case ((i, n1, s1, m1), (_, n2, s2, m2)) =>
      i > t && (n1 != n2 || s1 != s2 || m1 != m2)
    }, "the perturbation never reached any later forecast — vacuous")
  }

  test("B298: the conformal quantile and observed coverage replay in the " +
    "JVM; calibration days strictly precede test days (split leakage-free)") {
    val C = ChangepointOps
    val got = SparkEntry.queries("b298_conformal_forecast")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    val period = C.SeasonDays.toInt
    val xs = daily.map(_._2)
    val ds = daily.map(_._1)
    val rows = (period until xs.length).map { t =>
      (ds(t), Map(
        "naive" -> math.abs(xs(t) - xs(t - 1)),
        "snaive" -> math.abs(xs(t) - xs(t - period)),
        "mean" -> math.abs(xs(t) - xs.take(t).sum / t)))
    }
    val d0 = rows.map(_._1).min
    val d1 = rows.map(_._1).max
    val t0 = d0 + (d1 - d0) * C.ConformalCalNum / C.ConformalCalDen
    for (m <- Seq("mean", "naive", "snaive")) {
      val cal = rows.filter(_._1 < t0).map(r => (r._2(m), r._1)).sorted
      val n = cal.size.toLong
      val k = math.min(
        ((n + 1) * (10000L - C.ConformalAlphaBp) + 9999) / 10000, n).toInt
      val q = cal(k - 1)._1
      val tst = rows.filter(_._1 >= t0).map(_._2(m))
      val covered = tst.count(_ <= q).toLong
      assert(got(m) == ((n, q, tst.size.toLong, covered,
        covered * 10000 / tst.size)), s"$m diverges from the JVM replay")
      assert(q > 0 && tst.nonEmpty, s"$m: degenerate split")
    }
  }
}
