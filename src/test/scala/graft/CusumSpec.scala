package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ChangepointOps

/** B276 CUSUM changepoint detection: the prefix-min identity vs the
  * literal max-recursion, a full JVM replay of all six (leg, dir) rows,
  * and the planted-shift localization contract. */
class CusumSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  /** The literal Page recursion. */
  private def cusumRec(xs: Seq[Long], mu: Long, k: Long, sign: Long)
      : Seq[Long] = {
    var s = 0L
    xs.map { x => s = math.max(0L, s + sign * (x - mu) - k); s }
  }

  /** The window spelling: P_t − min(0, min_{j≤t} P_j). */
  private def cusumPrefix(xs: Seq[Long], mu: Long, k: Long, sign: Long)
      : Seq[Long] = {
    var p = 0L
    var mn = 0L
    xs.map { x =>
      p += sign * (x - mu) - k
      val s = p - math.min(0L, math.min(mn, p))
      mn = math.min(mn, p)
      s
    }
  }

  test("the prefix-min identity equals the literal recursion on" +
    " adversarial series") {
    val cases = Seq(
      Seq(5L, 5L, 5L, 5L),                       // flat
      Seq(0L, 20L, 0L, 20L, 0L),                 // oscillating
      Seq(10L, 10L, 1L, 1L, 1L, 30L, 30L, 30L),  // down then up
      Seq(30L, 1L, 30L, 1L, 30L),                // alternating extremes
      Seq(1L, 2L, 3L, 4L, 50L, 50L, 50L))        // ramp into shift
    for (xs <- cases; mu <- Seq(5L, 10L); k <- Seq(0L, 1L, 3L);
         sign <- Seq(1L, -1L)) {
      assert(cusumPrefix(xs, mu, k, sign) === cusumRec(xs, mu, k, sign),
        s"xs=$xs mu=$mu k=$k sign=$sign")
    }
  }

  test("all six (leg, dir) rows replay in the JVM from the daily counts" +
    " via the literal recursion; clean is quiet, each plant fires" +
    " EXACTLY its own direction at/after the plant day") {
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
        " AS BIGINT)").as("d"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    val xs = daily.map(_._2)
    val days = daily.map(_._1)
    val mu = xs.sum / xs.length
    val k = mu / ChangepointOps.AllowanceDiv
    val h = ChangepointOps.ThresholdMul * mu
    def plantUp(x: (Long, Long)) =
      if (x._1 >= ChangepointOps.PlantFromDay) x._2 * 2 else x._2
    def plantDown(x: (Long, Long)) =
      if (x._1 >= ChangepointOps.PlantFromDay) x._2 / 2 else x._2
    val legs = Map(
      "clean" -> xs,
      "shift_up" -> daily.map(plantUp),
      "shift_down" -> daily.map(plantDown))
    val expected = (for ((leg, series) <- legs; sign <- Seq(-1L, 1L)) yield {
      val s = cusumRec(series.toSeq, mu, k, sign)
      val alarms = days.zip(s).filter(_._2 > h)
      (leg, sign) -> (s.max, alarms.headOption.map(_._1).getOrElse(-1L),
        alarms.length.toLong)
    }).toMap
    val got = SparkEntry.queries("b276_cusum_changepoint")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expected)
    // detection contract: clean quiet both ways; each shift fires exactly
    // its own direction, localized no earlier than the plant day
    assert(got(("clean", 1L))._3 === 0L)
    assert(got(("clean", -1L))._3 === 0L)
    assert(got(("shift_up", 1L))._3 > 0L)
    assert(got(("shift_up", -1L))._3 === 0L)
    assert(got(("shift_down", -1L))._3 > 0L)
    assert(got(("shift_down", 1L))._3 === 0L)
    assert(got(("shift_up", 1L))._2 >= ChangepointOps.PlantFromDay)
    assert(got(("shift_down", -1L))._2 >= ChangepointOps.PlantFromDay)
  }
}
