package graft

import org.scalatest.funsuite.AnyFunSuite

/** B287 SLO burn-rate alerts + B288 Kaplan-Meier retention: JVM replays
  * and the planted-leg contracts (incident pages exactly inside its
  * window; attrition bends the survival curve the clean leg cannot). */
class MonitoringSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private def dayId(ts: java.sql.Timestamp): Long = {
    val d = ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
    java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(2024, 1, 1), d)
  }

  private lazy val events = graft.sources.Tables.events(spark, sf)
    .select("user_id", "ts", "event_type").collect()
    .map(r => (r.getLong(0), dayId(r.getTimestamp(1)), r.getString(2)))

  test("B287: burns replay in the JVM; the incident leg pages exactly " +
    "inside its window and the clean leg never pages") {
    val C = graft.operators.ChangepointOps
    val got = SparkEntry.queries("b287_slo_burn_alerts")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val daily = events.groupBy(_._2).view.mapValues { es =>
      (es.length.toLong, es.count(_._3 == "error").toLong)
    }.toMap
    val baseBp = daily.values.map(_._2).sum * 10000L /
      daily.values.map(_._1).sum
    val days = daily.keys.toSeq.sorted
    for (leg <- Seq("clean", "incident")) {
      def shaped(d: Long): (Long, Long) = {
        val (tot, bad) = daily(d)
        if (leg == "incident" && d >= C.IncidentFromDay &&
          d <= C.IncidentToDay)
          (tot + (C.IncidentMul - 1) * bad, C.IncidentMul * bad)
        else (tot, bad)
      }
      days.zipWithIndex.foreach { case (d, i) =>
        val win = days.slice(math.max(0, i - 2), i + 1).map(shaped)
        val (tot1, bad1) = shaped(d)
        val burn1 = bad1 * 10000L / tot1 * 10000L / baseBp
        val burn3 = win.map(_._2).sum * 10000L / win.map(_._1).sum *
          10000L / baseBp
        val page =
          if (burn1 >= C.FastBurnBp && burn3 >= C.SlowBurnBp) 1L else 0L
        assert(got((leg, d)) === ((burn1, burn3, page)),
          s"($leg, day $d) diverges from the JVM replay")
      }
    }
    // the alert contract: clean leg silent, incident leg pages inside
    // [from, to] (the 3-day window may legitimately extend a page past
    // the incident end — fast burn cannot fire outside it)
    got.foreach { case ((leg, d), (_, _, page)) =>
      if (leg == "clean") assert(page === 0L, s"clean leg paged on day $d")
      if (leg == "incident" && (d < C.IncidentFromDay || d > C.IncidentToDay))
        assert(page === 0L, s"incident leg paged outside the window: $d")
    }
    val paged = got.collect { case ((l, d), (_, _, 1L)) if l == "incident" => d }
    assert(paged.nonEmpty, "the planted incident never paged")
  }

  test("B288: the KM table replays in the JVM (risk sets, deaths," +
    " censoring, the exp-sum-ln product) and the attrition plant bends" +
    " the curve") {
    val C = graft.operators.ChangepointOps
    val M = graft.operators.PrivacyOps.UniformM
    val K = graft.operators.PrivacyOps.Knuth
    val got = SparkEntry.queries("b288_retention_survival")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val byUser = events.groupBy(_._1).view.mapValues { es =>
      (es.map(_._2).min, es.map(_._2).max)
    }.toMap
    val h = byUser.values.map(_._2).max
    val lt0 = byUser.toSeq.map { case (u, (d0, d1)) =>
      val churn = ((graft.llm.Winnowing.polyFoldString(s"km:$u") % M) * K) %
        M % C.ChurnMod
      (u, d1 - d0, if (d1 >= h - C.CensorMarginDays) 1L else 0L, churn)
    }
    for (leg <- Seq("clean", "attrited")) {
      val lt = lt0.map { case (_, tReal, censReal, churn) =>
        if (leg == "attrited" && churn <= tReal) (churn, 0L)
        else (tReal, censReal)
      }
      val n = lt.length.toLong
      val ts = lt.map(_._1).distinct.sorted
      var exited = 0L
      var sumLn = 0.0
      var dead = false
      ts.foreach { t =>
        val here = lt.filter(_._1 == t)
        val d = here.count(_._2 == 0L).toLong
        val c = here.count(_._2 == 1L).toLong
        val nRisk = n - exited
        exited += here.length.toLong
        if (d == nRisk) dead = true else sumLn += math.log(1.0 - d.toDouble / nRisk)
        val surv = if (dead) 0.0
          else BigDecimal(math.exp(sumLn))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got((leg, t)) === ((nRisk, d, c, surv)),
          s"($leg, t=$t) diverges from the JVM replay")
      }
    }
    // the plant's teeth: clean leg has zero deaths (every user active to
    // the horizon on this fixture), the attrited leg has deaths AND
    // censored exits and a strictly decreasing curve
    val clean = got.collect { case ((l, t), v) if l == "clean" => v }
    assert(clean.forall(_._2 == 0L) && clean.forall(_._4 == 1.0))
    val att = got.toSeq.collect { case ((l, t), v) if l == "attrited" => (t, v) }
      .sortBy(_._1)
    assert(att.map(_._2._2).sum > 0, "attrited leg has no deaths")
    assert(att.map(_._2._3).sum > 0, "attrited leg has no censoring")
    att.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2._4 <= a._2._4, s"survival increases at t=${b._1}")
    case _ => }
  }
}
