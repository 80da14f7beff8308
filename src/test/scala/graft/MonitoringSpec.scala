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

  test("B294: both trend estimators replay in the JVM; the planted " +
    "outlier day drags OLS while the Theil-Sen median barely moves") {
    val C = graft.operators.ChangepointOps
    val got = SparkEntry.queries("b294_theil_sen_trend")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // independent day series: purchase cents per day
    val cents = graft.sources.Tables.events(spark, sf)
      .filter("event_type = 'purchase'").select("ts", "value").collect()
      .map(r => (dayId(r.getTimestamp(0)),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def replay(leg: String): (Long, Long, Long) = {
      val series = cents.toSeq.map { case (d, v) =>
        (d, if (leg == "outlier_plant" && d == C.TsPlantDay)
          v * C.TsOutlierMul else v)
      }.sortBy(_._1)
      val slopes = (for {
        (da, va) <- series; (db, vb) <- series if da < db
      } yield ((vb - va) * 10000L / (db - da), da, db)).sorted
      val tsSlope = slopes((slopes.size + 1) / 2 - 1)._1
      val n = series.size.toLong
      val sd = series.map(_._1).sum; val sv = series.map(_._2).sum
      val sdv = series.map(p => p._1 * p._2).sum
      val sdd = series.map(p => p._1 * p._1).sum
      val ols = (n * sdv - sd * sv) * 10000L / (n * sdd - sd * sd)
      (n, tsSlope, ols)
    }
    for (leg <- Seq("clean", "outlier_plant"))
      assert(got(leg) == replay(leg), s"$leg diverges from JVM replay")
    // the robustness contract the operator exists for: the plant moves
    // OLS at least 10x more than it moves the Theil-Sen median
    val dTs = math.abs(got("outlier_plant")._2 - got("clean")._2)
    val dOls = math.abs(got("outlier_plant")._3 - got("clean")._3)
    assert(dOls > 10 * math.max(1L, dTs),
      s"contrast too weak: dOls=$dOls dTs=$dTs")
  }

  /** Literal pool-adjacent-violators on exact rationals (pos/n),
    * comparisons by cross-multiplication — the independent referee for
    * every minimax-isotonic entry. */
  private def pavReferee(out: Array[(Long, Long, Long, Long, Long)]): Unit = {
    case class Blk(bs: List[Long], pos: Long, n: Long)
    var stack = List.empty[Blk]
    for ((b, n, pos, _, _) <- out) {
      var cur = Blk(List(b), pos, n)
      while (stack.nonEmpty &&
        stack.head.pos * cur.n >= cur.pos * stack.head.n) {
        val prev = stack.head
        stack = stack.tail
        cur = Blk(prev.bs ++ cur.bs, prev.pos + cur.pos, prev.n + cur.n)
      }
      stack = cur :: stack
    }
    val pav = stack.reverse.flatMap(blk =>
      blk.bs.map(_ -> blk.pos * 10000L / blk.n)).toMap
    for ((b, _, _, _, calBp) <- out)
      assert(calBp == pav(b), s"bucket $b: minimax $calBp != PAV ${pav(b)}")
    out.sliding(2).foreach {
      case Array(a, c) => assert(a._5 <= c._5, s"not monotone at ${c._1}")
      case _ =>
    }
    assert(out.exists(r => r._4 != r._5),
      "fixture forced no pooling — the operator is untested here")
  }

  private def calOutput(name: String): Array[(Long, Long, Long, Long, Long)] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)

  test("B296: the minimax spelling equals a literal pooling PAV (floored " +
    "to bp), the fit is monotone, and the fixture really forces pooling") {
    pavReferee(calOutput("b296_isotonic_calibration"))
  }

  test("B297: the quality-survival calibration passes the same PAV " +
    "referee, and the flat-noisy fixture pools into wide blocks (the " +
    "honest non-predictiveness reading)") {
    val out = calOutput("b297_quality_calibration")
    pavReferee(out)
    // survival is dominated by dedup/decontamination, not the lexical
    // score: the calibrated curve must be nearly flat (span << raw span)
    val calSpan = out.map(_._5).max - out.map(_._5).min
    val rawSpan = out.map(_._4).max - out.map(_._4).min
    assert(calSpan * 2 <= rawSpan,
      s"calibrated span $calSpan vs raw span $rawSpan — pooling too weak")
  }
}
