package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PrivacyOps

/** B262 k-anonymity ladder: full JVM replay of every level's class
  * statistics, the chain's monotonicity laws, and the chosen-level
  * rule. */
class PrivacyOpsSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private lazy val rows = SparkEntry
    .queries("b262_kanon_generalization")(spark, sf).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)))
    .sortBy(_._1)

  private lazy val cust = graft.sources.Tables.customer(spark, sf)
    .selectExpr("c_nationkey", "c_mktsegment",
      "CAST(floor(c_acctbal) AS BIGINT) div 500 AS band")
    .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))

  test("every level's class statistics replay in the JVM") {
    val keyFns: Seq[((Int, String, Long)) => Any] = Seq(
      t => (t._1, t._2, t._3), t => (t._1, t._2), t => t._2, _ => 0)
    for (((lv, _, nCls, minK, vCls, vRows, _), keyOf) <- rows.zip(keyFns)) {
      val classes = cust.groupBy(keyOf).map(_._2.length.toLong).toSeq
      assert(nCls === classes.length.toLong, s"L$lv n_classes")
      assert(minK === classes.min, s"L$lv min_k")
      assert(vCls === classes.count(_ < PrivacyOps.K).toLong, s"L$lv viol_classes")
      assert(vRows === classes.filter(_ < PrivacyOps.K).sum, s"L$lv viol_rows")
    }
  }

  test("the ladder is a chain: min_k nondecreasing, violation mass" +
    " nonincreasing as the QI coarsens; L0 violates; L3 is always safe") {
    for (i <- 0 until 3) {
      assert(rows(i)._4 <= rows(i + 1)._4, s"min_k not monotone at L$i")
      assert(rows(i)._6 >= rows(i + 1)._6, s"viol_rows not monotone at L$i")
    }
    assert(rows(0)._6 > 0, "L0 never violates — the ladder walk is vacuous")
    assert(rows(3)._6 === 0L)
  }

  test("B266: l-diversity classes replay in the JVM; homogeneous classes" +
    " exist without being universal (both directions observable)") {
    val got = SparkEntry.queries("b266_ldiversity_audit")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val raw = graft.sources.Tables.customer(spark, sf)
      .selectExpr("c_nationkey",
        "CAST(floor(c_acctbal) AS BIGINT) div 500 AS band", "c_mktsegment")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getString(2)))
    val want = raw.groupBy(_._1).map { case (key, rs) =>
      key -> (rs.length.toLong, rs.map(_._2).distinct.length.toLong) }
    assert(got.keySet === want.keySet)
    for ((key, (k, l, kv, lv)) <- got) {
      assert((k, l) === want(key), s"class $key")
      assert(kv === (if (k < PrivacyOps.K) 1L else 0L))
      assert(lv === (if (l < PrivacyOps.L) 1L else 0L))
    }
    val lViol = got.values.count(_._4 == 1L)
    assert(lViol > 0, "no homogeneous class — the l rule is vacuous")
    assert(lViol < got.size, "every class homogeneous — degenerate")
  }

  test("B267: t-closeness TVD replays in the JVM (dense grid incl." +
    " missing segments) and the threshold binds in both directions") {
    val got = SparkEntry.queries("b267_tcloseness_audit")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val raw = graft.sources.Tables.customer(spark, sf)
      .selectExpr("c_nationkey",
        "CAST(floor(c_acctbal) AS BIGINT) div 500 AS band", "c_mktsegment")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getString(2)))
    val gt = raw.length.toLong
    val gs = raw.groupBy(_._2).map { case (s2, rs) => s2 -> rs.length.toLong }
    val byCls = raw.groupBy(_._1)
    assert(got.keySet === byCls.keySet)
    for ((key, rs) <- byCls) {
      val k = rs.length.toLong
      val cnt = rs.groupBy(_._2).map { case (s2, xs) => s2 -> xs.length.toLong }
      val sdev = gs.map { case (s2, g) =>
        math.abs(cnt.getOrElse(s2, 0L) * gt - g * k) }.sum
      val tvd = sdev * 10000L / (2L * k * gt)
      val (gk, gtvd, gviol) = got(key)
      assert(gk === k, s"class $key k")
      assert(gtvd === tvd, s"class $key tvd")
      assert(gviol === (if (tvd > PrivacyOps.TClosenessBp) 1L else 0L))
    }
    val viol = got.values.count(_._3 == 1L)
    assert(viol > 0 && viol < got.size,
      s"t-closeness threshold degenerate: $viol of ${got.size}")
  }

  test("chosen marks EXACTLY the finest level with zero violation mass") {
    val chosen = rows.filter(_._7 == 1L)
    assert(chosen.length === 1)
    val lv = chosen.head._1
    assert(chosen.head._6 === 0L)
    for (r <- rows if r._1 < lv) assert(r._6 > 0L,
      s"level ${r._1} below the chosen one is already safe")
  }

  // ---- B268: the geometric mechanism's distribution + accounting ----

  private val M = PrivacyOps.UniformM

  /** Independent JVM spelling of the frozen inverse CDF — the replay
    * twin of geomNoiseLadder's generation arithmetic. */
  private def jvmNoise(u: Long, epsBp: Long): Int = {
    val alpha = math.exp(-epsBp.toDouble / 10000.0)
    def cdf(k: Int): Double =
      if (k < 0) math.pow(alpha, -k) / (1 + alpha)
      else 1.0 - math.pow(alpha, k + 1) / (1 + alpha)
    val kCap = math.ceil(math.log(M.toDouble) * 10000.0 / epsBp).toInt + 1
    (-kCap until kCap)
      .find(k => u < math.floor(cdf(k) * M).toLong)
      .getOrElse(kCap)
  }

  private def ladderOverGrid(epsBp: Long): Map[Int, Long] = {
    val stride = 21475L // ~1e5 samples spanning [0, 2^31)
    spark.range(100000)
      .selectExpr(s"id * $stride AS u")
      .selectExpr(s"${PrivacyOps.geomNoiseLadder("u", epsBp)} AS noise")
      .groupBy("noise").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  test("B268: the released table replays in the JVM — chosen-level class" +
    " counts + seeded geometric noise, clamped, true counts absent") {
    val got = SparkEntry.queries("b268_dp_release")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).distinct.length === got.length,
      "class keys must be unique — parallel composition needs disjointness")
    // chosen level from the b262 rows already replayed above
    val lv = rows.filter(_._7 == 1L).head._1.toInt
    val keyOf: ((Int, String, Long)) => String = lv match {
      case 0 => t => s"${t._1}|${t._2}|${t._3}"
      case 1 => t => s"${t._1}|${t._2}"
      case 2 => t => t._2
      case _ => _ => "*"
    }
    val want = cust.groupBy(keyOf).map { case (key, rs) =>
      val n = rs.length.toLong
      val h = graft.llm.Winnowing.polyFoldString("dp:" + key)
      val u = ((h % M) * 2654435761L) % M
      key -> math.max(0L, n + jvmNoise(u, PrivacyOps.EpsBp))
    }
    assert(got.map { case (k, (rel, _)) => k -> rel }.toMap === want)
    assert(got.forall(_._2._2 === PrivacyOps.EpsBp),
      "every row carries the one release budget (parallel composition)")
    // the release must actually be noised somewhere at this SF
    val true_ = cust.groupBy(keyOf).map { case (k, rs) => k -> rs.length.toLong }
    assert(got.exists { case (k, (rel, _)) => rel != true_(k) },
      "zero noise everywhere — the mechanism is vacuous on this fixture")
  }

  test("B268: the frozen ladder's empirical pmf matches the two-sided" +
    " geometric within grid tolerance; median noise is 0; symmetric") {
    val epsBp = PrivacyOps.EpsBp
    val alpha = math.exp(-epsBp.toDouble / 10000.0)
    val counts = ladderOverGrid(epsBp)
    val total = counts.values.sum.toDouble
    def pmf(k: Int): Double =
      (1 - alpha) / (1 + alpha) * math.pow(alpha, math.abs(k))
    for (k <- -5 to 5) {
      val emp = counts.getOrElse(k, 0L) / total
      assert(math.abs(emp - pmf(k)) < 1e-3,
        s"noise=$k empirical $emp vs theory ${pmf(k)}")
    }
    val mean = counts.map { case (k, c) => k.toDouble * c }.sum / total
    assert(math.abs(mean) < 0.01, s"asymmetric noise: mean $mean")
    val zeroShare = counts.getOrElse(0, 0L) / total
    assert(zeroShare > 0.4, "median must be zero noise at eps=1")
  }

  test("B273: the consistent DP histogram replays in the JVM; the" +
    " monotone repair fires on real dips and the released series honors" +
    " the cumulative contract") {
    val trueCounts = graft.sources.Tables.orders(spark, sf)
      .selectExpr("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)" +
        " AS d")
      .groupBy("d").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // independent JVM replay: seeded noise -> prefix -> monotone+clamp
    var prefix = 0L
    var lastMono = 0L
    var negBins = 0
    var repairs = 0
    val expected = trueCounts.map { case (d, n) =>
      val h = graft.llm.Winnowing.polyFoldString("dph:" + d)
      val u = ((h % M) * 2654435761L) % M
      val noisy = n + jvmNoise(u, PrivacyOps.EpsBp)
      if (noisy < 0) negBins += 1
      prefix += noisy
      val mono = math.max(lastMono, math.max(0L, prefix))
      if (math.max(0L, prefix) < lastMono) repairs += 1
      val released = mono - lastMono
      lastMono = mono
      d -> (released, mono)
    }.toMap
    val got = SparkEntry.queries("b273_dp_histogram")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
    // the repair must BITE at this SF (97 negative noisy bins / 157
    // repairs measured at sf0.001) — otherwise the consistency step is
    // vacuous and the row proves nothing
    assert(negBins > 0 && repairs > 0,
      s"post-processing never fired ($negBins neg bins, $repairs repairs)")
    // cumulative contract: nondecreasing, nonnegative, diffs reassemble
    val byDay = got.toSeq.sortBy(_._1)
    assert(byDay.forall(_._2._1 >= 0L), "negative released count")
    val cums = byDay.map(_._2._2)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b },
      "released cumulative not monotone")
    assert(byDay.map(_._2._1).sum === cums.last,
      "released counts do not reassemble the final cumulative")
  }

  test("B268: noise magnitude is monotone in the budget — bigger eps," +
    " tighter release (the accounting direction a DP engine must get" +
    " right)") {
    val meanAbs = Seq(2500L, 5000L, 10000L, 20000L).map { eps =>
      val counts = ladderOverGrid(eps)
      val total = counts.values.sum.toDouble
      eps -> counts.map { case (k, c) => math.abs(k).toDouble * c }.sum / total
    }
    for (Seq((e1, m1), (e2, m2)) <- meanAbs.sliding(2)) {
      assert(m1 > m2, s"mean |noise| not decreasing from eps=$e1 ($m1)" +
        s" to eps=$e2 ($m2)")
    }
    // and the theoretical magnitude 2α/(1-α²) is reproduced at eps=1
    val alpha = math.exp(-1.0)
    val want = 2 * alpha / (1 - alpha * alpha)
    val at1 = meanAbs.find(_._1 == 10000L).get._2
    assert(math.abs(at1 - want) < 0.01, s"E|noise| $at1 vs theory $want")
  }

  // ---- B280: report-noisy-max median selection ----

  /** JVM replay of the whole B280 pipeline over an in-memory band
    * multiset: fixed grid, rank utility, seeded noise at eps/2,
    * (score, band) argmax. */
  private def jvmDpMedian(bands: Seq[Long], epsBp: Long): Long = {
    val n = bands.length.toLong
    val grid = PrivacyOps.MedianBandLo to PrivacyOps.MedianBandHi
    grid.map { cand =>
      val cum = bands.count(_ <= cand).toLong
      val u = -math.abs(2 * cum - n)
      val key = s"dpm:$epsBp:$cand"
      val uu = ((graft.llm.Winnowing.polyFoldString(key) % M) *
        PrivacyOps.Knuth) % M
      (cand, u + jvmNoise(uu, epsBp / 2))
    }.maxBy { case (cand, score) => (score, -cand) }._1
    // maxBy tie-break: highest score, then LOWEST band — the row_number
    // (score DESC, cand ASC) spelling
  }

  test("B280: the released medians replay in the JVM end-to-end" +
    " (grid, rank utility, seeded noise at eps/2, argmax tie-break)") {
    val got = SparkEntry.queries("b280_dp_median")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.map(_._1).toSeq === PrivacyOps.MedianEpsBp)
    val bands = graft.sources.Tables.customer(spark, sf)
      .selectExpr("CAST(floor(c_acctbal) AS BIGINT) div 500 AS band")
      .collect().map(_.getLong(0)).toSeq
    for ((eps, released) <- got)
      assert(released === jvmDpMedian(bands, eps),
        s"release at eps=$eps diverges from the JVM replay")
  }

  test("B280: the rank utility has sensitivity 1 — one record moves" +
    " every candidate's utility by at most 1 (the accounting premise)") {
    val rnd = new scala.util.Random(280)
    val base = Seq.fill(60)(PrivacyOps.MedianBandLo +
      rnd.nextInt((PrivacyOps.MedianBandHi - PrivacyOps.MedianBandLo).toInt + 1).toLong)
    def utilities(bands: Seq[Long]): Seq[Long] = {
      val n = bands.length.toLong
      (PrivacyOps.MedianBandLo to PrivacyOps.MedianBandHi).map { cand =>
        -math.abs(2 * bands.count(_ <= cand).toLong - n)
      }
    }
    val u0 = utilities(base)
    // adding any possible record...
    for (add <- PrivacyOps.MedianBandLo to PrivacyOps.MedianBandHi) {
      val u1 = utilities(base :+ add)
      u0.zip(u1).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1, s"sensitivity > 1 adding band $add")
      }
    }
    // ...or removing one
    val u2 = utilities(base.tail)
    u0.zip(u2).foreach { case (a, b) => assert(math.abs(a - b) <= 1) }
  }

  test("B280: at a generous budget the mechanism concentrates on the" +
    " true median band (utility dominates the eps/2 noise)") {
    val bands = graft.sources.Tables.customer(spark, sf)
      .selectExpr("CAST(floor(c_acctbal) AS BIGINT) div 500 AS band")
      .collect().map(_.getLong(0)).toSeq.sorted
    val trueMedian = bands(bands.length / 2)
    // at eps = 10 (eps/2 = 5) noise is within ±5 w.p. ~1-1e-10; the
    // utility gap between the median band and its neighbours at this
    // fixture is far larger, so the release must be exact
    assert(jvmDpMedian(bands, 100000L) === trueMedian)
  }
}
