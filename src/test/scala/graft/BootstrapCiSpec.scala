package graft

import org.scalatest.funsuite.AnyFunSuite

/** B285 A/B bootstrap CI: full JVM replay (seeded Poisson weights,
  * weighted variant means, percentile ranks), the frozen Poisson(1)
  * ladder's pmf, and the interval's basic contracts. */
class BootstrapCiSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private val M = graft.operators.PrivacyOps.UniformM
  private val Knuth = graft.operators.PrivacyOps.Knuth
  private val R = graft.operators.ChangepointOps.BootReps

  /** Independent JVM spelling of the frozen Poisson(1) inverse CDF. */
  private def jvmPoisson(u: Long): Long = {
    var cdf = 0.0
    var fact = 1.0
    var k = 0
    while (true) {
      if (k > 0) fact *= k
      cdf += math.exp(-1.0) / fact
      val t = math.floor(cdf * M).toLong
      if (t >= M) return k.toLong
      if (u < t) return k.toLong
      k += 1
    }
    -1L
  }

  private def uniform(key: String): Long =
    ((graft.llm.Winnowing.polyFoldString(key) % M) * Knuth) % M

  test("B285: the released interval replays in the JVM end-to-end") {
    val got = SparkEntry.queries("b285_ab_bootstrap_ci")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.length === 1)
    // per-user (variant, cents) from the raw parquet
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val users = ev.map(_._1).distinct
    val cents = ev.filter(_._2 == "purchase")
      .groupBy(_._1).view.mapValues(
        _.map(e => math.floor(e._3 * 100 + 0.5).toLong).sum).toMap
    val x = users.map { uid =>
      val variant = (((uid % 2147483648L) * 2654435761L) % 2147483648L) /
        1073741824L
      (uid, variant, cents.getOrElse(uid, 0L))
    }
    def mean(v: Long, f: ((Long, Long, Long)) => Long): Long = {
      val rows = x.filter(_._2 == v)
      rows.map(f).sum / rows.length.toLong
    }
    val diffObs = mean(1, _._3) - mean(0, _._3)
    val diffs = (1L to R).flatMap { r =>
      var sw0, sw1, swx0, swx1 = 0L
      x.foreach { case (uid, v, c) =>
        val w = jvmPoisson(uniform(s"bci:$r:$uid"))
        if (v == 1) { sw1 += w; swx1 += w * c }
        else { sw0 += w; swx0 += w * c }
      }
      if (sw0 > 0 && sw1 > 0) Some((r, swx1 / sw1 - swx0 / sw0)) else None
    }
    val sorted = diffs.sortBy { case (r, d) => (d, r) }.map(_._2)
    val n = sorted.length.toLong
    val loRank = (n * 25 + 999) / 1000
    val lo = sorted((loRank - 1).toInt)
    val hi = sorted((n - loRank).toInt)
    val signif = if (lo > 0 || hi < 0) 1L else 0L
    assert(got.head === ((n, diffObs, lo, hi, signif)),
      "released interval diverges from the JVM replay")
    // contracts: a 95% interval is an interval, and with 200 reps the
    // bootstrap distribution brackets the observed diff on this fixture
    assert(lo <= hi)
    assert(lo <= diffObs && diffObs <= hi)
  }

  test("B285: the frozen Poisson(1) ladder reproduces the pmf and the" +
    " unit mean (the resampling premise: E[w] = 1 keeps samples sized)") {
    val stride = 21475L
    val counts = spark.range(100000)
      .selectExpr(s"id * $stride AS u")
      .selectExpr(s"${graft.operators.ChangepointOps.poissonLadder("u")}" +
        " AS w")
      .groupBy("w").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    def pmf(k: Int): Double =
      math.exp(-1.0) / (1 to k).foldLeft(1.0)(_ * _)
    for (k <- 0 to 4)
      assert(math.abs(counts.getOrElse(k, 0L) / total - pmf(k)) < 0.005,
        s"pmf at $k diverges from Poisson(1)")
    val meanW = counts.map { case (k, c) => k.toDouble * c }.sum / total
    assert(math.abs(meanW - 1.0) < 0.01, s"E[w] = $meanW, want 1")
  }
}
