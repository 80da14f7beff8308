package graft

import org.scalatest.funsuite.AnyFunSuite

/** B19 tolerance check (SURVEY §2B: approximate ops are never hash-matched;
  * they get tolerance tests against the exact twin). */
class ApproxSpec extends AnyFunSuite {
  test("percentile_approx is within tolerance of the exact percentile") {
    val spark = TestSession.spark
    val sf = TestSession.sf0001
    val approx = SparkEntry.queries("b23_agg_percentile_approx")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = SparkEntry.queries("b23_agg_percentile")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet === exact.keySet && approx.nonEmpty)
    for ((k, (a25, a50, a75)) <- approx; (e25, e50, e75) = exact(k)) {
      // GK summary at accuracy 10000 → rank error ≤ n/10000; quantity is
      // integer-granular 1..50, so value error beyond one step means a bug
      assert(math.abs(a25 - e25) <= 1.0, s"$k p25: $a25 vs $e25")
      assert(math.abs(a50 - e50) <= 1.0, s"$k p50: $a50 vs $e50")
      assert(math.abs(a75 - e75) <= 1.0, s"$k p75: $a75 vs $e75")
    }
  }

  test("b22 closed-form statistics match the native stats aggregates") {
    // the t2 twin derives stddev/var/corr/covar from exact integer sums;
    // the native float aggregates must agree within float tolerance on
    // the identical cents-scaled inputs — pins the closed forms to the
    // engine's own definitions (sample vs population, corr normalization)
    import org.apache.spark.sql.functions._
    val spark = TestSession.spark
    val sf = TestSession.sf0001
    val closed = SparkEntry.queries("b22_agg_stats")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val native = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        (round(col("l_quantity") * 100).cast("long") / 100.0).as("q"),
        (round(col("l_discount") * 100).cast("long") / 100.0).as("di"),
        (round(col("l_tax") * 100).cast("long") / 100.0).as("t"))
      .groupBy("l_returnflag")
      .agg(stddev_samp(col("q")).as("sd_qty"),
        var_samp(col("q")).as("var_qty"),
        corr(col("di"), col("t")).as("corr_disc_tax"),
        covar_samp(col("di"), col("t")).as("covar_s"),
        covar_pop(col("di"), col("t")).as("covar_p"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(closed.keySet === native.keySet && closed.nonEmpty)
    for ((k, c) <- closed; n = native(k)) {
      def ok(a: Double, b: Double, what: String): Unit =
        assert(math.abs(a - b) <= 5e-4 * math.max(1.0, math.abs(b)),
          s"$k $what: closed-form $a vs native $b")
      ok(c._1, n._1, "stddev_samp"); ok(c._2, n._2, "var_samp")
      ok(c._3, n._3, "corr"); ok(c._4, n._4, "covar_samp"); ok(c._5, n._5, "covar_pop")
    }
  }

  test("approx_count_distinct is within the configured rsd of exact") {
    val df = SparkEntry.queries("b19_agg_approx_distinct")(
      TestSession.spark, TestSession.sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      // rsd 0.02 requested; allow 5 sigma
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("B196: OLS slopes equal a JVM replay; negative inexact divisions truncate in both engines") {
    val spark = TestSession.spark
    val sf = TestSession.sf0001
    // the div-semantics witness the b196 scaladoc cites: Spark `div` and
    // DuckDB `//` both truncate toward zero on negative operands
    assert(spark.sql("SELECT -7 div 2").head.getLong(0) === -3L)
    val got = SparkEntry.queries("b196_trend_ols")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty)
    val pts = graft.sources.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.expr(
          "CAST(datediff(to_date(ts), CAST('2024-01-01' AS DATE)) AS LONG)").as("x"),
        org.apache.spark.sql.functions.expr(
          "CAST(round(value * 100) AS LONG)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = pts.groupBy(_._1).flatMap { case (u, es) =>
      val n = es.length.toLong
      val sx = es.map(_._2).sum; val sy = es.map(_._3).sum
      val sxy = es.map(e => e._2 * e._3).sum; val sxx = es.map(e => e._2 * e._2).sum
      val den = n * sxx - sx * sx
      if (den > 0) Some(u -> (n, (n * sxy - sx * sy) * 1000000L / den)) else None
    }
    assert(got === want.toMap)
    // negative slopes genuinely occur — the truncation semantics are load-bearing
    assert(got.values.exists(_._2 < 0), "no negative slope — witness vacuous")
  }
}
