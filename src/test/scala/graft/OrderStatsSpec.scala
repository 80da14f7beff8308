package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.OrderStats

/** [[OrderStats]] — the two-phase global rank/ntile/running-sum scan
  * (VERDICT r14 item 2): bit-equality against the naive global window,
  * the closed-form ntile mapping against real ntile(), and the plan shape
  * of all four rewritten entries (b199/b213/b227/b239): no Exchange
  * SinglePartition anywhere, with the SequencePackSpec-style negative
  * test showing the naive spelling DOES produce one. */
class OrderStatsSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001
  import spark.implicits._

  // deterministic pseudo-random fixture with heavy first-key ties (so
  // buckets hold tie runs) and negative-capable ordering via DESC
  private lazy val fixture = {
    val rows = (1L to 997L).map { i =>
      val v = (i * 2654435761L) % 97L // many ties
      val s = (i * 40503L) % 1009L
      (i, v, s)
    }
    rows.toDF("id", "v", "s").repartition(7).localCheckpoint(true)
  }

  test("ASC rank + running sum equal the naive global window") {
    val (got, n, Seq(tot)) = OrderStats.withGlobalRank(fixture,
      expr("v div 10"), Seq(col("v"), col("id")), "rn",
      runningSums = Seq((col("s"), "cum")))
    val w = Window.orderBy(col("v"), col("id"))
    val want = fixture
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum("s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
    val g = got.orderBy("id").collect().map(_.toString).toSeq
    val e = want.orderBy("id").collect().map(_.toString).toSeq
    assert(g === e)
    assert(n === 997L)
    assert(tot === fixture.agg(sum("s")).head().getLong(0))
  }

  test("DESC rank over the negated-value bucket equals the naive window") {
    val (got, _, _) = OrderStats.withGlobalRank(fixture,
      expr("(-v) div 7"), Seq(col("v").desc, col("id")), "rn")
    val want = fixture.withColumn("rn",
      row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
    assert(got.orderBy("id").collect().map(_.toString).toSeq ===
      want.orderBy("id").collect().map(_.toString).toSeq)
  }

  test("degenerate buckets: one bucket for all, and one per row, both exact") {
    for (bucket <- Seq(lit(0L), col("v") * 1000L + col("id"))) {
      // (v*1000 + id is monotone in (v, id) — a per-row bucket)
      val (got, _, _) = OrderStats.withGlobalRank(fixture,
        bucket.cast("long"), Seq(col("v"), col("id")), "rn")
      val want = fixture.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      assert(got.orderBy("id").collect().map(_.toString).toSeq ===
        want.orderBy("id").collect().map(_.toString).toSeq)
    }
  }

  test("ntileFromRank equals ntile() for assorted (n, k), incl. n < k") {
    for ((n, k) <- Seq((997L, 5), (997L, 10), (1000L, 8), (3L, 5), (5L, 5),
        (11L, 5), (1L, 10))) {
      val df = (1L to n).toDF("rn")
      val got = df.withColumn("t", OrderStats.ntileFromRank("rn", n, k))
        .orderBy("rn").collect().map(_.getLong(1)).toSeq
      val want = df.withColumn("t",
        ntile(k).over(Window.orderBy("rn")).cast("long"))
        .orderBy("rn").collect().map(_.getLong(1)).toSeq
      assert(got === want, s"n=$n k=$k")
    }
  }

  // ---- plan shape of the four rewritten entries ----

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  for (name <- Seq("b199_rfm_segments", "b213_time_to_convert",
      "b227_abc_classification", "b239_key_skew_report")) {
    test(s"$name plan: no Exchange SinglePartition, rank windows bucketed") {
      val plan = executedPlan(name)
      assert(!plan.contains("Exchange SinglePartition"),
        s"dimension-scale relation funneled through one partition:\n$plan")
    }
  }

  test("negative: the naive global ntile DOES plan an Exchange SinglePartition") {
    val naive = fixture.withColumn("t",
      ntile(5).over(Window.orderBy(col("v"), col("id"))))
    naive.collect()
    assert(naive.queryExecution.executedPlan.toString
      .contains("Exchange SinglePartition"),
      "the anti-pattern this suite guards against has changed shape")
  }
}
