package graft

import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** GlobalWindowScanRewrite: the auto-decomposition of global running sums
  * must fire on the naive spelling, produce bit-identical results to the
  * naive plan (including null and negative order keys), and leave
  * ineligible windows untouched. */
class GlobalWindowSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001
  import spark.implicits._

  private val EnabledKey = "spark.graft.globalWindowScan.enabled"

  private def withRule[T](on: Boolean)(body: => T): T = {
    spark.conf.set(EnabledKey, on.toString)
    try body finally spark.conf.unset(EnabledKey)
  }

  test("rule fires on the naive corpus query and matches the naive plan's rows") {
    val q = () => {
      Tables.registerAll(spark, sf)
      spark.sql(
        """SELECT doc_id, n_tok,
          |       sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS running
          |FROM (SELECT doc_id,
          |             COALESCE(CAST(size(split(text, ' ')) AS BIGINT), 0) AS n_tok
          |      FROM documents)
          |ORDER BY doc_id""".stripMargin)
    }
    val (rewritten, plan) = withRule(on = true) {
      val df = q(); (df.collect(), df.queryExecution.optimizedPlan.toString)
    }
    val naive = withRule(on = false) { q().collect() }
    assert(plan.contains("_gw_bucket_l"), s"rule did not fire:\n${plan.take(600)}")
    assert(rewritten.map(_.toString).toSeq === naive.map(_.toString).toSeq)
    // the single-task funnel is gone: the corpus window is partitioned by
    // the bucket; the only SinglePartition exchange feeds the O(buckets)
    // offsets window
    val phys = withRule(on = true) { q().queryExecution.executedPlan.toString }
    assert(phys.contains("_gw_bucket_l"))
  }

  test("null and negative order keys: rewrite ≡ naive, nulls-first preserved") {
    val rows = Seq[(java.lang.Long, Long)](
      (null, 7L), (-2005L, 1L), (-1L, 2L), (0L, 3L), (999L, 4L),
      (1000L, 5L), (1001L, 6L), (null, 8L), (5000L, 9L))
    val df = rows.toDF("k", "v")
    val win = W.orderBy(col("k").asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    // v + 0L literal keeps the summed expr non-nullable
    val q = () => df.withColumn("running", sum(col("v") + lit(0L)).over(win))
      .orderBy(col("k").asc_nulls_first, col("v"))
    val on = withRule(on = true) {
      val d = q(); (d.collect().map(_.toString).toSeq,
        d.queryExecution.optimizedPlan.toString)
    }
    val off = withRule(on = false) { q().collect().map(_.toString).toSeq }
    assert(on._2.contains("_gw_bucket_l"), "rule did not fire on nullable key")
    assert(on._1 === off)
  }

  test("randomized equivalence: rule-on ≡ rule-off across widths, ties, frames") {
    val WidthKey = "spark.graft.globalWindowScan.bucketWidth"
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val n = 50 + rnd.nextInt(150)
      // duplicate-heavy keys (ties!), negatives, nulls
      val rows = Seq.tabulate(n) { i =>
        val k: java.lang.Long =
          if (rnd.nextInt(10) == 0) null
          else Long.box(rnd.nextInt(40) - 10L)
        (k, rnd.nextInt(1000).toLong, i.toLong)
      }
      val df = rows.toDF("k", "v", "id")
      // ROWS frame needs a total order (ties make it nondeterministic in
      // ANY plan) → order by (k, id); RANGE frame is tie-safe on k alone
      val rowsWin = W.orderBy(col("k").asc_nulls_first, col("id"))
      val rangeWin = W.orderBy(col("k").asc_nulls_first)
        .rangeBetween(W.unboundedPreceding, W.currentRow)
      val width = Seq("1", "3", "97", "100000")(trial % 4)
      def run(on: Boolean)(q: () => org.apache.spark.sql.DataFrame) =
        withRule(on) {
          spark.conf.set(WidthKey, width)
          try q().orderBy(col("id")).collect().map(_.toString).toSeq
          finally spark.conf.unset(WidthKey)
        }
      // ROWS over the composite order: key id is the SECOND order col →
      // rule requires a single key, so it must NOT fire; still equal
      val qRows = () => df.withColumn("r",
        sum(col("v") + lit(0L)).over(rowsWin.rowsBetween(W.unboundedPreceding, W.currentRow)))
      assert(run(on = true)(qRows) === run(on = false)(qRows), s"trial $trial ROWS")
      // RANGE over k alone: eligible (ties share a bucket) — must fire and agree
      val qRange = () => df.withColumn("r", sum(col("v") + lit(0L)).over(rangeWin))
      val fired = withRule(on = true) {
        spark.conf.set(WidthKey, width)
        try qRange().queryExecution.optimizedPlan.toString.contains("_gw_bucket_l")
        finally spark.conf.unset(WidthKey)
      }
      assert(fired, s"trial $trial: rule did not fire on the RANGE window")
      assert(run(on = true)(qRange) === run(on = false)(qRange),
        s"trial $trial RANGE width=$width")
    }
  }

  test("malformed or nonpositive bucketWidth skips the rewrite, never throws") {
    val WidthKey = "spark.graft.globalWindowScan.bucketWidth"
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("k", "v")
    val win = W.orderBy(col("k")).rowsBetween(W.unboundedPreceding, W.currentRow)
    val q = () => df.withColumn("r", sum(col("v") + lit(0L)).over(win)).orderBy("k")
    val expected = withRule(on = false) { q().collect().map(_.toString).toSeq }
    for (bad <- Seq("bogus", "-5", "0", "")) {
      withRule(on = true) {
        spark.conf.set(WidthKey, bad)
        try {
          val d = q()
          assert(!d.queryExecution.optimizedPlan.toString.contains("_gw_bucket"),
            s"rule fired with width='$bad'")
          assert(d.collect().map(_.toString).toSeq === expected, s"width='$bad'")
        } finally spark.conf.unset(WidthKey)
      }
    }
  }

  test("ineligible windows are left alone (avg; nullable argument; desc key)") {
    val df = Seq((1L, 1.0, 1L), (2L, 2.0, 2L)).toDF("k", "x", "v")
    val rows = W.orderBy(col("k")).rowsBetween(W.unboundedPreceding, W.currentRow)
    val cases = Seq(
      df.withColumn("r", avg(col("x")).over(rows)),                 // not sum
      df.withColumn("r", sum(when(col("v") > 1, col("v"))).over(rows)), // nullable arg
      df.withColumn("r", sum(col("v") + lit(0L)).over(
        W.orderBy(col("k").desc).rowsBetween(W.unboundedPreceding, W.currentRow))))
    withRule(on = true) {
      for (c <- cases)
        assert(!c.queryExecution.optimizedPlan.toString.contains("_gw_bucket"),
          "rule fired on an ineligible window")
    }
  }
}
