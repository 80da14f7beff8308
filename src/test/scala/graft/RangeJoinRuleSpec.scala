package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.plans.RangeJoinBucketing]] — the injected optimizer rule that
  * rewrites band/interval theta joins into bucketed equi joins.
  *
  * TestSession is built with spark.sql.extensions=graft.GraftExtensions, so
  * the rule is active for every DataFrame in these tests.
  */
class RangeJoinRuleSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001
  import spark.implicits._

  private def events = graft.sources.Tables.events(spark, sf)
    .select(col("event_id"), col("ts"))

  private def naiveBandJoin(joinType: String) = {
    val e = events
    val e2 = e.select(col("event_id").as("event_id2"), col("ts").as("ts2"))
    e.join(e2,
      col("ts2") >= col("ts") &&
      col("ts2") <= col("ts") + expr("INTERVAL 5 MINUTES") &&
      col("event_id2") =!= col("event_id"), joinType)
  }

  test("naive interval band join is rewritten away from a nested loop") {
    val plan = naiveBandJoin("left").queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("rewritten naive join matches the hand-bucketed b15 results") {
    val got = SparkEntry.queries("b15b_join_range_rule")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = SparkEntry.queries("b15_join_range")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("numeric integral band join is also rewritten") {
    val a = spark.range(0, 500).select(col("id").as("x"))
    val b = spark.range(0, 500).select(col("id").as("y"))
    val j = a.join(b, col("y") >= col("x") && col("y") <= col("x") + lit(10L))
    val plan = j.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // completeness + no-duplicates vs the naive count: sum over x of
    // |[x, x+10] ∩ [0,500)| = 500*11 - (10+9+...+1) tail clip
    assert(j.count() === 500L * 11 - 55)
  }

  private def withRuleDisabled[A](f: => A): A = {
    spark.conf.set("spark.graft.rangeJoinBucketing.enabled", "false")
    try f finally spark.conf.set("spark.graft.rangeJoinBucketing.enabled", "true")
  }

  test("preceding-window idiom (ts - INTERVAL) is rewritten and agrees with naive") {
    val e = events
    val e2 = e.select(col("event_id").as("event_id2"), col("ts").as("ts2"))
    def j = e.join(e2,
      col("ts2") >= col("ts") - expr("INTERVAL 240 MINUTES") &&
      col("ts2") <= col("ts"))
    val plan = j.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(j.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
    assert(j.count() === withRuleDisabled(j.count()))
  }

  test("probe-on-left orientation is rewritten and agrees with naive") {
    val e = events
    val e2 = e.select(col("event_id").as("event_id2"), col("ts").as("ts2"))
    def j = e.join(e2,
      col("ts") >= col("ts2") &&
      col("ts") <= col("ts2") + expr("INTERVAL 5 MINUTES"))
    assert(j.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
    assert(j.count() === withRuleDisabled(j.count()))
  }

  test("numeric preceding-window band (x - 10) is rewritten and agrees with naive") {
    val a = spark.range(0, 500).select(col("id").as("x"))
    val b = spark.range(0, 500).select(col("id").as("y"))
    def j = a.join(b, col("y") >= col("x") - lit(10L) && col("y") <= col("x"))
    assert(j.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
    assert(j.count() === withRuleDisabled(j.count()))
  }

  test("right outer band joins are NOT rewritten (right side would duplicate)") {
    val plan = naiveBandJoin("right").queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_bucket"), plan)
  }

  test("joins that already have an equi key are left alone") {
    val e = events
    val e2 = events.select(col("event_id").as("event_id2"), col("ts").as("ts2"))
    val j = e.join(e2,
      col("event_id") === col("event_id2") &&
      col("ts2") >= col("ts") &&
      col("ts2") <= col("ts") + expr("INTERVAL 5 MINUTES"))
    val plan = j.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_bucket"), plan)
  }

  test("rule is idempotent: reapplying to its own output is a fixpoint") {
    val once = naiveBandJoin("inner").queryExecution.optimizedPlan
    assert(once.toString.contains("__graft_bucket"))
    val twice = graft.plans.RangeJoinBucketing(once)
    assert(twice.canonicalized == once.canonicalized,
      "second application changed the plan")
  }

  test("rule can be disabled by conf") {
    spark.conf.set("spark.graft.rangeJoinBucketing.enabled", "false")
    try {
      val plan = naiveBandJoin("inner").queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_bucket"), plan)
    } finally spark.conf.set("spark.graft.rangeJoinBucketing.enabled", "true")
  }

  test("property: random widths/offsets/join-types agree with the naive plan") {
    // randomized equivalence sweep: values span negatives and bucket
    // boundaries; every accepted join type and both band shapes
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val width = 1L + rnd.nextInt(50)
      val n = 200
      val offset = rnd.nextInt(200) - 100
      val a = spark.range(0, n).select((col("id") * 3 + offset).as("x"))
      val b = spark.range(0, n).select((col("id") * 7 - 500).as("y"))
      val (joinType, s1) = (Seq("inner", "left", "left_semi", "left_anti")(trial % 4),
        trial % 2 == 0)
      def j = if (s1)
        a.join(b, col("y") >= col("x") && col("y") <= col("x") + lit(width), joinType)
      else
        a.join(b, col("y") >= col("x") - lit(width) && col("y") <= col("x"), joinType)
      val (got, want) = (j.count(), withRuleDisabled(j.count()))
      assert(got === want,
        s"trial=$trial width=$width offset=$offset type=$joinType s1=$s1")
      assert(j.queryExecution.optimizedPlan.toString.contains("__graft_bucket"),
        s"rule did not fire: trial=$trial")
    }
  }

  test("rewrite fires through the SQL text path (BETWEEN formulation)") {
    events.createOrReplaceTempView("rj_events")
    def j = spark.sql(
      """SELECT a.event_id, b.event_id AS event_id2
        |FROM rj_events a JOIN rj_events b
        |  ON b.ts BETWEEN a.ts AND a.ts + INTERVAL 5 MINUTES""".stripMargin)
    assert(j.queryExecution.optimizedPlan.toString.contains("__graft_bucket"),
      "rule did not fire on the spark.sql BETWEEN formulation")
    val plan = j.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(j.count() === withRuleDisabled(j.count()))
  }

  test("integral bands near Long.MinValue do not overflow the bucket math") {
    // x - pmod(x, w) underflows for these values; the floorDiv spelling
    // must keep the rewrite correct (and ANSI-error-free) at the extreme
    val lo = Long.MinValue
    val a = Seq(lo, lo + 3, lo + 7, 0L, 5L).toDF("x")
    val b = Seq(lo, lo + 5, lo + 9, 3L, 11L).toDF("y")
    def j = a.join(b, col("y") >= col("x") && col("y") <= col("x") + lit(10L))
    assert(j.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
    assert(j.count() === withRuleDisabled(j.count()))
  }

  test("bucketing is exact-floor for negative epochs (pre-1970 timestamps)") {
    // band [t, t+60s] across the epoch boundary: micros -30e6 .. +30e6
    val l = Seq(-30000000L, -1L, 0L, 29999999L).toDF("lm")
      .select(timestamp_micros(col("lm")).as("lts"))
    val r = Seq(-30000000L, -1L, 0L, 29999999L).toDF("rm")
      .select(timestamp_micros(col("rm")).as("rts"))
    val j = l.join(r,
      col("rts") >= col("lts") &&
      col("rts") <= col("lts") + expr("INTERVAL 60 SECONDS"))
    assert(j.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
    // every ordered pair within 60s: all 4x4 pairs with rts >= lts → 10
    assert(j.count() === 10)
  }
}
