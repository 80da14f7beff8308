package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Definition-level properties of the B117 funnel and B118 cohort
  * retention (the t2 hash pins exact values; these pin the invariants a
  * correct implementation cannot break on ANY corpus). */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf0001

  test("B117: funnel counts are monotone and step 1 is exactly the view users") {
    val steps = SparkEntry.queries("b117_funnel_steps")(spark, sf)
      .collect().sortBy(_.getInt(0)).map(_.getLong(2))
    assert(steps.length === 3)
    assert(steps(0) >= steps(1) && steps(1) >= steps(2),
      s"funnel widened downstream: ${steps.toSeq}")
    val viewUsers = Tables.events(spark, sf)
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(steps(0) === viewUsers)
  }

  test("B118: every user appears in their own cohort's first-week cell") {
    val tri = SparkEntry.queries("b118_cohort_retention")(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val cohortSizes = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("(unix_micros(ts) - 1704067200000000L) div 604800000000L").as("week"))
      .groupBy("user_id").agg(min(col("week")).as("cw"))
      .groupBy("cw").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((cw, n) <- cohortSizes)
      assert(tri.get((cw, cw)).contains(n),
        s"cohort $cw: diagonal cell ${tri.get((cw, cw))} != cohort size $n " +
          "(every user is active in their first week by definition)")
    // column sums = distinct active users per week
    val activePerWeek = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("(unix_micros(ts) - 1704067200000000L) div 604800000000L").as("week"))
      .distinct().groupBy("week").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((w, n) <- activePerWeek)
      assert(tri.filter(_._1._2 == w).values.sum === n,
        s"week $w: cohort column sum != distinct active users $n")
  }
}
