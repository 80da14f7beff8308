package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleTechniques
import graft.sources.Tables

class ScaleTechniquesSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  test("salted join returns exactly the plain join's rows") {
    val l = Tables.lineitem(spark, sf).select(
      col("l_orderkey").as("k"), col("l_linenumber"), col("l_quantity"))
    val r = Tables.orders(spark, sf).select(
      col("o_orderkey").as("k"), col("o_totalprice"))
    val plain = l.join(r, "k")
    val salted = ScaleTechniques.saltedJoin(l, r, "k",
      saltSource = col("l_linenumber"), saltBuckets = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("ANALYZE TABLE statistics drive the planner (CBO path, SURVEY §4B)") {
    // stats-driven planning: after ANALYZE, the optimizer sees exact row
    // counts (not file-size guesses) and sizes a filtered dimension under
    // the broadcast threshold from its column histogram-backed estimates
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_mktsegment"))
        .write.mode("overwrite").saveAsTable("cbo_customer")
      spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR ALL COLUMNS")
      val stats = spark.table("cbo_customer").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined, "ANALYZE did not surface a row count")
      assert(stats.rowCount.get.toLong ===
        Tables.customer(spark, sf).count())
      assert(stats.attributeStats.nonEmpty, "no column-level statistics")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE IF EXISTS cbo_customer")
    }
  }

  test("bucketed co-located join plans with zero shuffles") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      ScaleTechniques.writeBucketed(
        Tables.orders(spark, sf).select(col("o_orderkey").as("k"), col("o_totalprice")),
        "bkt_orders", "k", 8)
      ScaleTechniques.writeBucketed(
        Tables.lineitem(spark, sf).select(col("l_orderkey").as("k"), col("l_quantity")),
        "bkt_lineitem", "k", 8)
      val joined = ScaleTechniques.coLocatedJoin(spark, "bkt_orders", "bkt_lineitem", "k")
      val plan = joined.queryExecution.sparkPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // and it is correct
      val expected = Tables.orders(spark, sf).join(
        Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}
