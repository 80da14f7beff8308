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

  test("AQE skew-join splits the planted hot partition (the adaptive twin of b66's salting)") {
    // the engine's two answers to the same 100 TB problem: b66 salts the
    // hot key statically; AQE detects the oversized shuffle partition at
    // runtime and splits it across reader tasks. Same planted skew shape
    // as the salted-join test: ~90% of left rows collapse onto one key.
    val hot = 7L
    // repartition(8) matters: AQE splits a skewed partition at MAP-BLOCK
    // granularity, and the fixture parquet is one split — a single mapper
    // produces one indivisible block, so the hot partition must arrive
    // from several mappers to be splittable (true by construction at
    // 100 TB, where every scan has thousands of splits)
    def left = Tables.lineitem(spark, sf).select(
      when(col("l_orderkey") % 10 =!= 0, lit(hot))
        .otherwise(col("l_orderkey")).as("k"),
      col("l_quantity")).repartition(8)
    def right = Tables.orders(spark, sf).select(
      col("o_orderkey").as("k"), col("o_totalprice")).repartition(8)
    val expected = left.join(right, "k").count() // default conf, pre-tuning
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      // force a shuffled join, and scale the skew thresholds down to the
      // fixture (defaults target 256 MB partitions, not a 6k-row table)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      val joined = left.join(right, "k")
      // collect() (not count()) so THIS plan executes and AQE finalizes it
      assert(joined.collect().length === expected,
        "AQE skew handling changed the result")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"post-AQE plan did not mark/split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
