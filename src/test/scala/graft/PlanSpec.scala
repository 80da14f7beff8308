package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY §4B: "verify presence in explain()
  * during BENCH, do not reimplement"): predicate pushdown, column pruning,
  * and join strategy choices that the 100 TB posture depends on. A plan
  * regression here (a filter that stops reaching the scan, a range join
  * that degenerates to a cartesian product) is a scale bug even when
  * results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private def physicalPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan.toString

  test("b01: quantity predicate is pushed into the parquet scan") {
    val plan = physicalPlan("b01_scan_parquet")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThanOrEqual(l_quantity,45"), plan)
  }

  test("b01: scan reads only the projected columns (pruning)") {
    val plan = physicalPlan("b01_scan_parquet")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"), plan)
    assert(!readSchema.contains("l_extendedprice"), s"unpruned column: $readSchema")
  }

  test("b12: dimension joins are broadcast hash joins") {
    val plan = physicalPlan("b12_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("b13: fact-fact join is sort-merge as hinted") {
    val plan = physicalPlan("b13_join_sortmerge")
    assert(plan.contains("SortMergeJoin"), plan)
  }

  test("b15: bucketed range join plans as an equi hash join, never a nested loop") {
    val plan = physicalPlan("b15_join_range")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join") || plan.contains("ShuffledHashJoin")
      || plan.contains("SortMergeJoin"), plan)
  }

  test("b44: brute-force similarity broadcasts the probe set") {
    val plan = physicalPlan("b44_similarity_bruteforce")
    assert(plan.contains("Broadcast"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("b44/b308: exact serve ranks via bounded-state top-k, not a rank " +
      "window over the expanded corpus") {
    // VERDICT r19 item 6: the per-probe ranking must be the b87 TopKAgg
    // shape — map-side combine to <= k pairs per probe BEFORE the
    // exchange (shuffle ∝ probes·k) — never a Window sorting the full
    // |corpus|·|probes| expansion
    for (q <- Seq("b44_similarity_bruteforce", "b308_crossmodal_retrieval")) {
      val plan = physicalPlan(q)
      assert(!plan.contains("Window"), s"$q ranks with a window:\n$plan")
      val aggs = plan.linesIterator
        .filter(l => l.contains("ObjectHashAggregate") || l.contains("SortAggregate"))
        .toSeq
      assert(aggs.exists(_.contains("partial")), s"$q top-k agg not two-phase:\n$plan")
      assert(aggs.size >= 2, s"$q top-k agg not two-phase:\n$plan")
    }
  }

  test("b17: aggregation is two-phase (map-side partial before shuffle)") {
    val plan = physicalPlan("b17_agg_hash")
    val aggs = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggs.exists(_.contains("partial")) || aggs.size >= 2, plan)
  }

  test("b87: bounded-state top-k aggregates in two phases (map-side partial)") {
    // the whole 100 TB argument for TopKAgg is that each map task reduces
    // its rows to <= k pairs per group BEFORE the shuffle — the plan must
    // show partial-then-final ObjectHashAggregate, not a single-phase agg
    val plan = physicalPlan("b87_agg_topk")
    val aggs = plan.linesIterator
      .filter(l => l.contains("ObjectHashAggregate") || l.contains("SortAggregate"))
      .toSeq
    assert(aggs.exists(_.contains("partial")), plan)
    assert(aggs.size >= 2, plan)
  }

  test("b39: custom feature_id expression participates in codegen (no UDF wrapper)") {
    val df = SparkEntry.queries("b39_udf_expression")(spark, sf)
    val codegenPlan = df.queryExecution.executedPlan.toString
    // the expression must appear inline in the projection, not as a ScalaUDF
    assert(codegenPlan.contains("feature_id"), codegenPlan.take(2000))
  }

  test("b70: correlated LATERAL LIMIT decorrelates to a ranked window, not a nested loop") {
    val plan = physicalPlan("b70_join_lateral")
    assert(plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(3000))
  }

  test("b117: funnel step filter reaches the parquet scan (event_type pushed)") {
    // the entry checkpoints each O(users) step table (so the three funnel
    // counts don't re-execute the chain), which truncates the entry's
    // visible plan — assert the pushdown on the step shape itself, the
    // exact loader+filter+agg code path the entry builds from
    val plan = graft.sources.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "view")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.min("ts").as("anchor"))
      .queryExecution.sparkPlan.toString
    assert(plan.contains("EqualTo(event_type,view)"), plan.take(3000))
  }

  test("b118: retention is join+agg only — no window, no cartesian") {
    val plan = physicalPlan("b118_cohort_retention")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"),
      plan.take(3000))
    assert(plan.contains("partial_"), s"no map-side partial agg:\n${plan.take(3000)}")
  }

  test("b119: co-purchase edge join is key-equi, never a nested loop") {
    // the edge list is the scale-critical plan piece: an order-key equi
    // join with basket-bounded fanout — a cartesian here is the 100 TB bug
    val plan = physicalPlan("b119_pagerank_copurchase")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(3000))
  }

  test("b122: tokenization is one shuffle-free codegen projection over a pruned scan") {
    // the 100 TB claim: BPE is pure map-side scalar work — any Exchange
    // before the presentation sort means the tokenizer stopped scaling
    val df = SparkEntry.queries("b122_bpe_tokenize")(spark, sf)
    val plan = df.queryExecution.sparkPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), plan)
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"unpruned column: $readSchema")
    // exactly the ORDER BY's range exchange, nothing else
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"$exchanges exchanges in a map-side tokenize:\n$plan")
    // codegen spans appear once AQE finalizes — materialize, then check
    // the `*(n)` whole-stage markers wrap the tokenize projection
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.linesIterator.exists(l =>
      l.contains("*(") && l.contains("bpe_encode")), executed.take(2000))
  }

  test("b129: KN model aggregates are two-phase; B is broadcast, not joined") {
    // the 100 TB claim: after the first partial_count the plan never
    // handles O(tokens) rows again, and the 1-row btypes side broadcasts
    val plan = SparkEntry.queries("b129_kneser_ney_bigram")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"), plan.take(1500))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("b132: the shuffle permutation is one hash exchange + partitioned " +
    "window — no global sort before the presentation ORDER BY") {
    val plan = SparkEntry.queries("b132_training_shuffle")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
    // hashpartitioning on shard for the window, rangepartitioning only for
    // the final ORDER BY
    assert(plan.contains("hashpartitioning(shard"), plan)
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"$exchanges exchanges in the shuffle plan:\n$plan")
  }
}
