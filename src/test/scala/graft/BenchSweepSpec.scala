package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r19 item 1: the bench sweep must survive a mid-sweep
  * SparkContext death — in the r19 driver artifact ONE fatal query
  * (b163, host-pressure episode) killed the context and the remaining 14
  * bench queries each "ran" as an instant IllegalStateException, losing a
  * seventh of the artifact's evidence. These tests plant a
  * context-killing query mid-sweep and assert (a) the queries AFTER it
  * still get real measured reps, (b) the killer is recorded as an error
  * with adjudicable rep detail, and (c) the incrementally-flushed detail
  * artifact stays parseable JSON at every flush point (a driver timeout
  * kill leaves the LAST flush as the artifact).
  */
class BenchSweepSpec extends AnyFunSuite {

  private val sf = TestSession.sf0001

  private def mkSession(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bench-sweep-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def goodEntry(name: String): Registry.Entry =
    Registry.entryNoOracle(name) { (s, d) =>
      graft.sources.Tables.lineitem(s, d).select("l_orderkey").limit(100)
    }

  /** A rep whose execution kills the SparkContext and then fails — the
    * b163-class fatal (context dead, exception propagates). */
  private val killer: Registry.Entry =
    Registry.entryNoOracle("zz_context_killer") { (s, _) =>
      s.sparkContext.stop()
      sys.error("planted fatal: context killed mid-sweep")
    }

  test("queries after a context-killing query still get measured reps") {
    val flushed = scala.collection.mutable.ArrayBuffer[String]()
    val (result, last) = Bench.sweep(
      mkSession _,
      Seq(goodEntry("zz_before"), killer, goodEntry("zz_after")),
      sf, reps = 2,
      flushDetail = (r, _) => flushed += Bench.detailJson(r, sf))
    // the killer is an error with per-rep evidence, not a silent hole
    assert(result.errors.keySet == Set("zz_context_killer"), result.errors)
    assert(result.repDetail("zz_context_killer").forall(!_.ok))
    // both good queries have every rep measured ok — the context death
    // cost the killer its own reps, nothing else
    for (q <- Seq("zz_before", "zz_after")) {
      val reps = result.repDetail(q)
      assert(reps.size == 2 && reps.forall(_.ok), s"$q reps: $reps")
      assert(result.results.exists(_._1 == q), s"$q missing from results")
    }
    // the session the sweep ends on is live (rebuilt after the kill)
    assert(!last.sparkContext.isStopped)
    // every incremental flush — including the ones written after the
    // fatal — is parseable JSON carrying the adjudication arrays
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(flushed.size == 3)
    for (j <- flushed) {
      val node = mapper.readTree(j)
      assert(node.get("metric").asText() == "total", j.take(200))
      assert(node.has("gc_reps") && node.has("cpu_reps") && node.has("rep_ok"), j.take(200))
    }
    val finalNode = mapper.readTree(flushed.last)
    assert(finalNode.get("rep_ok").get("zz_after").toString == "[true,true]")
    assert(finalNode.get("errors").get("zz_context_killer") != null)
  }

  test("locale-pinned formatting emits dots regardless of default locale") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY) // decimal comma
      assert(Bench.fmt(1.5, 3) == "1.500")
      assert(Bench.fmt(0.123456, 3) == "0.123")
    } finally java.util.Locale.setDefault(prev)
  }
}
