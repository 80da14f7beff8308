package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SinglePartitionAudit

/** The SinglePartition walker gate (VERDICT r17 item 1): every
  * single-partition shuffle in the audited plan set must be bounded —
  * either a scalar partial aggregate (<= 1 row per upstream partition by
  * construction) or a sanctioned rollup whose cardinality bound is NAMED
  * in [[SinglePartitionAudit.sanctions]]. A future corpus-proportional
  * funnel (the classic global-window / global-sort-before-the-end scale
  * bug) turns this suite red instead of hiding behind a text grep that
  * cannot match FORMATTED explain output. */
class PlanWalkSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  test("every SinglePartition exchange in the audited plan set is bounded " +
    "(scalar partial agg, or sanctioned rollup with a named bound)") {
    val plans = SinglePartitionAudit.plansFor(spark,
      ExplainDump.dumpSet.map(e =>
        e.name -> ((s: org.apache.spark.sql.SparkSession) => e.q(s, sf))))
    val r = SinglePartitionAudit.audit(plans)
    assert(r.violations.isEmpty, "un-sanctioned SinglePartition sites:\n" +
      r.violations.mkString("\n"))
    // the audit is live, not vacuous: the sanctioned plans really do
    // contain sites to classify
    assert(r.sites.nonEmpty, "walker found zero sites — audit is broken")
  }

  test("no dead sanctions: every sanctioned entry is in the dump set") {
    val names = ExplainDump.dumpSet.map(_.name).toSet
    val dead = SinglePartitionAudit.sanctions.keySet.diff(names)
    assert(dead.isEmpty, s"sanctions for entries not audited: $dead")
  }

  test("negative: a corpus-proportional global window IS a violation") {
    // the exact anti-pattern the audit exists to catch — a row_number over
    // the whole relation with no partitionBy funnels every row through one
    // task; it must surface as a non-scalar, un-sanctioned site
    val r = SinglePartitionAudit.audit(SinglePartitionAudit.plansFor(spark,
      Seq("bad_global_window" -> ((s: org.apache.spark.sql.SparkSession) =>
        graft.sources.Tables.lineitem(s, sf)
          .withColumn("rn", row_number().over(Window.orderBy("l_orderkey")))))))
    assert(r.sites.nonEmpty, "walker missed the global-window funnel")
    assert(r.sites.exists(!_.scalar), r.sites.mkString("\n"))
    assert(r.violations.nonEmpty, "corpus-proportional funnel not flagged")
  }

  test("negative: a scalar total is auto-sanctioned (no allowlist needed)") {
    // count(*) over lineitem plans partial agg -> SinglePartition -> final:
    // bounded by construction, must classify scalar and raise no violation
    val r = SinglePartitionAudit.audit(SinglePartitionAudit.plansFor(spark,
      Seq("scalar_total" -> ((s: org.apache.spark.sql.SparkSession) =>
        graft.sources.Tables.lineitem(s, sf)
          .agg(sum("l_quantity").as("total"))))))
    assert(r.sites.forall(_.scalar), r.sites.mkString("\n"))
    assert(r.violations.isEmpty, r.violations.mkString("\n"))
  }
}
