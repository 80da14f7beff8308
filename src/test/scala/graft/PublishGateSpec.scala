package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PublishGate
import graft.sources.Tables

/** B258 publish-gate capstone: leg ISOLATION — three different planted
  * corruptions, each tripping exactly its own leg with exactly the
  * planted mass — plus the clean go / corrupted no-go verdicts. */
class PublishGateSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private lazy val orders = Tables.orders(spark, sf)
  private lazy val customer = Tables.customer(spark, sf)
  private lazy val cutoff = to_date(lit(PublishGate.CutoffDate))
  private lazy val previous = orders.filter(col("o_orderdate") < cutoff)

  private def report(cand: org.apache.spark.sql.DataFrame) =
    PublishGate.gateReport(cand, previous, customer, "x")
      .orderBy("check_id").collect()

  private def failing(rows: Array[org.apache.spark.sql.Row]) =
    rows.filter(r => r.getString(4) == "fail").map(_.getString(1)).toSeq

  test("clean candidate: every leg passes, verdict is go") {
    val rows = report(orders)
    assert(failing(rows) === Seq.empty)
    val verdict = rows.find(_.getString(1) == "zz_publish_verdict").get
    assert(verdict.getString(4) === "go")
    assert(verdict.getLong(3) === 0L)
  }

  test("new-batch duplicate keys trip EXACTLY the unique leg, with" +
    " exactly the planted mass; verdict no-go") {
    val planted = orders.filter(col("o_orderdate") >= cutoff
      && col("o_orderkey") % 101 === 0)
    val nPlanted = planted.count()
    assert(nPlanted > 0, "fixture must plant at least one duplicate")
    val rows = report(orders.unionByName(planted))
    assert(failing(rows) === Seq("unique:o_orderkey"))
    assert(rows.find(_.getString(1) == "unique:o_orderkey").get
      .getLong(3) === nPlanted)
    assert(rows.find(_.getString(1) == "zz_publish_verdict").get
      .getString(4) === "no-go")
  }

  test("new-batch bad enum values trip EXACTLY the accepted_values leg") {
    val corrupted = orders.withColumn("o_orderstatus",
      when(col("o_orderdate") >= cutoff && col("o_orderkey") % 51 === 0,
        lit("X")).otherwise(col("o_orderstatus")))
    val nPlanted = orders.filter(col("o_orderdate") >= cutoff
      && col("o_orderkey") % 51 === 0).count()
    assert(nPlanted > 0)
    val rows = report(corrupted)
    assert(failing(rows) === Seq("accepted_values:o_orderstatus"))
    assert(rows.find(_.getString(1) == "accepted_values:o_orderstatus").get
      .getLong(3) === nPlanted)
  }

  test("silent mutation of PUBLISHED rows trips EXACTLY the fingerprint" +
    " leg — the corruption no row-level rule can see") {
    // flip O->F on some old rows: still an accepted value, same keys,
    // same counts — only the segment checksum notices
    val corrupted = orders.withColumn("o_orderstatus",
      when(col("o_orderdate") < cutoff && col("o_orderkey") % 201 === 0
        && col("o_orderstatus") === "O", lit("F"))
        .otherwise(col("o_orderstatus")))
    val nMutated = orders.filter(col("o_orderdate") < cutoff
      && col("o_orderkey") % 201 === 0 && col("o_orderstatus") === "O")
      .count()
    assert(nMutated > 0, "fixture must mutate at least one published row")
    val rows = report(corrupted)
    assert(failing(rows) === Seq("fingerprint:immutable_segments"))
  }

  test("an empty append trips EXACTLY the growth-band leg") {
    val rows = report(previous)
    assert(failing(rows) === Seq("row_count:growth_band"))
  }
}
