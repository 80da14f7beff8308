package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.SimHash
import graft.sources.Tables

class SimHashSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private def docsWithDups = {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    docs.unionByName(
      docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }

  test("identical docs have identical simhash (hamming 0) and are found") {
    val found = SimHash.nearDuplicates(docsWithDups, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 25 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    for (id <- expected)
      assert(found.exists(t => t._1 == id && t._2 == id + 1000000L && t._3 == 0),
        s"identical pair for $id not at hamming 0")
  }

  test("a small perturbation stays within a few bits (near-dup found at k=8)") {
    // perturb: append one word — signature should move only slightly
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 40)
    val perturbed = docs
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zzgraftmarker")).as("text"))
    val sigs = SimHash.signatures(docs.unionByName(perturbed))
    val joined = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") + 1000000L === col("b.doc_id"))
      .select(expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .collect().map(_.getInt(0))
    assert(joined.length === 40)
    assert(joined.count(_ <= 8) >= 35,
      s"perturbed docs drifted too far: ${joined.sorted.mkString(",")}")
    // sanity: unrelated docs are far apart on average
    val rand = sigs.as("a").join(sigs.as("b"), col("a.doc_id") + 17 === col("b.doc_id"))
      .select(avg(expr("bit_count(a.simhash ^ b.simhash)")))
      .collect().head.getDouble(0)
    assert(rand > 15, s"random-pair hamming suspiciously low: $rand")
  }
}
