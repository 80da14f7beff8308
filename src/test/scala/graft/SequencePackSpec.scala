package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.SequencePack
import graft.sources.Tables

/** B97 sequence packing: the two-phase distributed scan vs a sequential
  * JVM oracle, the packing invariants, and the plan shape (no
  * SinglePartition global window). */
class SequencePackSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001
  private val S = SequencePack.SeqLen

  private lazy val docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"))

  private lazy val manifest = SequencePack.packManifest(docs).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("manifest equals a sequential JVM packing oracle") {
    // definition-level oracle: walk docs in doc_id order, keep one running
    // token offset, slice per SEQ window — plain loop, no Spark, no SQL
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    val want = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    var off = 0L
    for ((id, text) <- rows) {
      val n = text.split(" ", -1).length.toLong
      var pos = 0L
      while (pos < n) {
        val seq = (off + pos) / S
        val take = math.min(n - pos, (seq + 1) * S - (off + pos))
        want += ((seq, id, pos, take))
        pos += take
      }
      off += n
    }
    assert(manifest.toSeq === want.sortBy(t => (t._1, t._2)).toSeq,
      "two-phase scan diverged from the sequential packing")
  }

  test("packing invariants: full coverage, exact SEQ fill, contiguity") {
    val byDoc = manifest.groupBy(_._2)
    val toks = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc fully covered exactly once, slices contiguous from 0
    for ((id, slices) <- byDoc) {
      val sorted = slices.sortBy(_._1)
      assert(sorted.map(_._4).sum === toks(id), s"doc $id not fully covered")
      var expect = 0L
      for ((_, _, docOff, n) <- sorted) {
        assert(docOff === expect, s"doc $id slices not contiguous")
        expect += n
      }
    }
    // every sequence but the last holds exactly SEQ tokens
    val bySeq = manifest.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    val lastSeq = bySeq.keys.max
    for ((seq, total) <- bySeq) {
      if (seq != lastSeq) assert(total === S, s"seq $seq holds $total tokens")
      else assert(total <= S && total > 0)
    }
    // sequence ids are dense 0..last
    assert(bySeq.keySet === (0L to lastSeq).toSet, "sequence ids not dense")
  }

  test("plan: the prefix scan never funnels through a SinglePartition window") {
    val plan = SequencePack.packManifest(docs).queryExecution
      .executedPlan.toString
    // the final orderBy range-partitions; only a GLOBAL (unpartitioned)
    // window would introduce 'Exchange SinglePartition' — the exact
    // anti-pattern the two-phase scan exists to avoid
    assert(!plan.contains("Exchange SinglePartition"),
      s"global scan collapsed to one partition:\n$plan")
    assert(plan.contains("Window"), "expected the per-bucket window")
  }

  test("bucket width does not change the manifest") {
    // the scan decomposition is an implementation detail: any W yields
    // the same global offsets
    val a = SequencePack.packManifest(docs, bucketWidth = 7L).collect()
    val b = SequencePack.packManifest(docs, bucketWidth = 1000000L).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.nonEmpty)
  }
}
