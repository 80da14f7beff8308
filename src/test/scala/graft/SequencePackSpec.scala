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

  // ---- B154: best-fit-decreasing whole-doc packing ----

  private lazy val bfd = SequencePack.packBestFit(docs).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))

  test("B154 invariants: every doc exactly once, whole, fills within capacity") {
    val nDocs = docs.count()
    assert(bfd.length.toLong === nDocs)
    assert(bfd.map(_._3).distinct.length.toLong === nDocs)
    // declared n_tok matches the doc's real token count (docs never split)
    val toks = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong)
      .toMap
    bfd.foreach { case (_, _, id, n, _, _) => assert(n === toks(id)) }
    // bin_fill is the true per-bin sum; fill ≤ S unless a single oversize
    // doc owns the bin; waste = S - fill floored at 0
    bfd.groupBy(r => (r._1, r._2)).foreach { case ((sh, b), rows) =>
      val fill = rows.map(_._4).sum
      assert(rows.forall(_._5 === fill))
      assert(rows.forall(_._6 === math.max(0L, S - fill)))
      assert(fill <= S || rows.length === 1,
        s"bin ($sh,$b) overfilled with ${rows.length} docs")
    }
  }

  test("B154 waste ≤ the sequential next-fit packer's, per shard") {
    // the packer a naive loader implements: walk docs in doc_id order,
    // append to the current bin, open a new one on overflow
    val byShard = docs.collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
      .sortBy(_._1)
      .groupBy { case (id, _) => id / SequencePack.ShardWidth }
    val bfdWaste = bfd.groupBy(_._1).view.mapValues(
      _.groupBy(_._2).values.map(_.head._6).sum).toMap
    byShard.foreach { case (shard, items) =>
      var bins = List.empty[Long]
      items.foreach { case (_, n) =>
        bins = bins match {
          case cur :: rest if cur + n <= S => (cur + n) :: rest
          case _ => n :: bins
        }
      }
      val nfWaste = bins.map(l => math.max(0L, S - l)).sum
      assert(bfdWaste(shard) <= nfWaste,
        s"shard $shard: BFD waste ${bfdWaste(shard)} > next-fit $nfWaste")
    }
    // and the comparison is not vacuous: BFD strictly beats next-fit
    // somewhere on this corpus
    val totalBfd = bfdWaste.values.sum
    assert(totalBfd > 0L, "corpus packs perfectly — comparison vacuous")
  }

  test("B154 oversize docs land alone in their own bin") {
    import spark.implicits._
    val synth = Seq(
      (0L, Seq.fill(600)("w").mkString(" ")), // oversize: 600 > 512
      (1L, Seq.fill(300)("w").mkString(" ")),
      (2L, Seq.fill(200)("w").mkString(" ")),
      (3L, Seq.fill(12)("w").mkString(" "))
    ).toDF("doc_id", "text")
    val out = SequencePack.packBestFit(synth).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    val oversizeBin = out.find(_._2 === 0L).get
    assert(out.count(_._1 === oversizeBin._1) === 1, "oversize doc shared a bin")
    assert(oversizeBin._3 === 600L && oversizeBin._4 === 0L)
    // the rest best-fit-decreasing into one 512 bin: 300+200+12 = 512
    val others = out.filter(_._2 !== 0L)
    assert(others.map(_._1).distinct.length === 1)
    assert(others.head._3 === 512L && others.head._4 === 0L)
  }

  test("B154 shard width does not break determinism (rerun-stable)") {
    val twice = SequencePack.packBestFit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(twice.toSeq === bfd.toSeq)
  }
}
