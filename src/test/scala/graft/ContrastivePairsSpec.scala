package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.ContrastivePairs

/** B160 contrastive pair mining: planted corpus shapes pin the labeling
  * semantics the t2 hash enforces only statistically on real data. */
class ContrastivePairsSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  import spark.implicits._

  // anchor 0 (doc_id % 25 == 0):
  //  - doc 1 = near-verbatim copy → positive (jac ≈ 1)
  //  - doc 2 = shares the leading trigram but diverges → hard negative
  //  - doc 3 = between the thresholds → discarded (label noise)
  //  - doc 4 = zero shared shingles → never a candidate
  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog tonight"),
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown bear walks under a bright red moon rises high above"),
    (3L, "the quick brown fox jumps over nine green hills far away"),
    (4L, "completely different words with no overlap at all here")
  ).toDF("doc_id", "text")

  private lazy val out = ContrastivePairs.minePairs(docs).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3), r.getInt(4)))

  test("near-duplicate lands as the top positive") {
    val pos = out.filter(r => r._1 == 0L && r._4 == "positive")
    assert(pos.map(_._2).toSeq === Seq(1L), s"positives: ${pos.toSeq}")
    assert(pos.head._3 > 0.5)
    assert(pos.head._5 === 1)
  }

  test("surface-overlap-but-dissimilar doc is mined as a hard negative") {
    val neg = out.filter(r => r._1 == 0L && r._4 == "hard_negative")
    assert(neg.map(_._2).contains(2L), s"negatives: ${neg.toSeq}")
    assert(neg.forall(_._3 < 0.1))
  }

  test("the ambiguous band is discarded and non-candidates never appear") {
    val others = out.filter(_._1 == 0L).map(_._2).toSet
    assert(!others.contains(3L), "mid-similarity doc must be discarded as label noise")
    assert(!others.contains(4L), "zero-overlap doc cannot be a candidate")
  }

  test("rerun-deterministic") {
    val again = ContrastivePairs.minePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3), r.getInt(4)))
    assert(again.toSeq === out.toSeq)
  }
}
