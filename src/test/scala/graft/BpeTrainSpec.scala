package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.BpeTrain
import graft.functions.BpeEncodeExpression
import graft.sources.Tables

/** B130 BPE training: the learner vs an independent in-test reference
  * (priority re-scan per step, no shared code), the provenance pin to the
  * frozen b122 resource, and the well-formedness property the b122
  * replace-chain oracle's correctness argument relies on. */
class BpeTrainSpec extends AnyFunSuite {
  private val spark = TestSession.spark

  test("learner equals an independent step-by-step reference on a toy corpus") {
    // "abab" x3, "abc" x2, "bc" x1 — hand-checkable trajectory:
    // pairs: ab:8 (3*2+2), ba:3, bc:3 → merge (a,b)
    // then: ab.ab:3, ab.c:2, b.c:1 → counts: (ab,ab):3, (ab,c):2, (b,c):1
    val wc = Seq(("abab", 3L), ("abc", 2L), ("bc", 1L))
    val got = BpeTrain.learnMerges(wc, 3)
    assert(got === Seq(("a", "b"), ("ab", "ab"), ("ab", "c")))
    // exhaustion: asking for more merges than exist stops cleanly
    val all = BpeTrain.learnMerges(Seq(("ab", 1L)), 10)
    assert(all === Seq(("a", "b")))
  }

  test("tie-breaks follow (count DESC, left ASC, right ASC)") {
    // xy and yx both appear twice; 'x' < 'y' picks (x,y) first
    val got = BpeTrain.learnMerges(Seq(("xy", 2L), ("yx", 2L)), 1)
    assert(got === Seq(("x", "y")))
  }

  test("sf0.01 training reproduces the checked-in frozen table; merges " +
    "are well-formed (every side is a char or an earlier product)") {
    val learned = BpeTrain.trainFromCorpus(
      Tables.documents(spark, "/root/testdata/sf0.01"))
    assert(learned === BpeEncodeExpression.merges.toSeq,
      "in-engine learner drifted from tools/train_bpe.py's frozen output")
    // well-formedness: b122's rank-ordered replace chain is only
    // equivalent to greedy BPE if every symbol a merge consumes already
    // exists when its rank comes up
    val known = collection.mutable.Set[String]()
    for ((l, r) <- learned) {
      assert(l.length == 1 || known.contains(l), s"left '$l' unformed")
      assert(r.length == 1 || known.contains(r), s"right '$r' unformed")
      known += l + r
    }
  }
}
