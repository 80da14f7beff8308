package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.UnigramTrain

/** B271 in-engine unigram trainer: the Viterbi tie-break, the integer
  * cost formula (incl. the half-even rounding), the EM prune, the
  * letter-floor quirk, and a tiny-corpus trajectory — the full-corpus
  * gate is the in-entry equality require vs the frozen vocab at the
  * training SF (driver-checked every round). */
class UnigramTrainSpec extends AnyFunSuite {

  test("cost formula: max(1, rint(-100 ln(c/total))) over used pieces;" +
    " unused kept pieces get max + 100") {
    val costs = UnigramTrain.costsFromCounts(
      Map("ab" -> 50L, "c" -> 50L, "d" -> 0L), Set("ab", "c", "d"))
    // total = 100; -100 ln(0.5) = 69.31 -> 69
    assert(costs("ab") === 69L)
    assert(costs("c") === 69L)
    assert(costs("d") === 169L)
    // a piece at full mass costs max(1, 0) = 1
    assert(UnigramTrain.costsFromCounts(Map("x" -> 7L), Set("x"))("x") === 1L)
  }

  test("cost rounding is HALF-EVEN (Python 3 round), not half-up") {
    // rint(0.5) = 0 but max(1, .) floors it; rint(2.5) = 2, round would
    // give 3 — construct c/total with -100 ln(c/total) ~ 2.5:
    // ln(x) = -0.025 -> x = e^-0.025 = 0.97531; use the formula directly
    assert(math.rint(2.5) === 2.0) // the primitive the port relies on
    assert(math.rint(3.5) === 4.0)
  }

  test("viterbi picks min total cost, then min interior-cut bitmask") {
    // 'abab': {ab: 10, a: 10, b: 10, abab: 25}
    // ab+ab = 20 (mask 1<<2), a+b+a+b = 40, abab = 25 -> ab+ab wins on cost
    val c1 = Map("ab" -> 10L, "a" -> 10L, "b" -> 10L, "abab" -> 25L)
    assert(UnigramTrain.viterbi("abab", c1) === Seq("ab", "ab"))
    // tie on cost: {ab: 10, a: 5, b: 5}: ab+ab = 20 (cuts {2}),
    // a+b+ab = 20 (cuts {1,2}), ab+a+b = 20 (cuts {2,3}), a+b+a+b = 20
    // (cuts {1,2,3}) -> min bitmask = {2} = ab+ab
    val c2 = Map("ab" -> 10L, "a" -> 5L, "b" -> 5L)
    assert(UnigramTrain.viterbi("abab", c2) === Seq("ab", "ab"))
    // and with the single letters cheaper, cost wins before mask
    val c3 = Map("ab" -> 11L, "a" -> 5L, "b" -> 5L)
    assert(UnigramTrain.viterbi("abab", c3) === Seq("a", "b", "a", "b"))
  }

  test("viterbi refuses an uncoverable word loudly") {
    val e = intercept[IllegalArgumentException] {
      UnigramTrain.viterbi("xyz", Map("a" -> 1L))
    }
    assert(e.getMessage.contains("not coverable"))
  }

  test("tiny-corpus trajectory: letters always present in file order," +
    " ids 1-based and dense, repeated substrings become pieces, unused" +
    " candidates are pruned") {
    val words = Seq(("thecat", 6L), ("thedog", 5L), ("the", 9L), ("at", 2L))
    val got = UnigramTrain.learnVocab(words, n = 8)
    // ids dense 1..n in output order
    assert(got.map(_._1) === (1 to got.length))
    // letters a-z lead in alphabet order
    assert(got.take(26).map(_._2) === ('a' to 'z').map(_.toString))
    val pieces = got.map(_._2).toSet
    // the dominant substring survives training as a piece
    assert(pieces.contains("the"),
      s"expected 'the' among learned pieces: ${got.drop(26).map(_._2)}")
    // pieces the final segmentation never uses are gone: every multi-char
    // piece has finite provenance (appears in some word)
    val multi = got.drop(26).map(_._2)
    assert(multi.forall(p => words.exists(_._1.contains(p))))
    // multi-char pieces sorted by (cost asc, piece asc)
    val rest = got.drop(26)
    assert(rest === rest.sortBy(r => (r._3, r._2)))
    // determinism: the fold is a pure function of the table
    assert(UnigramTrain.learnVocab(words, n = 8) === got)
  }

  test("the letter-floor quirk is trajectory-pinned: a corpus whose" +
    " letters are all used still trains (doubled counts shift costs," +
    " never crash), and single letters are never pruned") {
    val words = Seq(("ab", 3L), ("a", 2L), ("b", 1L), ("q", 1L))
    val got = UnigramTrain.learnVocab(words, n = 4)
    assert(got.take(26).map(_._2) === ('a' to 'z').map(_.toString))
    // 'q' is used once, letters c..p never — both classes keep a row
    val costOf = got.map(r => r._2 -> r._3).toMap
    assert(costOf("q") < costOf("c"),
      "a used letter must cost less than an unused one")
  }
}
