package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.functions.BpeEncodeExpression
import graft.sources.Tables

/** B130 — BPE TRAINING in-engine (Sennrich et al., ACL'16 — the learner
  * whose frozen output b122 applies): closes the tokenizer loop so the
  * checked-in `bpe_merges.txt` is reproducibly derivable from the corpus
  * by the engine itself, not only by the offline `tools/train_bpe.py`.
  *
  * The algorithm's sufficient statistic is the WORD-FREQUENCY table —
  * pair counts, merge choices, and re-segmentation all operate on
  * (distinct word, count) rows, never on the corpus — so the distributed
  * spelling is: one map-combinable word-count aggregate over the corpus
  * (the only data-proportional work), collect the O(vocab) Zipf-bounded
  * table (the b81 manifest rule), and run the exact greedy loop on the
  * driver: rank pairs by (count DESC, left ASC, right ASC), merge
  * leftmost-first non-overlapping, repeat. This mirrors how production
  * trainers (subword-nmt, SentencePiece BPE) work — corpus-scale passes
  * are for counting words only.
  *
  * Gates (rows-only by design — training is iterative, no SQL twin):
  * at the TRAINING scale factor (sf0.01) the learned table must equal
  * the checked-in resource byte for byte — an in-entry require, so drift
  * in either implementation (this learner, the offline script, or the
  * frozen file) turns the driver row red. BpeTrainSpec additionally pins
  * the learner against an independent in-test reference and the
  * well-formedness property b122's replace-chain oracle relies on
  * (every merge side is a single char or the product of an earlier
  * merge). */
object BpeTrain {

  /** Merge count — matches the frozen b122 table. */
  val NumMerges = 64

  /** The greedy learner over a (word, count) table — the exact
    * train_bpe.py trajectory (tuple-lexicographic tie-breaks are plain
    * String ordering for the corpus's pinned a-z alphabet). */
  private[graft] def learnMerges(
      wordCounts: Seq[(String, Long)], n: Int = NumMerges): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] = wordCounts
      .groupMapReduce(w => w._1.map(_.toString).toVector)(_._2)(_ + _)
    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < n && !done) {
      val pairs = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairs.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (pairs.isEmpty) done = true
      else {
        val best = pairs.keys.minBy { case (l, r) => (-pairs((l, r)), l, r) }
        merges += best
        words = words.groupMapReduce { case (syms, _) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && (syms(i), syms(i + 1)) == best) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result()
        }(_._2)(_ + _)
        k += 1
      }
    }
    merges.result()
  }

  /** Hard cap on the word-type table the learner will collect. Natural-
    * language vocabularies are Zipf-bounded well below this, but a corpus
    * with unbounded word types (URLs, numerals, binary noise) would turn
    * the collect into a driver OOM; the cap makes that a loud failure
    * instead (ADVICE r11). 2²⁰ types ≈ tens of MB on the driver — the
    * same order as the other sanctioned driver-collect sites. */
  val MaxWordTypes = 1 << 20

  /** Distributed word counting with the bounded collect — the ONE
    * corpus-scale pass both in-engine trainers (B130 BPE, B271 unigram)
    * share: their sufficient statistic is the Zipf-bounded word-type
    * table, never the corpus. The `limit(MaxWordTypes + 1)` bounds the
    * collect ITSELF (not just a pre-count): at most cap+1 rows ever
    * reach the driver, and the +1 sentinel row distinguishes "exactly at
    * cap" from "over cap". */
  private[llm] def wordTypeCounts(docs: DataFrame): Seq[(String, Long)] = {
    val counted = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val rows = counted.limit(MaxWordTypes + 1).collect()
    require(rows.length <= MaxWordTypes,
      s"corpus has more than $MaxWordTypes distinct word types — refusing " +
        "the driver-side collect; pre-filter or normalize the corpus " +
        "(subword training only needs the Zipf head, not unbounded noise types)")
    rows.map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Distributed word counting → driver-side greedy learning. */
  def trainFromCorpus(docs: DataFrame, n: Int = NumMerges): Seq[(String, String)] =
    learnMerges(wordTypeCounts(docs), n)

  private val b130 = entryNoOracle("b130_bpe_train") { (s, d) =>
    val learned = trainFromCorpus(Tables.documents(s, d))
    if (d.stripSuffix("/").endsWith("sf0.01")) {
      require(learned == BpeEncodeExpression.merges.toSeq,
        "learner diverged from the checked-in bpe_merges.txt at its own " +
          s"training corpus: got ${learned.take(5)}... " +
          s"want ${BpeEncodeExpression.merges.take(5).toSeq}...")
    }
    import s.implicits._
    learned.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("rank", "left", "right")
  }

  val entries: Seq[Entry] = Seq(b130)
}
