package graft.llm

import org.apache.spark.sql.DataFrame
import graft.Registry._
import graft.functions.UnigramEncodeExpression
import graft.sources.Tables

/** B271 — UNIGRAM-LM TRAINING in-engine (Kudo, ACL'18 — the
  * SentencePiece unigram model whose frozen output b152 applies): closes
  * the LAST offline trainer (the r16 verdict's "what's missing #4") so
  * the checked-in `unigram_vocab.txt` is reproducibly derivable from the
  * corpus by the engine itself, not only by `tools/train_unigram.py`.
  *
  * Same shape as B130's BPE learner: the algorithm's sufficient
  * statistic is the WORD-FREQUENCY table — candidate seeding, the
  * EM/prune rounds (Viterbi-segment every distinct word, re-estimate
  * piece usage, re-derive integer costs) and the final re-score all
  * operate on (distinct word, count) rows, never on the corpus — so the
  * distributed spelling is ONE map-combinable word-count aggregate (the
  * shared [[BpeTrain.wordTypeCounts]] bounded collect) and the exact
  * deterministic loop on the driver, mirroring how SentencePiece itself
  * trains (corpus passes count; EM folds run on the table).
  *
  * The port replicates train_unigram.py's TRAJECTORY bit for bit,
  * including two behaviors that only the frozen-file equality gate would
  * catch: Python 3's `round` is round-HALF-EVEN (ported as math.rint,
  * not math.round), and the post-round letter floor uses Counter.update,
  * which ADDS — a USED letter's count doubles while an unused one gets
  * 1. Both are part of the frozen tokenizer's identity now; diverging
  * from either changes costs and the gate goes red.
  *
  * Gates (rows-only by design — training is iterative, no SQL twin): at
  * the TRAINING scale factor (sf0.01) the learned table must equal the
  * checked-in resource piece-for-piece and cost-for-cost — an in-entry
  * require, so drift in the learner, the offline script, or the frozen
  * file turns the driver row red. UnigramTrainSpec pins the Viterbi
  * tie-break (interior-cut bitmask), the integer cost formula, the
  * EM prune, and the tiny-corpus trajectory against hand-computed
  * values. */
object UnigramTrain {

  /** Multi-char piece budget and max piece length — train_unigram.py's. */
  val NumPieces = 64
  val MaxLen = 4

  private val Letters: Seq[String] = ('a' to 'z').map(_.toString)

  /** cost = max(1, rint(−100·ln(c/total))) for used pieces; unused (but
    * kept — letters) get the max observed cost + 100. rint = Python 3
    * round (half-even). */
  private[graft] def costsFromCounts(counts: Map[String, Long],
      vocab: Set[String]): Map[String, Long] = {
    val total = math.max(1L, vocab.iterator.map(counts.getOrElse(_, 0L)).sum)
    val used = vocab.iterator.flatMap { p =>
      val c = counts.getOrElse(p, 0L)
      if (c > 0)
        Some(p -> math.max(1L,
          math.rint(-100.0 * math.log(c.toDouble / total)).toLong))
      else None
    }.toMap
    val mx = if (used.nonEmpty) used.values.max else 100L
    vocab.iterator.map(p => p -> used.getOrElse(p, mx + 100L)).toMap
  }

  /** Min-total-cost segmentation; ties → min interior-cut bitmask (bit i
    * = cut at position i — the composable sequence tie-break b152's
    * runtime expression shares). BigInt mask: Python's is arbitrary-
    * precision, and a Long would alias cuts past bit 62. */
  private[graft] def viterbi(w: String, costs: Map[String, Long]): Seq[String] = {
    val L = w.length
    val infC = Long.MaxValue / 4
    val cost = Array.fill(L + 1)(infC)
    val mask = Array.fill[BigInt](L + 1)(null)
    val backPos = Array.fill(L + 1)(-1)
    val backPiece = Array.fill[String](L + 1)(null)
    cost(0) = 0L; mask(0) = BigInt(0)
    var i = 0
    while (i < L) {
      if (cost(i) < infC) {
        var len = 1
        val maxLen = math.min(MaxLen, L - i)
        while (len <= maxLen) {
          val p = w.substring(i, i + len)
          costs.get(p) match {
            case Some(c) =>
              val j = i + len
              val nc = cost(i) + c
              val nm = if (i > 0) mask(i) + (BigInt(1) << i) else mask(i)
              if (nc < cost(j) || (nc == cost(j) && nm < mask(j))) {
                cost(j) = nc; mask(j) = nm; backPos(j) = i; backPiece(j) = p
              }
            case None =>
          }
          len += 1
        }
      }
      i += 1
    }
    require(cost(L) < infC, s"word '$w' not coverable by the vocabulary")
    var out = List.empty[String]
    var j = L
    while (j > 0) { out ::= backPiece(j); j = backPos(j) }
    out
  }

  /** The exact train_unigram.py loop over a (word, count) table:
    * (id, piece, cost) in file order (letters a-z first, then kept
    * pieces by (cost asc, piece asc); the 1-based position IS the id). */
  private[graft] def learnVocab(wordCounts: Seq[(String, Long)],
      n: Int = NumPieces): Seq[(Int, String, Long)] = {
    val words: Map[String, Long] =
      wordCounts.groupMapReduce(_._1)(_._2)(_ + _)
    // 1. seed candidates: substrings of length 2..MaxLen, word-weighted
    val cand = collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length;
         ln <- 2 to MaxLen if i + ln <= w.length) {
      val p = w.substring(i, i + ln)
      cand.update(p, cand.getOrElse(p, 0L) + c)
    }
    var vocab: Set[String] =
      cand.iterator.collect { case (p, c) if c >= 2 => p }.toSet ++ Letters
    // seed counts: candidate mass; letters floor at 1 (they are not in
    // cand, so Counter.update adds exactly 1)
    var counts: Map[String, Long] =
      vocab.iterator.map(p => p -> cand.getOrElse(p, 0L)).toMap ++
        Letters.map(_ -> 1L)
    def usageUnder(costs: Map[String, Long]): Map[String, Long] = {
      val usage = collection.mutable.Map.empty[String, Long]
      for ((w, c) <- words; p <- viterbi(w, costs))
        usage.update(p, usage.getOrElse(p, 0L) + c)
      usage.toMap
    }
    // 2. EM-style refinement
    for (_ <- 1 to 3) {
      val usage = usageUnder(costsFromCounts(counts, vocab))
      vocab = vocab.filter(p => usage.getOrElse(p, 0L) > 0 || p.length == 1)
      // Counter.update ADDS {letter: counts.get(l, 0) or 1}: a used
      // letter DOUBLES, an unused one gets 1 (trajectory-pinned quirk)
      counts = usage ++ Letters.map { l =>
        val u = usage.getOrElse(l, 0L)
        l -> (if (u > 0) u * 2 else 1L)
      }
    }
    // 3. prune to top-n multi-char by (usage desc, piece asc)
    val multi = vocab.iterator.filter(_.length > 1).toSeq
      .sortBy(p => (-counts.getOrElse(p, 0L), p)).take(n)
    vocab = multi.toSet ++ Letters
    // 4. final re-score
    val finalCosts =
      costsFromCounts(usageUnder(costsFromCounts(counts, vocab)), vocab)
    val rest = vocab.iterator.filter(_.length > 1).toSeq
      .sortBy(p => (finalCosts(p), p))
    (Letters ++ rest).zipWithIndex
      .map { case (p, i) => (i + 1, p, finalCosts(p)) }
  }

  private val b271 = entryNoOracle("b271_unigram_train") { (s, d) =>
    val learned = learnVocab(BpeTrain.wordTypeCounts(Tables.documents(s, d)))
    if (d.stripSuffix("/").endsWith("sf0.01")) {
      val frozen = UnigramEncodeExpression.vocab.zipWithIndex
        .map { case ((p, c), i) => (i + 1, p, c.toLong) }
      require(learned == frozen,
        "learner diverged from the checked-in unigram_vocab.txt at its " +
          s"own training corpus: got ${learned.take(3)}... " +
          s"want ${frozen.take(3)}...")
    }
    import s.implicits._
    learned.toDF("id", "piece", "cost")
  }

  val entries: Seq[Entry] = Seq(b271)
}
