package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{TrainLoad, IncrementalDedup, Winnowing}

/** Definition-level randomized checks for the round-12 training-run ops:
  * plain-JVM oracles that share NOTHING with either engine's SQL
  * spelling, run over deterministic pseudo-random tiny-vocab corpora —
  * the degenerate-shape regime (empty docs, one-word docs, heavy
  * duplication) the gate corpus never exercises. The LCG-seeded corpora
  * keep runs reproducible without Random. */
class TrainLoadPropertySpec extends AnyFunSuite {
  private val spark = TestSession.spark
  import spark.implicits._

  private def lcg(s: Long): Long =
    s * 6364136223846793005L + 1442695040888963407L

  /** Deterministic corpus: ~n docs over an 8-word vocab, including empty
    * docs, one-word docs, and exact duplicates. */
  private def corpus(seed: Int, n: Int): Seq[(Long, String)] = {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    var st = seed.toLong
    (0 until n).map { i =>
      st = lcg(st)
      val mode = math.floorMod(st, 10L)
      val text =
        if (mode == 0) "" // empty doc
        else if (mode == 1) vocab(math.floorMod(st >> 8, 8L).toInt) // 1 word
        else {
          val len = 2 + math.floorMod(st >> 16, 12L).toInt
          (0 until len).map { _ =>
            st = lcg(st); vocab(math.floorMod(st, 8L).toInt)
          }.mkString(" ")
        }
      (i.toLong, text)
    }
  }

  test("B134 property: batch manifest replays the sequential JVM packing " +
    "on random corpora (incl. empty and 1-word docs)") {
    for (seed <- 1 to 3) {
      val docs = corpus(seed, 120)
      val expected = docs
        .map { case (id, t) => (id, t.split(" ", -1).length.toLong) }
        .groupBy { case (_, w) => w / TrainLoad.LenBucket }
        .toSeq
        .flatMap { case (lb, ds) =>
          ds.sortBy { case (id, w) => (w, id) }
            .grouped(TrainLoad.BatchDocs.toInt).zipWithIndex
            .map { case (b, i) =>
              val ls = b.map(_._2)
              (lb, i.toLong, b.length.toLong, ls.max, ls.sum,
                b.length * ls.max - ls.sum)
            }
        }
        .sortBy(r => (r._1, r._2))
      val got = TrainLoad.lengthBatches(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
      assert(got == expected, s"seed $seed")
    }
  }

  test("B137 property: KN self-scoring replays the independent JVM fold " +
    "on random corpora (heavy bigram duplication)") {
    val P = 1000000L
    for (seed <- 1 to 3) {
      val docs = corpus(seed, 80)
      val docBigrams = docs.map { case (id, t) =>
        val w = t.split(" ", -1)
        id -> w.zip(w.drop(1)).filter(p => p._1.nonEmpty && p._2.nonEmpty).toSeq
      }
      val bg = docBigrams.flatMap(_._2).groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
      if (bg.nonEmpty) {
        val cw1 = bg.groupBy(_._1._1).view
          .mapValues(m => (m.values.sum, m.size.toLong)).toMap
        val cont2 = bg.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
        val b = bg.size.toLong
        def knFp(p: (String, String)): Long = {
          val c = bg(p); val (cw, n1) = cw1(p._1)
          math.max(4 * c - 3, 0) * P / (4 * cw) +
            3 * n1 * (cont2(p._2) * P / b) / (4 * cw)
        }
        val expected = docBigrams.filter(_._2.nonEmpty).map { case (id, ps) =>
          val s = ps.map(knFp).sum
          id -> (ps.length.toLong, s, s / ps.length)
        }.toMap
        val got = TrainLoad.lmScores(docs.toDF("doc_id", "text"))
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
          .toMap
        assert(got == expected, s"seed $seed")
      }
    }
  }

  test("B142 property: incremental classification replays a brute-force " +
    "JVM oracle on random corpora with duplication") {
    def shingleSet(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    for (seed <- 4 to 6) {
      val docs = corpus(seed, 100)
      val hist = docs.filter(_._1 % 3 != 0)
      val batch = docs.filter(_._1 % 3 == 0)
        .map { case (id, t) => (id + 500L, t) } // re-keyed arrivals
      val expected = batch.map { case (id, t) =>
        val exactOf = hist.filter(_._2 == t).map(_._1).sorted.headOption
        val sa = shingleSet(t)
        val cands = hist.flatMap { case (hid, ht) =>
          val sb = shingleSet(ht)
          val common = (sa intersect sb).size.toLong
          if (common == 0) None
          else {
            val u = sa.size + sb.size - common
            Some((hid, common * 10000L / u))
          }
        }
        val best = cands.sortBy { case (hid, j) => (-j, hid) }.headOption
        val status =
          if (exactOf.isDefined) "exact"
          else if (best.exists(_._2 >= IncrementalDedup.NearBp)) "near"
          else "new"
        (id, exactOf, best.map(_._1), best.map(_._2), status)
      }.sortBy(_._1)
      val got = IncrementalDedup.dedupAgainstHistory(
          hist.toDF("doc_id", "text"), batch.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getString(4))).toSeq
      assert(got == expected, s"seed $seed")
    }
  }

  test("B135 property: split thresholds partition the hash space exactly " +
    "and the salt keeps all three splits populated at modest n") {
    val ids = (0L until 2000L).toSeq
    val splits = ids.map { id =>
      val h = Winnowing.polyFoldString(s"split:$id:v1") % 10000
      if (h < TrainLoad.TrainBp) "train"
      else if (h < TrainLoad.ValBp) "val" else "test"
    }
    val counts = splits.groupBy(identity).view.mapValues(_.length).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // 90/5/5 within generous binomial slack at n = 2000
    assert(math.abs(counts("train") - 1800) < 120, counts.toString)
    assert(math.abs(counts("val") - 100) < 60, counts.toString)
    assert(math.abs(counts("test") - 100) < 60, counts.toString)
  }
}
