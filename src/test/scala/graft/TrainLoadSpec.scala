package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{TrainLoad, NgramLm, Winnowing}
import graft.sources.Tables

/** Round-12 training-run loading arc (B134-B140): plain-JVM replays of
  * the batch manifest and the KN scoring path, split determinism, tier
  * ordering, curriculum permutation properties, leakage planting, and
  * the plan shapes (broadcast LM model, partitioned windows). */
class TrainLoadSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001
  import spark.implicits._

  private lazy val rawDocs = Tables.documents(spark, sf)
    .select("doc_id", "source", "text")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def nTok(text: String): Long = text.split(" ", -1).length.toLong

  // ---- B134 ------------------------------------------------------------

  test("B134: plain-JVM batch replay matches lengthBatches row for row") {
    val expected = rawDocs
      .map { case (id, _, t) => (id, nTok(t)) }
      .groupBy { case (_, n) => n / TrainLoad.LenBucket }
      .toSeq
      .flatMap { case (lb, ds) =>
        ds.sortBy { case (id, n) => (n, id) }
          .grouped(TrainLoad.BatchDocs.toInt)
          .zipWithIndex
          .map { case (batch, i) =>
            val lens = batch.map(_._2)
            (lb, i.toLong, batch.length.toLong, lens.max, lens.sum,
              batch.length * lens.max - lens.sum)
          }
      }
      .sortBy { case (lb, bs, _, _, _, _) => (lb, bs) }
    val got = TrainLoad.lengthBatches(
        Tables.documents(spark, sf).select("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == expected)
    assert(got.forall(_._3 <= TrainLoad.BatchDocs))
    // within each bucket only the LAST batch may be short
    got.groupBy(_._1).foreach { case (lb, bs) =>
      bs.sortBy(_._2).dropRight(1).foreach { b =>
        assert(b._3 == TrainLoad.BatchDocs,
          s"bucket $lb: non-final batch ${b._2} is short (${b._3})")
      }
    }
  }

  test("B134 plan: the batching window is PARTITIONED (no SinglePartition)") {
    val plan = TrainLoad.lengthBatches(
        Tables.documents(spark, sf).select("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      plan.linesIterator.take(30).mkString("\n"))
  }

  // ---- B135 ------------------------------------------------------------

  private def splitOf(id: Long): String = {
    val h = Winnowing.polyFoldString(s"split:$id:v1") % 10000
    if (h < TrainLoad.TrainBp) "train"
    else if (h < TrainLoad.ValBp) "val" else "test"
  }

  test("B135: assignment replays the pure hash rule and every split is " +
    "non-empty") {
    val got = TrainLoad.splitManifest(Tables.documents(spark, sf))
      .collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(got.length == rawDocs.length)
    got.foreach { case (id, s) => assert(s == splitOf(id), s"doc $id") }
    val bySplit = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // 90/5/5 within loose binomial slack at n = 500
    assert(bySplit("train") > got.length * 8 / 10)
  }

  test("B135: membership is a pure function of doc_id — subsetting the " +
    "corpus reassigns nothing") {
    val sub = TrainLoad.splitManifest(
        Tables.documents(spark, sf).filter(col("doc_id") % 3 === 0))
      .collect().map(r => (r.getLong(0), r.getString(2)))
    sub.foreach { case (id, s) => assert(s == splitOf(id)) }
  }

  // ---- B136 ------------------------------------------------------------

  test("B136: per-source arithmetic is internally consistent and every " +
    "source tokenizes") {
    val rows = TrainLoad.fertilityReport(Tables.documents(spark, sf))
      .collect()
    assert(rows.length == rawDocs.map(_._2).distinct.length)
    rows.foreach { r =>
      val (nw, ns, nc) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ns > 0, s"source ${r.getString(0)} produced no subwords")
      assert(r.getLong(5) == ns * 10000 / nw)
      assert(r.getLong(6) == nc * 10000 / ns)
      // a-z corpus: every non-empty word emits ≥ 1 subword id
      assert(ns >= nw - r.getLong(1), // allow one empty-token word per doc
        s"source ${r.getString(0)}: fertility below the ≥1-id-per-word floor")
    }
  }

  // ---- B137 ------------------------------------------------------------

  /** Independent plain-Scala KN scoring replay (the NgramLmSpec fold,
    * extended through per-doc scoring). */
  private lazy val jvmScores: Map[Long, (Long, Long, Long)] = {
    val P = 1000000L
    val docBigrams = rawDocs.map { case (id, _, t) =>
      val w = t.split(" ", -1)
      id -> w.zip(w.drop(1)).filter(p => p._1.nonEmpty && p._2.nonEmpty).toSeq
    }
    val bg = docBigrams.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val cw1 = bg.groupBy(_._1._1).view
      .mapValues(m => (m.values.sum, m.size.toLong)).toMap
    val cont2 = bg.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val b = bg.size.toLong
    def knFp(p: (String, String)): Long = {
      val c = bg(p)
      val (cw, n1) = cw1(p._1)
      val pcont = cont2(p._2) * P / b
      math.max(4 * c - 3, 0) * P / (4 * cw) + 3 * n1 * pcont / (4 * cw)
    }
    docBigrams.filter(_._2.nonEmpty).map { case (id, ps) =>
      val s = ps.map(knFp).sum
      id -> (ps.length.toLong, s, s / ps.length)
    }.toMap
  }

  test("B137: lmScores replays the independent JVM KN scoring exactly") {
    val got = TrainLoad.lmScores(
        Tables.documents(spark, sf).select("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == jvmScores)
    assert(got.nonEmpty)
  }

  test("B137: per-source tiers are balanced and score-ordered") {
    val rows = SparkEntry.queries("b137_lm_doc_score")(spark, sf)
      .collect()
      .map(r => (r.getString(1), r.getLong(4), r.getInt(5)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sizes = rs.groupBy(_._3).view.mapValues(_.length).toMap
      assert(sizes.keySet == Set(1, 2, 3), s"source $src missing a tier")
      assert(sizes.values.max - sizes.values.min <= 1, s"source $src: $sizes")
      assert(rs.filter(_._3 == 1).map(_._2).min >=
        rs.filter(_._3 == 3).map(_._2).max,
        s"source $src: tier 1 must dominate tier 3")
    }
  }

  test("B137 plan: the KN model broadcasts into the scoring join") {
    val plan = TrainLoad.lmScores(
        Tables.documents(spark, sf).select("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      plan.linesIterator.take(30).mkString("\n"))
  }

  // ---- B138 ------------------------------------------------------------

  test("B138: each (tier, shard) position sequence is dense from 1 and the " +
    "manifest is a permutation of the scored docs") {
    val rows = SparkEntry.queries("b138_curriculum_order")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._4).toSet == jvmScores.keySet)
    assert(rows.length == jvmScores.size)
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq,
        s"tier/shard $k positions not dense")
    }
    // shard and intra-shard key replay the pure polyhash rule
    rows.foreach { case (_, shard, _, id) =>
      assert(shard ==
        Winnowing.polyFoldString(s"cur:$id") % TrainLoad.CurriculumShards)
    }
  }

  test("B138: rerun-deterministic") {
    def run() = SparkEntry.queries("b138_curriculum_order")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(run() == run())
  }

  // ---- B141 ------------------------------------------------------------

  test("B141: epoch schedule repeats each source by its fluency tier and " +
    "the manifest is epoch-dense") {
    val rows = SparkEntry.queries("b141_quality_epoch_schedule")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val perSource = rows.groupBy(_._2).view
      .mapValues(rs => rs.map(_._3).max).toMap
    assert(perSource.values.toSet == Set(1, 2, 4),
      s"tier spread must produce all three epoch levels: $perSource")
    // ntile(3) over 20 sources → 7/7/6 per tier
    val byEpochs = perSource.values.groupBy(identity).view
      .mapValues(_.size).toMap
    assert(byEpochs(4) == 7 && byEpochs(2) == 7 && byEpochs(1) == 6, byEpochs)
    // every doc of a source carries epochs 1..n_epochs exactly
    rows.groupBy(r => (r._1, r._2)).foreach { case ((id, src), rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to perSource(src)).toSeq,
        s"doc $id of $src not epoch-dense")
    }
    val docsPerSource = rawDocs.groupBy(_._2).view.mapValues(_.length).toMap
    assert(rows.length ==
      docsPerSource.map { case (s0, n) => n * perSource(s0) }.sum)
  }

  // ---- B142 ------------------------------------------------------------

  test("B142: planted exact arrivals classify 'exact', planted near " +
    "arrivals classify 'near' against their originals") {
    val rows = SparkEntry.queries("b142_incremental_dedup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getString(4)))
    val byId = rows.map(r => r._1 -> r).toMap
    val histIds = rawDocs.map(_._1).filter(_ % 4 != 3)
    val exactPlanted = histIds.filter(_ % 28 == 0)
    val nearPlanted = histIds.filter(_ % 28 == 14)
    assert(exactPlanted.nonEmpty && nearPlanted.nonEmpty)
    exactPlanted.foreach { id =>
      val r = byId(id + 2000000L)
      assert(r._5 == "exact" && r._2.contains(id), s"planted exact $id: $r")
    }
    nearPlanted.foreach { id =>
      val r = byId(id + 2000000L)
      assert(r._5 == "near", s"planted near $id: $r")
      assert(r._3.contains(id) && r._4.exists(_ >= llm.IncrementalDedup.NearBp),
        s"planted near $id best-match: $r")
      assert(r._4.exists(_ < 10000L), s"prefixed copy must not be jac 1.0: $r")
    }
    // report covers the whole batch, and most organic arrivals are new
    val batchSize = rawDocs.count(_._1 % 4 == 3) +
      exactPlanted.size + nearPlanted.size
    assert(rows.length == batchSize)
    assert(rows.count(_._5 == "new") > rawDocs.count(_._1 % 4 == 3) / 2)
  }

  // ---- B140 ------------------------------------------------------------

  test("B140: every planted leak with enough words is flagged contaminated " +
    "and no held-out doc self-reports") {
    val rows = SparkEntry.queries("b140_split_leakage")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = rows.map(r => r._1 -> r).toMap
    val planted = rawDocs.filter { case (id, _, t) =>
      splitOf(id) != "train" && id % TrainLoad.PlantMod == 0 &&
        t.split(" ", -1).length >= llm.Decontaminate.GramWords + 2
    }
    assert(planted.nonEmpty, "no planted leakage at this SF — gate vacuous")
    planted.foreach { case (id, _, _) =>
      val r = byId.get(id + TrainLoad.PlantBase)
      assert(r.exists(_._3), s"planted doc $id not flagged: $r")
    }
    // report carries train-side ids only: nothing from the held-out split
    rows.filter(_._1 < TrainLoad.PlantBase).foreach { case (id, _, _) =>
      assert(splitOf(id) == "train", s"held-out doc $id in the train report")
    }
  }

  test("B230: every class keeps exactly the min class size, and the " +
    "scramble provably de-biases against id order") {
    val sf = TestSession.sf0001
    val got = SparkEntry.queries("b230_class_balanced_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byLang = docs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nMin = byLang.values.map(_.size).min
    val kept = got.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(kept.keySet === byLang.keySet)
    kept.foreach { case (lang, ids) =>
      assert(ids.size === nMin, s"$lang kept ${ids.size} != $nMin")
      assert(ids.subsetOf(byLang(lang)), s"$lang sample not a subset")
    }
    // anti-bias (the b193 pin): for the majority class the scrambled
    // sample must differ from the lowest-doc_id prefix a raw selector keeps
    val major = byLang.maxBy(_._2.size)._1
    val idPrefix = byLang(major).toSeq.sorted.take(nMin).toSet
    assert(kept(major) !== idPrefix,
      "scrambled sample equals the id prefix - selector is id-ordered")
  }
}
