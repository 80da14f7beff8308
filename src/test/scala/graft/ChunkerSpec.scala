package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Chunker, Winnowing}
import graft.sources.Tables

/** B103 content-defined chunking: plain-JVM replay, exact coverage, the
  * edit-locality property that is CDC's entire point, and the
  * one-exchange plan shape. */
class ChunkerSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001
  import spark.implicits._

  /** JVM twin of the operator over one token list. */
  private def jvmChunks(toks: Seq[String]): Seq[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[String])
    for (i <- 1 to toks.length) {
      out.last += toks(i - 1)
      val boundary = i >= Chunker.WindowTokens && i < toks.length &&
        Winnowing.polyFoldString(
          s"cdc:${toks(i - 3)} ${toks(i - 2)} ${toks(i - 1)}") % Chunker.Modulus == 0
      if (boundary) out += scala.collection.mutable.ArrayBuffer.empty[String]
    }
    out.map(_.toSeq).toSeq
  }

  private lazy val corpus: Map[Long, String] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private lazy val sparkChunks: Map[(Long, Long), (Long, String)] =
    SparkEntry.queries("b103_text_chunks")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap

  test("B103 ≡ plain-JVM replay; chunks cover every doc exactly") {
    for ((id, text) <- corpus) {
      val jvm = jvmChunks(text.split(" ", -1).toSeq)
      val got = (1 to jvm.length).map(c =>
        sparkChunks.getOrElse((id, c.toLong),
          fail(s"doc $id missing chunk $c")))
      assert(got.map(_._2) === jvm.map(_.mkString(" ")), s"doc $id texts")
      assert(got.map(_._1) === jvm.map(_.length.toLong), s"doc $id counts")
      assert(!sparkChunks.contains((id, jvm.length + 1L)), s"doc $id extra chunk")
      assert(got.map(_._2).mkString(" ") === text, s"doc $id coverage")
    }
  }

  test("B103: a single-token edit perturbs only the local chunks") {
    // pick the doc with the most chunks so the property is observable
    val (docId, _) = sparkChunks.keys.groupBy(_._1).view.mapValues(_.size)
      .maxBy(p => (p._2, -p._1))
    val toks = corpus(docId).split(" ", -1).toVector
    val edited = (toks.take(toks.length / 2) :+ "INSERTED") ++
      toks.drop(toks.length / 2)
    val before = jvmChunks(toks).map(_.mkString(" "))
    val after = jvmChunks(edited).map(_.mkString(" "))
    assert(before.size >= 4, s"doc $docId too few chunks for the property")
    val beforeSet = before.groupBy(identity).view.mapValues(_.size).toMap
    val afterSet = after.groupBy(identity).view.mapValues(_.size).toMap
    val diff = (beforeSet.keySet ++ afterSet.keySet).toSeq
      .map(k => math.abs(beforeSet.getOrElse(k, 0) - afterSet.getOrElse(k, 0)))
      .sum
    // the edit can split/merge the chunk it lands in and its neighbor on
    // each side — a bounded-local diff; fixed-stride chunking would
    // rewrite every chunk after the edit point
    assert(diff <= 6, s"edit perturbed $diff chunks of ${before.size}")
    assert(diff < before.size, "edit rewrote the whole chunk stream")
  }

  test("B105 ≡ JVM rollup of B103's own chunks; organic dups exist") {
    val byText = sparkChunks.toSeq
      .map { case ((d, c), (n, t)) => (t, d, c, n) }
      .groupBy(_._1)
    val dupFlags = byText.values.flatMap { g =>
      val sorted = g.sortBy(x => (x._2, x._3))
      sorted.zipWithIndex.map { case ((_, d, c, n), idx) =>
        ((d, c), (idx > 0, n))
      }
    }.toMap
    val expected = dupFlags.toSeq.groupBy(_._1._1).map { case (d, xs) =>
      d -> (xs.size.toLong,
        xs.count(_._2._1).toLong,
        xs.filter(_._2._1).map(_._2._2).sum)
    }
    val got = SparkEntry.queries("b105_chunk_dedup")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expected)
    assert(got.values.map(_._2).sum > 0, "no duplicate chunks on this corpus")
    assert(got.values.map(_._3).sum > 0)
  }

  test("B103: one doc_id exchange — the rollup reuses the window's partitioning") {
    val df = Chunker.chunkify(
      Tables.documents(spark, sf).select("doc_id", "text"))
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    // window shuffle on doc_id + the final presentation orderBy; the
    // groupBy must NOT add a third
    assert(shuffles.size <= 2, plan.treeString.take(800))
    assert(!plan.toString.contains("Exchange SinglePartition"),
      "per-doc prefix sum leaked into a global window")
  }

  test("B186: sliding chunks cover every doc, overlap exactly W-S, reassemble losslessly") {
    import graft.llm.Chunker.{SlideW, SlideS}
    val chunks = SparkEntry.queries("b186_chunk_sliding")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .groupBy(_._1)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(chunks.keySet === docs.keySet)
    var sawMulti = false
    chunks.foreach { case (id, cs) =>
      val words = docs(id).split(" ", -1)
      val sorted = cs.sortBy(_._2)
      // geometry: chunk k = words[k*S, min(k*S+W, L))
      sorted.foreach { case (_, k, start, nTok, text) =>
        assert(start === k * SlideS + 1)
        val want = words.slice((k * SlideS).toInt,
          math.min(k * SlideS + SlideW, words.length).toInt)
        assert(nTok === want.length.toLong, s"doc $id chunk $k n_tok")
        assert(text === want.mkString(" "), s"doc $id chunk $k text")
      }
      // coverage: stitching non-overlap prefixes + last chunk = the doc
      val stitched = sorted.init.map(_._5.split(" ", -1).take(SlideS).mkString(" ")) :+
        sorted.last._5
      assert(stitched.mkString(" ") === docs(id), s"doc $id reassembly")
      // overlap: consecutive full chunks share exactly W-S words
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val aw = a._5.split(" ", -1); val bw = b._5.split(" ", -1)
          if (aw.length == SlideW)
            assert(aw.takeRight(SlideW - SlideS).toSeq ===
              bw.take(SlideW - SlideS).toSeq, s"doc $id overlap at ${b._2}")
          sawMulti = true
        case _ =>
      }
    }
    assert(sawMulti, "no doc produced >= 2 chunks — geometry untested")
  }

  test("B191: chunks landed from the ingest stream equal the batch chunk table") {
    val batch = SparkEntry.queries("b186_chunk_sliding")(spark, sf)
      .collect().toSeq
    val streamed = SparkEntry.queries("b191_stream_chunk_ingest")(spark, sf)
      .collect().toSeq
    assert(streamed === batch)
  }
}
