package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.LineDedup
import graft.sources.Tables

/** B170 CCNet line-level dedup: planted-boilerplate removal, the
  * hashed-key scale path, and the small edge shapes (fully-boilerplate
  * doc, own-line repetition) beyond the t2 hash. */
class LineDedupSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001
  import spark.implicits._

  test("B170: planted boilerplate is removed from every carrier, organic text survives") {
    val rows = SparkEntry.queries("b170_line_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nl, nr, txt) =>
      val lines = txt.split("\n", -1)
      assert(!lines.contains(LineDedup.Header), s"doc $id: header survived")
      assert(!lines.contains(LineDedup.Footer), s"doc $id: footer survived")
      val planted = (if (id % 3 == 0) 1 else 0) + (if (id % 2 == 0) 1 else 0)
      assert(nr >= planted, s"doc $id removed $nr < planted $planted")
      assert(nl >= 1 && nr <= nl)
    }
    // the pass is surgical: some doc keeps every organic line (removes
    // exactly its planted boilerplate and nothing else)
    assert(rows.exists { case (id, _, nr, _) =>
      nr == (if (id % 3 == 0) 1 else 0) + (if (id % 2 == 0) 1 else 0)
    })
  }

  test("B170: hashed line key (100 TB shuffle path) equals the string-keyed gate path") {
    val lined = LineDedup.linedCorpus(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")))
    val strings = LineDedup.removeFrequentLines(lined).collect().toSeq
    val hashed =
      LineDedup.removeFrequentLines(lined, hashedLineKey = true).collect().toSeq
    assert(strings === hashed)
  }

  test("B170: distinct-doc counting, fully-boilerplate docs, own-line repeats") {
    val docs = (
      (1L to 11L).map(i => (i, s"shared boiler line\nunique line $i")) ++
        Seq((12L, "shared boiler line"),                 // fully boilerplate
          (13L, "repeat me\nrepeat me\nunique line 13")) // own-line repeat
      ).toDF("doc_id", "text")
    val out = LineDedup.removeFrequentLines(docs, minDocs = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    // the shared line sits in 12 distinct docs >= 10 -> removed everywhere
    (1L to 11L).foreach { i =>
      assert(out.contains((i, 2L, 1L, s"unique line $i")))
    }
    // fully-boilerplate doc keeps its row with empty text (b93 convention)
    assert(out.contains((12L, 1L, 1L, "")))
    // a doc repeating its OWN line counts as one document -> line kept,
    // both copies survive (distinct-doc semantics, not occurrence count)
    assert(out.contains((13L, 3L, 0L, "repeat me\nrepeat me\nunique line 13")))
  }

  test("B176: streamed pass-2 over the static count relation equals the batch pass") {
    val batch = SparkEntry.queries("b170_line_dedup")(spark, sf).collect().toSeq
    val streamed =
      SparkEntry.queries("b176_stream_line_dedup")(spark, sf).collect().toSeq
    assert(streamed === batch)
  }
}
