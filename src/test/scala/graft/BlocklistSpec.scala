package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Blocklist
import graft.sources.Tables

/** B182 dictionary blocklist filter: JVM replay of counts and the drop
  * rule, every tier exercised on the corpus, and the zero-tolerance /
  * density semantics on crafted witnesses. */
class BlocklistSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private val sevOf = Blocklist.Terms.toMap

  test("entry equals a JVM replay; all three outcomes appear on the corpus") {
    val rows = SparkEntry.queries("b182_blocklist_filter")(spark, sf)
      .collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.length === docs.size, "audit table must cover every doc")
    rows.foreach { case (id, (nTok, nMild, nSevere, mildBp, action)) =>
      val words = docs(id).split(" ", -1)
      assert(nTok === words.length.toLong)
      assert(nMild === words.count(w => sevOf.get(w).contains(1)).toLong)
      assert(nSevere === words.count(w => sevOf.get(w).contains(2)).toLong)
      assert(mildBp === nMild * 10000 / nTok)
      val wantDrop = nSevere > 0 || mildBp >= Blocklist.ThrBp
      assert(action === (if (wantDrop) "drop" else "keep"), s"doc $id")
    }
    // the filter bites AND spares: both actions, and both drop causes
    assert(rows.exists(_._2._5 == "keep"), "filter dropped everything")
    assert(rows.exists { case (_, (_, _, ns, _, a)) => a == "drop" && ns > 0 },
      "no severe drop on the corpus")
    assert(rows.exists { case (_, (_, _, ns, bp, a)) =>
      a == "drop" && ns == 0 && bp >= Blocklist.ThrBp
    }, "no density drop on the corpus")
  }

  test("zero tolerance and density semantics on crafted witnesses") {
    import spark.implicits._
    val pad = (1 to 96).map(_ => "x").mkString(" ")
    val crafted = Seq(
      (1L, s"scan $pad x x x"),         // 1 severe in 100 tokens -> drop
      (2L, s"agg $pad x x x"),          // 1 mild = 100bp < 800 -> keep
      (3L, "agg stream agg stream x x x x x x"), // 4 mild in 10 = 4000bp -> drop
      (4L, "x y z")                      // clean -> keep, zero counts
    ).toDF("doc_id", "text")
    // run the same chain the entry runs, against the crafted corpus
    val bl = Blocklist.Terms.toDF("term", "sev")
    val hits = crafted
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(broadcast(bl), "term").groupBy("doc_id")
      .agg(sum(when(col("sev") === 1, 1L).otherwise(0L)).as("n_mild"),
        sum(when(col("sev") === 2, 1L).otherwise(0L)).as("n_severe"))
    val out = crafted
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_mild"), lit(0L)).as("n_mild"),
        coalesce(col("n_severe"), lit(0L)).as("n_severe"),
        expr("coalesce(n_mild, 0) * 10000 div n_tok").as("mild_bp"))
      .withColumn("action",
        when(col("n_severe") > 0 || col("mild_bp") >= Blocklist.ThrBp, "drop")
          .otherwise("keep"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(4)))
      .toMap
    assert(out(1L) === ((0L, 1L, "drop")))
    assert(out(2L) === ((1L, 0L, "keep")))
    assert(out(3L) === ((4L, 0L, "drop")))
    assert(out(4L) === ((0L, 0L, "keep")))
  }

  test("B183: the streamed admission log equals the batch audit table") {
    val batch = SparkEntry.queries("b182_blocklist_filter")(spark, sf)
      .collect().toSeq
    val streamed =
      SparkEntry.queries("b183_stream_blocklist_admission")(spark, sf)
        .collect().toSeq
    assert(streamed === batch)
  }
}
