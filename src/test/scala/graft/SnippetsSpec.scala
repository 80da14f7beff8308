package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Snippets
import graft.sources.Tables

/** B181 KWIC snippet extraction: JVM brute-force replay of the window
  * argmax, the leftmost tie rule on a crafted witness, short-doc
  * truncation, and snippet-content consistency. */
class SnippetsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private def brute(words: Array[String]): Option[(Long, Long, Long, String)] = {
    val hits = words.map(w => if (Snippets.Terms.contains(w)) 1 else 0)
    val total = hits.sum.toLong
    if (total == 0) return None
    val nStarts = math.max(words.length - Snippets.W + 1, 1)
    val scores = (0 until nStarts)
      .map(s => hits.slice(s, s + Snippets.W).sum)
    val best = scores.max
    val start = scores.indexOf(best) // first occurrence = leftmost
    Some((total, best.toLong, start + 1L,
      words.slice(start, start + Snippets.W).mkString(" ")))
  }

  test("entry equals a JVM brute-force replay on every corpus doc") {
    val got = SparkEntry.queries("b181_snippet_extract")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)
    var matched = 0
    docs.foreach { case (id, text) =>
      brute(text.split(" ", -1)) match {
        case Some(want) =>
          assert(got.get(id).contains(want), s"doc $id diverged")
          matched += 1
        case None =>
          assert(!got.contains(id), s"doc $id has no hits but was emitted")
      }
    }
    assert(matched === got.size)
    assert(matched > 0, "no corpus doc matched the query — test is vacuous")
  }

  test("ties break leftmost; short docs emit whole-doc snippets") {
    import spark.implicits._
    // two disjoint windows score 2; the leftmost (start 1) must win
    val tie = "window agg x x x x x x x x x x window agg x x x x x x"
    // short doc: 4 words, one hit -> snippet is the whole doc
    val short = "a stream b c"
    val df = Seq((1L, tie), (2L, short)).toDF("doc_id", "text")
      .withColumn("w", split(col("text"), " "))
    val rows = df.collect().map(r =>
      (r.getLong(0), brute(r.getString(1).split(" ", -1)).get))
    val byId = rows.toMap
    assert(byId(1L)._3 === 1L, "tie did not break leftmost")
    assert(byId(1L)._2 === 2L)
    assert(byId(2L) === ((1L, 1L, 1L, "a stream b c")))
    // and the Spark spelling agrees on the same crafted corpus
    val sparkRows = {
      val inList = Snippets.Terms.map(t => s"'$t'").mkString(", ")
      df.withColumn("hits", expr(s"transform(w, t -> CAST(t IN ($inList) AS INT))"))
        .withColumn("total_hits", expr("CAST(aggregate(hits, 0, (a, x) -> a + x) AS BIGINT)"))
        .withColumn("n_starts", greatest(size(col("w")) - lit(Snippets.W - 1), lit(1)))
        .withColumn("scores", expr(
          s"transform(sequence(1, n_starts), s -> aggregate(slice(hits, s, ${Snippets.W}), 0, (a, x) -> a + x))"))
        .withColumn("win_hits", expr("CAST(array_max(scores) AS BIGINT)"))
        .withColumn("best_start", expr("CAST(array_position(scores, array_max(scores)) AS BIGINT)"))
        .select(col("doc_id"), col("total_hits"), col("win_hits"), col("best_start"),
          expr(s"array_join(slice(w, CAST(best_start AS INT), ${Snippets.W}), ' ')").as("snippet"))
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
        .toMap
    }
    assert(sparkRows === byId)
  }

  test("B184: serve page preserves b107's ranking and snippets per-query terms") {
    val page = SparkEntry.queries("b184_serve_page")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getString(6)))
    assert(page.nonEmpty)
    // the ranking columns are b107's, row for row
    val ranked = SparkEntry.queries("b107_text_bm25")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(page.map(p => (p._1, p._2, p._3, p._4)).toSeq === ranked.toSeq)
    // every snippet carries >= 1 hit, counted against ITS query's terms
    val termsOf = graft.llm.Retrieval.QueryTerms.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    page.foreach { case (q, _, _, _, winHits, snippet) =>
      assert(winHits >= 1L)
      val inSnippet = snippet.split(" ", -1).count(termsOf(q).contains).toLong
      assert(inSnippet === winHits,
        s"query $q snippet '$snippet' carries $inSnippet, claimed $winHits")
    }
  }

  test("every snippet carries exactly win_hits query-term occurrences") {
    val rows = SparkEntry.queries("b181_snippet_extract")(spark, sf)
      .collect().map(r => (r.getLong(2), r.getString(4)))
    rows.foreach { case (winHits, snippet) =>
      val inSnippet = snippet.split(" ", -1).count(Snippets.Terms.contains)
      assert(inSnippet.toLong === winHits,
        s"snippet '$snippet' carries $inSnippet hits, claimed $winHits")
      assert(snippet.split(" ", -1).length <= Snippets.W)
    }
  }

  test("B229: the packed context is a maximal rank prefix under the budget") {
    val sf = TestSession.sf0001
    val got = SparkEntry.queries("b229_rag_context_pack")(spark, sf).collect()
      .map(r => (r.getAs[Any](0).toString, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](4).longValue,
        r.getAs[Number](5).longValue))
    val ranked = graft.llm.Retrieval.bm25TopDocsScan(spark, sf).collect()
      .map(r => (r.getAs[Any](0).toString, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue))
    val tok = graft.sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.expr(
          "CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT)"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val rns = rows.map(_._2).sorted.toSeq
      assert(rns === (1L to rns.length).toSeq, s"$q: kept set is not a prefix")
      val cum = rows.maxBy(_._2)._5
      assert(cum <= 256L, s"$q: budget exceeded")
      // maximality: the next-ranked doc (if any) would not have fit
      ranked.filter(r => r._1 == q && r._2 == rns.length + 1).foreach { nxt =>
        assert(cum + tok(nxt._3) > 256L, s"$q: next doc would still fit")
      }
    }
    // the budget binds somewhere: at least one query truncates its top-10
    val truncated = got.groupBy(_._1).exists { case (q, rows) =>
      rows.length < ranked.count(_._1 == q)
    }
    assert(truncated, "no query truncated - budget vacuous")
  }
}
