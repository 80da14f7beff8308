package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Winnowing
import graft.sources.Tables

class WinnowingSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  test("identical documents share all fingerprints; winnowing is sublinear") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 50)
    val dups = docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val fps = Winnowing.fingerprints(docs.unionByName(dups)).cache()
    val a = fps.filter(col("doc_id") < 50)
      .withColumnRenamed("doc_id", "a")
    val b = fps.filter(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("a"), col("fp").as("fp_b"))
    // identical text → identical fingerprint sets
    assert(a.join(b, a("a") === b("a") && col("fp") === col("fp_b")).count()
      === a.count())
    // sublinear: far fewer fingerprints than characters
    val nChars = docs.agg(sum(length(col("text")))).collect().head.getLong(0)
    assert(fps.filter(col("doc_id") < 50).count() < nChars / 4)
    fps.unpersist()
  }

  test("JVM polyFoldString equals the Spark SQL fold on non-ASCII incl. astral") {
    import spark.implicits._
    val samples = Seq(
      "plain ascii only here",
      "accented éèü and ç text",
      "中文文本处理测试",
      "astral 𝄞 clef and 😀 emoji mix",
      "mixéd 中 𝄞 ascii ü 😀 tail")
    val sparkFolds = samples.toDF("text")
      .select(expr(Winnowing.polyFoldSpark("text")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(sparkFolds === samples.map(Winnowing.polyFoldString),
      "the JVM codePoints fold (decodeStub's path) diverged from the SQL fold")
  }

  test("embedded substring is detected via shared fingerprints") {
    import spark.implicits._
    val base = Tables.documents(spark, sf)
      .filter(col("doc_id") === 3).select("text").collect().head.getString(0)
    val fragment = base.substring(20, math.min(140, base.length))
    val probe = Seq((9999L, s"unrelated prefix words $fragment unrelated suffix"))
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, sf)
      .filter(col("doc_id") < 100).select(col("doc_id"), col("text"))
    val hits = Winnowing.sharedFingerprints(probe, corpus, minShared = 3)
      .collect().map(r => r.getLong(1))
    assert(hits.contains(3L), s"embedded fragment of doc 3 not detected: ${hits.mkString(",")}")
  }
}
