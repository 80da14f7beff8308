package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH => MlMinHashLSH}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{MinHashLsh, TextDedup}
import graft.sources.Tables

/** Cross-validation of the custom MinHash LSH against MLlib's MinHashLSH
  * (SURVEY B43 names MLlib as the primary with the custom path as
  * fallback; we ship the custom path for full determinism and use MLlib
  * as an independent referee here). Both must find the planted identical
  * pairs; jaccard distances from approxSimilarityJoin must agree with our
  * exact verification.
  */
class MllibCrossCheckSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  test("MLlib MinHashLSH finds the same identical pairs as the custom path") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val withDups = docs.unionByName(
      docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    // shingle sets → sparse binary vectors
    val shingleSets = TextDedup.shingles(withDups)
      .groupBy("doc_id").agg(collect_list(col("shingle")).as("shingles"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setBinary(true).setNumFeatures(1 << 18)
    val vectors = tf.transform(shingleSets)
    val mh = new MlMinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = mh.fit(vectors)
    val mlPairs = model.approxSimilarityJoin(vectors, vectors, 0.5, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"),
        col("dist"))
      .filter(col("a") < col("b"))
    val mlFound = mlPairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val customFound = MinHashLsh.nearDuplicates(withDups, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.filter(col("doc_id") % 25 === 0)
      .select("doc_id").collect().map(_.getLong(0))
      .map(id => (id, id + 1000000L)).toSet
    assert(planted.subsetOf(mlFound), "MLlib missed planted identical pairs")
    assert(planted.subsetOf(customFound), "custom LSH missed planted identical pairs")
    // jaccard agreement on the pairs both paths surfaced: ml dist = 1 - j
    val customJ = MinHashLsh.nearDuplicates(withDups, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (((a, b), dist) <- mlPairs.collect()
           .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
         if customJ.contains((a, b)))
      assert(math.abs((1.0 - dist) - customJ((a, b))) < 1e-4,
        s"jaccard disagreement on ($a,$b): ml=${1 - dist} custom=${customJ((a, b))}")
  }
}
