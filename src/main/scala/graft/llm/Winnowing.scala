package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (the rolling-hash fingerprinting scheme
  * from the MOSS local-fingerprinting algorithm): hash every k-gram at
  * every position, then keep the minimum hash of each sliding window of w
  * consecutive positions. Any sufficiently long match between two
  * documents is guaranteed to share at least one selected fingerprint —
  * the copy-detection property exact dedup lacks and MinHash only gives
  * probabilistically.
  *
  * Scale posture: position hashing is a narrow projection; window minima
  * are one window pass partitioned by doc (shuffle on doc_id only);
  * fingerprints shuffle as (hash, doc) pairs for the inverted index. The
  * per-doc fingerprint count is |doc|/w on average — sublinear output.
  */
object Winnowing {
  val K = 5 // k-gram length (characters)
  val W = 8 // window width (positions)

  /** (doc_id, fingerprint) — distinct window-minimum k-gram hashes. */
  def fingerprints(docs: DataFrame): DataFrame = {
    val grams = docs
      .filter(length(col("text")) >= K)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, length(text) - ${K - 1}), i -> xxhash64(substring(text, i, $K)))")))
      .select(col("doc_id"), col("pos"), col("col").as("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, W - 1)
    grams
      .select(col("doc_id"), min(col("h")).over(w).as("fp"))
      .distinct()
  }

  /** Documents sharing ≥ `minShared` fingerprints with a probe doc —
    * the inverted-index containment query (plagiarism-/contamination-
    * detection shape: probe = eval set, corpus = training data). */
  def sharedFingerprints(probes: DataFrame, corpus: DataFrame, minShared: Int): DataFrame = {
    val pf = fingerprints(probes).select(col("doc_id").as("probe_id"), col("fp"))
    val cf = fingerprints(corpus).select(col("doc_id").as("corpus_id"), col("fp"))
    pf.join(cf, "fp")
      .filter(col("probe_id") =!= col("corpus_id"))
      .groupBy("probe_id", "corpus_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
