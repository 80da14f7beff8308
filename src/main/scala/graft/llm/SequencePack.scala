package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** Fixed-length SEQUENCE PACKING (SURVEY §2B round-7 row B97) — the
  * training-data step that turns a cleaned corpus into model-ready
  * fixed-token sequences: concatenate all documents in a deterministic
  * order and slice the token stream into SEQ-length windows (the
  * GPT-2/LLaMA pretraining convention — document boundaries do NOT align
  * with sequence boundaries; a doc straddling a boundary is split across
  * consecutive sequences). The output is the packing MANIFEST: one row
  * per (sequence, document) slice with the doc-relative offset and
  * length, which is exactly what a loader needs to materialize sequences
  * without ever shuffling the text itself.
  *
  * Tokens are whitespace tokens (`size(split(text, ' '))` — the b45
  * convention; an empty doc counts one empty token, so every doc owns a
  * non-empty token range and appears in the manifest).
  *
  * The core primitive is a GLOBAL prefix sum over doc_id order — the
  * naive spelling (`sum() OVER (ORDER BY doc_id)` with no partition) is
  * the classic Spark anti-pattern: an Exchange SinglePartition that
  * funnels the whole corpus through one task. This implementation is the
  * distributed two-phase scan instead:
  *
  *   1. range-bucket by doc_id (`doc_id div W` — order-preserving);
  *      per-bucket token totals aggregate map-side and only O(buckets)
  *      scalars reach the driver (the b81 manifest rule), where the
  *      bucket-level prefix is folded and broadcast back;
  *   2. within each bucket a PARTITIONED window (partitionBy bucket)
  *      computes the local prefix in parallel; global offset =
  *      bucket offset + local prefix − own tokens.
  *
  * SinglePartition-freedom is spec-asserted (SequencePackSpec); the
  * DuckDB oracle keeps the naive global-window spelling, which is the
  * point — same relation, different physical plan. At 100 TB: W sizes
  * bucket cardinality (corpus/W driver scalars, e.g. 1e10 docs / 1e6 W =
  * 1e4 scalars), the heavy window parallelizes per bucket, and the
  * manifest is O(docs + straddles), never O(tokens).
  */
object SequencePack {

  /** Tokens per training sequence (power of two, the usual convention). */
  val SeqLen = 512

  /** doc_id range per scan bucket — tune so corpus/W driver scalars stay
    * O(manifest) and each bucket's window fits an executor. */
  val BucketWidth = 100L

  /** Packing manifest: (seq_id, doc_id, doc_off, n_toks) — sequence
    * `seq_id` contains `n_toks` tokens of `doc_id` starting at its
    * doc-relative token offset `doc_off`. Every doc's slices concatenate
    * to the whole doc; every sequence except the last holds exactly
    * `seqLen` tokens (both invariants spec-pinned). */
  def packManifest(docs: DataFrame, seqLen: Int = SeqLen,
      bucketWidth: Long = BucketWidth): DataFrame =
    packSpans(
      docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok")),
      seqLen, bucketWidth)

  /** The two-phase scan over an arbitrary (doc_id, n_tok) token-count
    * relation — B97 feeds whitespace counts, B131 feeds BPE id counts;
    * the packing algebra is count-source-agnostic. */
  def packSpans(tokCounts: DataFrame, seqLen: Int = SeqLen,
      bucketWidth: Long = BucketWidth): DataFrame = {
    val spark = tokCounts.sparkSession
    import spark.implicits._
    val toks = tokCounts
      .withColumn("bucket", expr(s"doc_id div $bucketWidth"))
    // phase 1: per-bucket totals → driver prefix fold (O(buckets) scalars)
    val bucketSums = toks.groupBy("bucket").agg(sum("n_tok").as("btok"))
      .orderBy("bucket").collect()
    var acc = 0L
    val offsets = bucketSums.map { r =>
      val off = (r.getLong(0), acc); acc += r.getLong(1); off
    }.toSeq
    val offDf = offsets.toDF("bucket", "bucket_off")
    // phase 2: parallel within-bucket prefix; global start = bucket_off +
    // local prefix − own tokens (start is 0-based, end exclusive)
    val wBucket = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
    val spans = toks.join(broadcast(offDf), "bucket")
      .withColumn("start",
        col("bucket_off") + sum(col("n_tok")).over(wBucket) - col("n_tok"))
      .withColumn("first_seq", expr(s"start div $seqLen"))
      .withColumn("last_seq", expr(s"(start + n_tok - 1) div $seqLen"))
    spans
      .select(col("doc_id"), col("n_tok"), col("start"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .withColumn("lo", greatest(col("start"), col("seq_id") * seqLen))
      .withColumn("hi",
        least(col("start") + col("n_tok"), (col("seq_id") + 1) * seqLen))
      .select(col("seq_id"), col("doc_id"),
        (col("lo") - col("start")).as("doc_off"),
        (col("hi") - col("lo")).as("n_toks"))
      .orderBy("seq_id", "doc_id")
  }

  /** B97 — sequence-packing manifest over the documents table. The
    * oracle is the NAIVE global-window spelling; the Spark side is the
    * two-phase scan — hash-equality pins that the distributed scan
    * computes exactly the sequential prefix sum. */
  private val b97 = entry(
    "b97_sequence_pack",
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |offs AS (
       |  SELECT doc_id, n_tok,
       |         CAST(sum(n_tok) OVER (ORDER BY doc_id
       |                               ROWS UNBOUNDED PRECEDING) - n_tok
       |              AS BIGINT) AS start
       |  FROM toks),
       |spans AS (
       |  SELECT doc_id, n_tok, start,
       |         start // ${SeqLen} AS first_seq,
       |         (start + n_tok - 1) // ${SeqLen} AS last_seq
       |  FROM offs),
       |manifest AS (
       |  SELECT unnest(generate_series(first_seq, last_seq)) AS seq_id,
       |         doc_id, n_tok, start
       |  FROM spans)
       |SELECT seq_id, doc_id,
       |       greatest(start, seq_id * ${SeqLen}) - start AS doc_off,
       |       least(start + n_tok, (seq_id + 1) * ${SeqLen})
       |         - greatest(start, seq_id * ${SeqLen}) AS n_toks
       |FROM manifest
       |ORDER BY seq_id, doc_id""".stripMargin) { (s, d) =>
    packManifest(Tables.documents(s, d).select(col("doc_id"), col("text")))
  }

  val entries: Seq[Entry] = Seq(b97)
}
