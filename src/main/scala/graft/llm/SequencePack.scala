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

  /** doc_id range per BFD packing shard — each shard's bin set is built
    * independently, so this is the unit of parallelism AND the bound on
    * any sequential state (VERDICT r12 item 6). */
  val ShardWidth = 100L

  private[llm] final case class PackItem(shard: Long, doc_id: Long, n_tok: Long)
  private[llm] final case class PackedRow(
      shard: Long, bin_no: Long, doc_id: Long, n_tok: Long)

  /** B154 — BEST-FIT-DECREASING bin packing: the non-splitting
    * alternative to [[packSpans]] for workloads where documents must not
    * straddle sequence boundaries (instruction tuning, contrastive
    * pairs). Docs are packed WHOLE into fixed-capacity bins; the
    * manifest carries the padding-waste column packSpans never needs
    * (straddling packs waste-free by construction; whole-doc packing
    * trades waste for boundary integrity).
    *
    * Within each deterministic doc_id-range shard, classical BFD
    * (Johnson '73): items in (n_tok DESC, doc_id) order, each into the
    * FULLEST bin that still fits (ties → lowest bin index), else a new
    * bin. BFD waste is provably ≤ next-fit's (SequencePackSpec measures
    * both) and ≤ (11/9)·OPT + 1 bins asymptotically. A doc longer than
    * seqLen fits no bin and lands alone in its own (waste-0) bin.
    *
    * Scale posture: packing is sequential ONLY within a shard (the
    * groupByKey ships O(shardWidth) (doc_id, n_tok) pairs per group —
    * counts, never text); shards pack in parallel across executors and
    * shard width bounds the per-task state, so the plan holds at any
    * corpus size. Bin fill/waste is one partial-agg join on the packed
    * manifest. The (shard, bin_no) pair is the global sequence key —
    * numbering is shard-local by design so no global prefix is needed. */
  def packBestFit(docs: DataFrame, seqLen: Int = SeqLen,
      shardWidth: Long = ShardWidth): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val items = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("shard", expr(s"doc_id div $shardWidth"))
      .as[PackItem]
    val packed = items.groupByKey(_.shard)
      .flatMapSortedGroups(col("n_tok").desc, col("doc_id")) { (shard, it) =>
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.map { item =>
          var best = -1
          var bestLoad = -1L
          var j = 0
          while (j < loads.length) {
            val l = loads(j)
            if (l + item.n_tok <= seqLen && l > bestLoad) {
              best = j; bestLoad = l
            }
            j += 1
          }
          val bin =
            if (best >= 0) { loads(best) += item.n_tok; best }
            else { loads += item.n_tok; loads.length - 1 }
          PackedRow(shard, bin.toLong, item.doc_id, item.n_tok)
        }
      }
      .toDF()
    val fills = packed.groupBy("shard", "bin_no")
      .agg(sum("n_tok").as("bin_fill"))
    packed.join(fills, Seq("shard", "bin_no"))
      .select(col("shard"), col("bin_no"), col("doc_id"), col("n_tok"),
        col("bin_fill"),
        greatest(lit(0L), lit(seqLen.toLong) - col("bin_fill")).as("bin_waste"))
      .orderBy("shard", "bin_no", "doc_id")
  }

  /** B154 oracle: the recursive CTE SIMULATES per-shard BFD exactly —
    * state is one row per (shard, step) carrying the bin-load list and
    * the per-item bin assignment; the lateral picks the fullest fitting
    * bin (list_position = lowest index on load ties, matching the Spark
    * fold's strict `>` scan). Hash-equality pins the whole greedy
    * trajectory, not just aggregate waste. */
  private val b154 = entry(
    "b154_pack_bestfit",
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id, doc_id // $ShardWidth AS shard,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |ord AS (
       |  SELECT shard, doc_id, n_tok,
       |         CAST(row_number() OVER (PARTITION BY shard
       |                                 ORDER BY n_tok DESC, doc_id)
       |              AS BIGINT) AS rn
       |  FROM toks),
       |cnt AS (SELECT shard, count(*) AS n FROM ord GROUP BY shard),
       |sim(shard, i, loads, bins) AS (
       |  SELECT shard, CAST(0 AS BIGINT), CAST([] AS BIGINT[]),
       |         CAST([] AS BIGINT[])
       |  FROM cnt
       |  UNION ALL
       |  SELECT s.shard, s.i + 1,
       |    CASE WHEN t.mx IS NULL THEN list_append(s.loads, o.n_tok)
       |         ELSE list_slice(s.loads, 1, t.idx - 1) || [t.mx + o.n_tok]
       |              || list_slice(s.loads, t.idx + 1, len(s.loads)) END,
       |    list_append(s.bins, CASE WHEN t.mx IS NULL
       |                             THEN CAST(len(s.loads) AS BIGINT)
       |                             ELSE t.idx - 1 END)
       |  FROM sim s
       |  JOIN ord o ON o.shard = s.shard AND o.rn = s.i + 1
       |  CROSS JOIN LATERAL (
       |    SELECT list_max(list_filter(s.loads, x -> x + o.n_tok <= $SeqLen))
       |             AS mx,
       |           list_position(s.loads,
       |             list_max(list_filter(s.loads, x -> x + o.n_tok <= $SeqLen)))
       |             AS idx) t),
       |fin AS (
       |  SELECT s.shard, s.bins FROM sim s
       |  JOIN cnt c ON c.shard = s.shard AND s.i = c.n),
       |assign AS (
       |  SELECT o.shard, o.doc_id, o.n_tok, f.bins[o.rn] AS bin_no
       |  FROM ord o JOIN fin f ON f.shard = o.shard),
       |fills AS (
       |  SELECT shard, bin_no, sum(n_tok) AS bin_fill
       |  FROM assign GROUP BY 1, 2)
       |SELECT a.shard, a.bin_no, a.doc_id, a.n_tok,
       |       CAST(f.bin_fill AS BIGINT) AS bin_fill,
       |       CAST(greatest(0, $SeqLen - f.bin_fill) AS BIGINT) AS bin_waste
       |FROM assign a JOIN fills f USING (shard, bin_no)
       |ORDER BY shard, bin_no, doc_id""".stripMargin, bench = true) { (s, d) =>
    packBestFit(Tables.documents(s, d).select(col("doc_id"), col("text")))
  }

  val entries: Seq[Entry] = Seq(b97, b154)
}
