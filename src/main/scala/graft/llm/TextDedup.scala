package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** LLM-pipeline deduplication operators (SURVEY B42-B43): exact
  * content-hash dedup and n-gram-Jaccard near-dup detection.
  *
  * Scale posture: exact dedup groups on a 64-char digest, never the raw
  * text (shuffle carries hashes, not documents). The exact-Jaccard pair
  * query is an inverted-index (shingle) join — candidate pairs are
  * generated only for documents sharing a shingle, never by cross join;
  * at 100 TB the same shape survives because common-shingle hotspots are
  * dropped like stopwords via [[dfCapped]] (document-frequency cap). The
  * sub-quadratic candidate path is MinHash LSH ([[MinHashLsh]],
  * property-tested), with its own bucket-size cap.
  */
object TextDedup {

  /** Documents with injected duplicates (every 7th doc re-appears under a
    * shifted id) — the testdata has no exact dups, so dedup semantics are
    * exercised against a corpus where they bite. Shared with
    * [[SpanDedup]] (B93), whose planted copies' spans must all be
    * duplicates of the originals'. */
  private[graft] def docsWithDups(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    docs.unionByName(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }

  /** B42 — exact dedup on content hash: keep min(doc_id) per distinct text,
    * count copies. */
  private val b42 = entry(
    "b42_dedup_exact",
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0)
      |SELECT sha256(text) AS content_hash,
      |       min(doc_id) AS keep_doc_id,
      |       count(*) AS n_copies
      |FROM all_docs
      |GROUP BY sha256(text), text
      |ORDER BY keep_doc_id""".stripMargin, bench = true) { (s, d) =>
    docsWithDups(s, d)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")
  }

  /** Distinct word-3-shingle ARRAY per document (docs shorter than 3 words
    * would make sequence() run backwards and are excluded — none exist in
    * the testdata). Kept un-exploded so per-doc shingle counts are a
    * `size()` away — no explode, no shuffle. */
  /** The ONE spelling of "distinct word-3-shingle array" over a word-array
    * column — every shingle consumer (here, B142/B146's streaming-safe
    * inline variant, B145) derives from this text, so the shingle rule
    * cannot drift between spellings. */
  private[llm] def shingleArrExpr(wordsCol: String): String =
    s"""array_distinct(transform(sequence(0, size($wordsCol) - 3),
       |          i -> concat_ws(' ', $wordsCol[i], $wordsCol[i+1], $wordsCol[i+2])))""".stripMargin

  def withShingleArr(docs: DataFrame): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), expr(shingleArrExpr("words")).as("sh_arr"))

  /** Distinct word-3-shingles per document, one row per (doc, shingle).
    *
    * explode_OUTER, deliberately: plain explode triggers Catalyst's
    * InferFiltersFromGenerate, which pushes `size(sh_arr) > 0 AND
    * isnotnull(sh_arr)` below the projections with the whole nested-HOF
    * shingle expression INLINED — and the generated predicate's
    * common-subexpression elimination then evaluates that expression for
    * EVERY input row before any cheap conjunct (e.g. a probe-id filter)
    * can short-circuit (profiled: ~3s constant per query at sf0.1, ~10x
    * the actual explode). The outer variant infers no filter, and the
    * `size(words) >= 3` guard already guarantees ≥1 shingle per row, so
    * the results are identical. */
  def shingles(docs: DataFrame): DataFrame =
    withShingleArr(docs).select(col("doc_id"), explode_outer(col("sh_arr")).as("shingle"))

  /** Document-frequency cap (SCALE.md §3.2): drop shingles appearing in more
    * than `cap` documents — stopword-like hotspots whose inverted-index
    * posting lists would otherwise make the candidate join quadratic on a
    * degenerate corpus (e.g. many identical documents). A corpus with S
    * total (doc, shingle) rows has at most S/cap hot shingles, so the hot
    * set shrinks as the cap grows; it is anti-joined away before candidate
    * generation. The df pass is a map-side-combinable hash agg on the
    * shingle key (dropped to 8-byte hashes by callers that cap — see
    * [[MinHashLsh.hashedShingles]]), so the extra pass shuffles distinct
    * shingles, not the corpus. Bounded-candidate behavior on a 1k-identical-
    * doc corpus is pinned by SkewCapSpec. */
  def dfCapped(sh: DataFrame, cap: Int, shingleCol: String = "shingle"): DataFrame = {
    val hot = sh.groupBy(shingleCol).agg(count(lit(1)).as("df"))
      .filter(col("df") > cap)
      .select(shingleCol)
    sh.join(hot, Seq(shingleCol), "left_anti")
  }

  /** B43 (exact twin) — top-3 most-similar documents per probe doc by exact
    * 3-shingle Jaccard, via the inverted-index join. This is the t2-checked
    * verification query; the LSH candidate generator is b43_dedup_minhash. */
  private val b43 = entry(
    "b43_dedup_jaccard",
    """WITH words AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(w) - 2),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
      |  FROM words WHERE len(w) >= 3),
      |counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
      |  FROM sh a JOIN sh b USING (shingle)
      |  WHERE a.doc_id % 50 = 0 AND a.doc_id <> b.doc_id
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT da, db, common * 1.0 / (ca.n + cb.n - common) AS jac
      |  FROM pairs
      |  JOIN counts ca ON ca.doc_id = da
      |  JOIN counts cb ON cb.doc_id = db)
      |SELECT doc_a, doc_b, round(jac, 4) AS jaccard, rn FROM (
      |  SELECT da AS doc_a, db AS doc_b, jac,
      |         CAST(row_number() OVER (PARTITION BY da ORDER BY jac DESC, db) AS INTEGER) AS rn
      |  FROM j) t
      |WHERE rn <= 3 ORDER BY doc_a, rn""".stripMargin, bench = true) { (s, d) =>
    // r2 cached the full shingle relation and filtered probes out of the
    // cache: a full materialization barrier that also blocked codegen.
    // Instead (r3): per-doc counts come straight from the shingle array
    // (no explode, no shuffle), probe docs are filtered BEFORE shingling
    // (only ~2% of the corpus explodes twice), and the probe side is
    // broadcast into the inverted-index join so the corpus-side shingles
    // stream map-side without a shuffle. The broadcast holds while the
    // probe set is small (the probe-workload contract of this query);
    // corpus-scale self-join is the LSH path (b43_dedup_minhash).
    // spread the corpus BEFORE the explode: locally the parquet scan is
    // 1-2 splits, and a map-side (broadcast) join would otherwise run
    // the 10M-row explode+join+partial-agg nearly single-threaded. The
    // shuffle moves 5k full-text rows — ~30x smaller than shuffling the
    // exploded shingle relation as the r2 shuffle-join plan did. The count
    // is pinned (defaultParallelism): an un-pinned repartition(col) is
    // AQE-coalescible and 50MB of text collapses right back to 1
    // partition. GATED on the input being narrower than the cluster
    // (MinHashLsh.spreadNarrowInput — the r5 advice): a 100 TB scan has
    // thousands of splits and must not pay a full-text shuffle here.
    val docs = Tables.documents(s, d)
    val corpus = MinHashLsh.spreadNarrowInput(docs)
    val counts = withShingleArr(docs).select(col("doc_id"), size(col("sh_arr")).as("n"))
    val probes = shingles(docs.filter(col("doc_id") % 50 === 0))
      .select(col("doc_id").as("da"), col("shingle"))
    val pairs = shingles(corpus)
      .select(col("doc_id").as("db"), col("shingle"))
      .join(broadcast(probes), "shingle")
      .filter(col("da") =!= col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("common"))
    val jac = pairs
      .join(counts.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(counts.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("jac",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
    val w = Window.partitionBy(col("da")).orderBy(col("jac").desc, col("db"))
    jac.select(col("da").as("doc_a"), col("db").as("doc_b"), col("jac"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"), col("rn"))
      .orderBy("doc_a", "rn")
  }

  /** B43 (scale path) — MinHash+LSH candidate pairs with exact-Jaccard
    * verification, over the dup-injected corpus. Approximate by design →
    * no SQL oracle (rows-only driver check); recall/precision properties
    * are asserted in MinHashLshSpec. */
  private val b43lsh = entryNoOracle("b43_dedup_minhash", bench = true) { (s, d) =>
    MinHashLsh.nearDuplicates(docsWithDups(s, d), threshold = 0.5)
      .orderBy("doc_a", "doc_b")
  }

  /** B90 — TEXT near-dup dedup END-TO-END (the [[graft.llm.Similarity]]
    * b75 pattern for the MinHash path): shingle → banded-LSH candidates →
    * exact-Jaccard verify at τ=0.99 → connected components → every doc
    * labeled with its dup class's canonical (minimum) id. b43 emits pairs;
    * this closes the classes — the row a corpus-dedup pipeline actually
    * consumes (`doc_id = canonical_id` is the kept corpus).
    *
    * t2-HASH-CHECKED despite the LSH stage, because on this corpus recall
    * is provably 1 (the b75 argument, re-established for text): measured
    * over the dup-injected documents table at every SF, EVERY pair with
    * jaccard ≥ 0.99 has jaccard exactly 1.0 — identical distinct-shingle
    * sets (max non-identical organic pair: 0.989) — and identical shingle
    * sets give identical signatures, which collide in EVERY band, so no
    * qualifying pair can be missed. False candidates die in the exact
    * verify. `bucketCap = None` keeps the proof unconditional (a capped
    * hot bucket could drop a qualifying pair); production corpora set the
    * cap and accept the documented trade (SkewCapSpec).
    *
    * Scale: candidates O(Σ bucket²), verify touches candidates only,
    * components shuffle O(V+E)·O(log diameter) — the oracle's recursive
    * closure is the sf0.01 crutch, not the plan. */
  /** The dup-closure CTE chain shared by b90 and b178: dup-injected
    * corpus → distinct 3-shingles → exact-Jaccard ≥ 0.99 pairs →
    * symmetric edges → recursive reachability. Both oracles differ only
    * in what they DO with the components. */
  private val dupClosureCtes =
    """WITH RECURSIVE
      |all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0),
      |words AS (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(w) - 2),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
      |  FROM words WHERE len(w) >= 3),
      |counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
      |  FROM sh a JOIN sh b USING (shingle)
      |  WHERE a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |qual AS (
      |  SELECT da, db FROM pairs
      |  JOIN counts ca ON ca.doc_id = da
      |  JOIN counts cb ON cb.doc_id = db
      |  WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.99),
      |edges(a, b) AS (SELECT da, db FROM qual UNION SELECT db, da FROM qual),
      |reach(n, m) AS (
      |  SELECT doc_id, doc_id FROM all_docs
      |  UNION
      |  SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m)""".stripMargin

  private val b90 = entry(
    "b90_dedup_text_e2e",
    dupClosureCtes + """
      |SELECT n AS doc_id, min(m) AS canonical_id
      |FROM reach GROUP BY n ORDER BY doc_id""".stripMargin, bench = true) { (s, d) =>
    val docs = docsWithDups(s, d)
    val pairs = MinHashLsh.nearDuplicates(docs, threshold = 0.99, bucketCap = None)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    graft.operators.GraphOps
      .connectedComponents(pairs, docs.select(col("doc_id").as("n")))
      .select(col("n").as("doc_id"), col("component").as("canonical_id"))
      .orderBy("doc_id")
  }

  /** B178 — KEEP-BEST CANONICAL SELECTION per near-dup cluster: b90
    * elects min(doc_id) as each cluster's survivor — the textbook rule —
    * but production dedup (Gopher, FineWeb, RefinedWeb dataset cards)
    * keeps the BEST document of a cluster (highest quality score), which
    * is NOT the first: a cleaner later crawl beats an earlier boilerplate-
    * ridden copy. This row is the SELECTION operator: b90's components
    * (same LSH candidates, same provable τ=0.99 recall, same closure)
    * followed by an argmax-per-component election and a per-doc rewrite
    * to (canonical_id, kept).
    *
    * The quality score here is the b167 Knuth scramble of doc_id —
    * `q = (doc_id · 2654435761) mod 2³¹` — DELIBERATELY id-keyed: the
    * corpus's planted mirrors carry identical text, so any text-derived
    * score ties and keep-best silently degenerates to keep-min-id. The
    * scramble makes the election observably real (roughly half the
    * planted clusters elect the MIRROR — LlmOpsSpec pins a nonzero count
    * both ways) while staying engine-shared integer arithmetic.
    * Production plugs b45/b95 scores in; the election tail is unchanged.
    * Tie rule: highest q, then min doc_id — spelled min(struct(2³¹ − q,
    * doc_id)) on the Spark side and ORDER BY q DESC, doc_id in the
    * oracle (the same total order).
    *
    * Scale posture: everything b90 ships plus one map-combinable
    * struct-min aggregate keyed on component and one component-keyed
    * rewrite join — no windows over the corpus, no new all-pairs. */
  private val b178 = entry(
    "b178_dedup_keep_best",
    dupClosureCtes + """,
      |comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n),
      |winner AS (
      |  SELECT component, doc_id AS canonical_id FROM (
      |    SELECT component, doc_id,
      |           row_number() OVER (PARTITION BY component
      |             ORDER BY (doc_id * 2654435761) % 2147483648 DESC, doc_id)
      |             AS rn
      |    FROM comp) t
      |  WHERE rn = 1)
      |SELECT c.doc_id, w.canonical_id,
      |       CAST(c.doc_id = w.canonical_id AS BIGINT) AS kept
      |FROM comp c JOIN winner w USING (component)
      |ORDER BY c.doc_id""".stripMargin, bench = true) { (s, d) =>
    val docs = docsWithDups(s, d)
    val pairs = MinHashLsh.nearDuplicates(docs, threshold = 0.99, bucketCap = None)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val comp = graft.operators.GraphOps
      .connectedComponents(pairs, docs.select(col("doc_id").as("n")))
      .select(col("n").as("doc_id"), col("component"))
    // min(struct(2^31 - q, doc_id)) ⇔ ORDER BY q DESC, doc_id LIMIT 1
    val winners = comp
      .withColumn("nq",
        lit(2147483648L) - (col("doc_id") * lit(2654435761L)) % lit(2147483648L))
      .groupBy("component")
      .agg(min(struct(col("nq"), col("doc_id"))).as("w"))
      .select(col("component"), col("w.doc_id").as("canonical_id"))
    comp.join(winners, "component")
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).cast("long").as("kept"))
      .orderBy("doc_id")
  }

  /** B187 — DUP-CLUSTER SIZE PROFILE (the governance dashboard read
    * BEFORE committing a dedup pass: Lee et al. ACL'22 report exactly
    * this table for C4 — how much of the corpus sits in clusters of
    * size 2, 3, …, and how much a keep-one policy would delete): b90's
    * components rolled up twice — per-cluster sizes, then the histogram
    * (cluster_size → n_clusters, n_docs, docs_removed-if-keep-one).
    * Singletons appear as size 1 with 0 removed, so the histogram's
    * n_docs column sums to the corpus exactly (spec-pinned closure).
    *
    * Oracle: the shared dup-closure CTE chain + the same two rollups.
    * Scale posture: everything b90 ships plus two map-combinable
    * aggregates (component-keyed, then size-keyed) — output is
    * histogram-sized, not corpus-sized. */
  private val b187 = entry(
    "b187_dedup_cluster_profile",
    dupClosureCtes + """,
      |comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n),
      |sizes AS (SELECT component, count(*) AS sz FROM comp GROUP BY component)
      |SELECT CAST(sz AS BIGINT) AS cluster_size,
      |       CAST(count(*) AS BIGINT) AS n_clusters,
      |       CAST(sz * count(*) AS BIGINT) AS n_docs,
      |       CAST((sz - 1) * count(*) AS BIGINT) AS docs_removed
      |FROM sizes GROUP BY sz ORDER BY cluster_size""".stripMargin) { (s, d) =>
    val docs = docsWithDups(s, d)
    val pairs = MinHashLsh.nearDuplicates(docs, threshold = 0.99, bucketCap = None)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    graft.operators.GraphOps
      .connectedComponents(pairs, docs.select(col("doc_id").as("n")))
      .groupBy("component").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
      .select(col("sz").as("cluster_size"), col("n_clusters"),
        (col("sz") * col("n_clusters")).as("n_docs"),
        ((col("sz") - 1) * col("n_clusters")).as("docs_removed"))
      .orderBy("cluster_size")
  }

  val entries: Seq[Entry] = Seq(b42, b43, b43lsh, b90, b178, b187)
}
