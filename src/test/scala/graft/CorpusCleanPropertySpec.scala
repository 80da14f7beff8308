package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Decontaminate, SpanDedup}

/** Randomized cross-checks of the corpus-hygiene operators against
  * INDEPENDENT plain-JVM oracles (SURVEY §5B.4). The DuckDB t2 twins
  * mirror the SQL shape, so a semantic bug shared by both spellings
  * could pass the hash; these oracles are written from the operator's
  * DEFINITION with Scala collections and share nothing with either
  * engine. Seeds are fixed (the WildWebPropertySpec convention) so runs
  * are deterministic. */
class CorpusCleanPropertySpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001
  import spark.implicits._

  private val K = SpanDedup.SpanWords

  private def sample[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(77L + i)))

  // tiny vocabulary so random K-gram collisions actually occur
  private val vocab = Vector("a", "b", "c", "d")
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 30)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(3, 10)
    docs <- Gen.listOfN(n, docGen)
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** Independent oracle: keep-first duplicated-span removal, by
    * definition, with plain collections. split(" ", -1) mirrors Spark's
    * split(text, ' ') (empty tokens kept, "" → one empty word). */
  private def jvmSpanRemoval(
      corpus: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val words = corpus.map { case (id, t) => id -> t.split(" ", -1).toVector }.toMap
    val occ = for {
      (id, _) <- corpus
      ws = words(id)
      if ws.length >= K
      i <- 0 to ws.length - K
    } yield (ws.slice(i, i + K).mkString(" "), id, i)
    val covered = scala.collection.mutable.Set[(Long, Int)]()
    for ((_, os) <- occ.groupBy(_._1) if os.size > 1) {
      val first = os.map(o => (o._2, o._3)).min
      for ((_, id, pos) <- os if (id, pos) != first; p <- pos until pos + K)
        covered += ((id, p))
    }
    corpus.map { case (id, _) =>
      val ws = words(id)
      val kept = ws.zipWithIndex.collect { case (w, p) if !covered((id, p)) => w }
      id -> ((ws.length.toLong, (ws.length - kept.length).toLong, kept.mkString(" ")))
    }.toMap
  }

  test("property: span removal equals the independent JVM oracle on random corpora") {
    for ((corpus, ci) <- sample(corpusGen, 8).zipWithIndex) {
      val df = corpus.toDF("doc_id", "text")
      val got = SpanDedup.removeRepeatedSpans(df).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      val want = jvmSpanRemoval(corpus)
      assert(got === want, s"random corpus #$ci diverged from the JVM oracle")
    }
  }

  test("property: text-dedup e2e (LSH→verify→components) equals a JVM union-find oracle") {
    // at ≤30-word docs every shingle set has ≤28 elements, so jaccard ≥
    // 0.99 IMPLIES identical shingle sets (max non-identical value is
    // 27/28 ≈ 0.964) — and identical sets collide in every band, so LSH
    // recall is provably 1 and set equality (not just recall) holds
    val dupCorpusGen: Gen[Seq[(Long, String)]] = for {
      base <- corpusGen
      dupOf <- Gen.someOf(base.filter(_._2.split(" ", -1).length >= 3))
    } yield base ++ dupOf.zipWithIndex.map { case ((_, t), i) => (100L + i, t) }
    for ((corpus, ci) <- sample(dupCorpusGen, 6).zipWithIndex) {
      val df = corpus.toDF("doc_id", "text")
      val pairs = graft.llm.MinHashLsh
        .nearDuplicates(df, threshold = 0.99, bucketCap = None)
        .select(org.apache.spark.sql.functions.col("doc_a").as("a"),
          org.apache.spark.sql.functions.col("doc_b").as("b"))
      val got = graft.operators.GraphOps
        .connectedComponents(pairs,
          df.select(org.apache.spark.sql.functions.col("doc_id").as("n")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // JVM oracle: identical-shingle-set pairs + union-find closure
      val shingleSets = corpus.map { case (id, t) =>
        val ws = t.split(" ", -1).toVector
        id -> (if (ws.length < 3) Set.empty[String]
               else (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet)
      }.toMap
      val parent = scala.collection.mutable.Map(
        corpus.map { case (id, _) => id -> id }: _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for {
        (a, sa) <- shingleSets if sa.nonEmpty
        (b, sb) <- shingleSets if a < b && sa == sb
      } parent(find(math.max(a, b))) = find(math.min(a, b))
      val want = corpus.map(_._1).map { id =>
        // canonical label = min id in the class
        val cls = corpus.map(_._1).filter(x => find(x) == find(id))
        id -> cls.min
      }.toMap
      assert(got === want, s"random corpus #$ci components diverged from union-find")
    }
  }

  /** Independent oracle: distinct word-G-gram overlap per corpus doc
    * against the union of benchmark grams, by definition. */
  private def jvmOverlap(corpus: Seq[(Long, String)],
      bench: Seq[String]): Map[Long, Long] = {
    val G = Decontaminate.GramWords
    def grams(t: String): Set[String] = {
      val ws = t.split(" ", -1).toVector
      if (ws.length < G) Set.empty
      else (0 to ws.length - G).map(i => ws.slice(i, i + G).mkString(" ")).toSet
    }
    val benchGrams = bench.flatMap(grams).toSet
    corpus.map { case (id, t) => id -> grams(t).count(benchGrams).toLong }
      .filter(_._2 > 0).toMap
  }

  test("b94's full composition equals a plain-JVM pipeline over the real corpus") {
    // span removal → decontamination of cleaned text → exact dedup →
    // per-lang rollup, recomputed entirely with Scala collections from
    // the collected sf0.001 documents table; the chained-CTE oracle
    // mirrors the stage ORDER, this recomputation shares nothing
    val G = Decontaminate.GramWords
    val rows = graft.sources.Tables.documents(spark, sf)
      .selectExpr("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val langOf = rows.map { case (id, _, lang) => id -> lang }.toMap
    // stage 1: span removal over (doc_id, text), drop the FULLY-DELETED
    // (n_removed = n_words) — not clean == "", which would also drop an
    // originally-empty doc the oracle keeps (the b94 filter contract)
    val cleaned = jvmSpanRemoval(rows.map { case (id, t, _) => (id, t) })
      .toSeq.collect { case (id, (nw, nr, clean)) if nr < nw => (id, clean) }
    // stage 2: decontamination of CLEANED text vs the original benchmark split
    val bench = rows.filter(_._1 % 40 == 0).map(_._2)
    def grams(t: String): Set[String] = {
      val ws = t.split(" ", -1).toVector
      if (ws.length < G) Set.empty
      else (0 to ws.length - G).map(i => ws.slice(i, i + G).mkString(" ")).toSet
    }
    val benchGrams = bench.flatMap(grams).toSet
    val survivors = cleaned
      .filter { case (id, _) => id % 40 != 0 }
      .filter { case (_, t) => grams(t).count(benchGrams) < Decontaminate.MinOverlap }
    // stage 3: exact dedup on cleaned text, canonical min id
    val deduped = survivors.groupBy(_._2).map { case (t, g) => (g.map(_._1).min, t) }
    // stage 4: per-lang rollup
    val want = deduped.toSeq
      .groupBy { case (id, _) => langOf(id) }
      .map { case (lang, g) =>
        lang -> ((g.size.toLong, g.map(_._2.split(" ", -1).length.toLong).sum))
      }
    val got = SparkEntry.queries("b94_clean_pipeline")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want, "b94 composition diverged from the plain-JVM pipeline")
  }

  test("property: decontamination overlap counts equal the JVM oracle with planted leaks") {
    val leakyGen: Gen[(Seq[(Long, String)], Seq[String])] = for {
      corpus <- corpusGen
      bench <- Gen.listOfN(2, Gen.listOfN(12, Gen.oneOf(vocab)).map(_.mkString(" ")))
      leakFrom <- Gen.oneOf(bench)
    } yield {
      // one corpus doc gets a verbatim benchmark span appended — the
      // planted leak that makes 8-gram overlap reachable at this size
      val planted = corpus :+ (900L, corpus.headOption.map(_._2).getOrElse("") + " " + leakFrom)
      (planted, bench)
    }
    for (((corpus, bench), ci) <- sample(leakyGen, 6).zipWithIndex) {
      val corpusDf = corpus.toDF("doc_id", "text")
      val benchDf = bench.zipWithIndex
        .map { case (t, i) => (5000L + i, t) }.toDF("doc_id", "text")
      val got = Decontaminate.overlapReport(corpusDf, benchDf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = jvmOverlap(corpus, bench)
      assert(got === want, s"random corpus #$ci overlap diverged from the JVM oracle")
      assert(want.contains(900L), s"corpus #$ci: the planted leak doc has no overlap")
    }
  }
}
