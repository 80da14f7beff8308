package graft.llm

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** Elementwise vector-sum-and-count Aggregator — the map-side-combinable
  * reduction distributed k-means actually needs: each map task folds its
  * rows into ONE (Σqv, n) buffer per cell, the shuffle carries
  * O(cells · dim · partitions) longs, never rows (the B87 bounded-state
  * rule applied to vectors). */
object VecSumAgg extends Aggregator[Seq[Long], (Seq[Long], Long), (Seq[Long], Long)] {
  override def zero: (Seq[Long], Long) = (Nil, 0L)
  private def add(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    if (a.isEmpty) b else if (b.isEmpty) a
    else a.lazyZip(b).map(_ + _)
  override def reduce(b: (Seq[Long], Long), x: Seq[Long]): (Seq[Long], Long) =
    (add(b._1, x), b._2 + 1)
  override def merge(a: (Seq[Long], Long), b: (Seq[Long], Long)): (Seq[Long], Long) =
    (add(a._1, b._1), a._2 + b._2)
  override def finish(r: (Seq[Long], Long)): (Seq[Long], Long) = r
  override def bufferEncoder: Encoder[(Seq[Long], Long)] =
    ExpressionEncoder[(Seq[Long], Long)]()
  override def outputEncoder: Encoder[(Seq[Long], Long)] =
    ExpressionEncoder[(Seq[Long], Long)]()
}

/** Exact integer LLOYD K-MEANS (SURVEY §2B round-7 row B102) — the
  * clustering primitive under SemDeDup (B99) and IVF routing, as a
  * first-class ENGINE-EXACT operator: every quantity in every iteration
  * is a BIGINT, so Spark, DuckDB and a plain-JVM loop agree bit-for-bit
  * and the t2 hash can pin a full multi-round iterative algorithm —
  * which float k-means (Spark MLlib included) fundamentally cannot.
  *
  *   - update: c'_j = round-half-up(Σq_j / n) computed as
  *     (2·Σq_j + n + 2·OFF·n) div (2·n) − OFF with OFF = 128: the
  *     offset keeps the numerator non-negative (|q| ≤ 127), where
  *     truncating div ≡ floor div — Spark's `div`, DuckDB's `//` and
  *     JVM `/` agree; on negatives they would NOT (truncate vs floor),
  *     which is exactly the cross-engine trap the offset removes;
  *   - empty cells keep their previous centroid (coalesce — no
  *     reseeding, so the iteration count fully determines the result);
  *   - assignment: B99's map-side argmin (literal centroids, integer
  *     L2, seed-id tiebreak) — zero exchange;
  *   - per-iteration reduction: [[VecSumAgg]] — shuffle is
  *     O(cells · dim · partitions) longs; the driver folds O(K · dim)
  *     scalars per round (the b84 distance-table rule) and re-embeds
  *     them as literals.
  *
  * Lloyd from the polyfold seeds also REPAIRS a documented degeneracy:
  * on short sequential ids the 40-bit fold of "sem:"‖id never wraps, so
  * B99's raw seeds are just ids 0..K−1 (production UUID/snowflake keys
  * mix fully). Two refinement rounds rebalance the cells regardless of
  * where the seeds started (KMeansSpec pins the SS drop).
  *
  * 100 TB: each round is one map-side assignment + one bounded-state
  * aggregate — the same shape MLlib uses, minus floats; rounds are O(1)
  * (2 here), not data-dependent. */
object IntKMeans {

  private val Off = 128L

  /** Exact round-half-up mean for |values| ≤ 127·n. */
  def centroidDim(s: Long, n: Long): Long =
    (2 * s + n + 2 * Off * n) / (2 * n) - Off

  /** `iters` Lloyd rounds from `seedRows`; returns refined (cid, cv) —
    * cell labels stay the seed ids throughout. */
  def refineSeeds(quantized: DataFrame, seedRows: Array[(Long, Seq[Long])],
      iters: Int): Array[(Long, Seq[Long])] = {
    val vsum = udaf(VecSumAgg)
    var cents = seedRows
    for (_ <- 1 to iters) {
      val stats = SemDedup.assignCells(quantized, cents)
        .groupBy("cell").agg(vsum(col("qv")).as("sn"))
        .collect()
        .map { r =>
          val sn = r.getStruct(1)
          r.getLong(0) -> (sn.getSeq[Long](0), sn.getLong(1))
        }.toMap
      cents = cents.map { case (cid, cv) =>
        stats.get(cid) match {
          case Some((s, n)) if n > 0 => (cid, s.map(centroidDim(_, n)))
          case _ => (cid, cv)
        }
      }
    }
    cents
  }

  /** B102 — (vec_id, cell) after two exact Lloyd rounds over the
    * quantized embeddings, K = 8. The oracle unrolls both rounds as
    * chained CTEs (zipped unnests for the per-dim sums, list(… ORDER BY
    * j) to rebuild centroids, the same offset floor-div). */
  private val b102 = entry(
    "b102_kmeans_cells",
    {
      val pf = Winnowing.polyFoldDuck("('sem:' || CAST(vec_id AS VARCHAR))")
      val d2 = """list_reduce(list_prepend(0::BIGINT,
                 |             list_transform(generate_series(1, len(s.qv)),
                 |                            j -> (s.qv[j] - c.cv[j]) * (s.qv[j] - c.cv[j]))),
                 |             (a, b) -> a + b)""".stripMargin
      def round(prev: String, a: String, cTab: String) =
        s"""${a}_raw AS (
           |  SELECT s.vec_id, s.qv, c.cid, $d2 AS d2
           |  FROM q s CROSS JOIN $prev c),
           |$a AS (
           |  SELECT vec_id, qv, cid,
           |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
           |  FROM ${a}_raw),
           |${a}_cells AS (SELECT vec_id, qv, cid AS cell FROM $a WHERE rn = 1),
           |${a}_dims AS (
           |  SELECT cell, unnest(generate_series(1, len(qv))) AS j, unnest(qv) AS v
           |  FROM ${a}_cells),
           |${a}_sums AS (
           |  SELECT cell, j, CAST(sum(v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
           |  FROM ${a}_dims GROUP BY cell, j),
           |$cTab AS (
           |  SELECT sd.cid, COALESCE(nc.cv, sd.cv) AS cv
           |  FROM $prev sd
           |  LEFT JOIN (
           |    SELECT cell AS cid,
           |           list((2 * s + n + 256 * n) // (2 * n) - 128 ORDER BY j) AS cv
           |    FROM ${a}_sums GROUP BY cell) nc ON nc.cid = sd.cid)""".stripMargin
      s"""WITH
         |q AS (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           x -> CAST(floor(CAST(x AS DOUBLE) * ${SemDedup.QuantScale} + 0.5) AS BIGINT)) AS qv
         |  FROM embeddings),
         |seeds0 AS (
         |  SELECT vec_id AS cid, qv AS cv FROM q
         |  ORDER BY $pf, vec_id
         |  LIMIT 8),
         |${round("seeds0", "a0", "cent1")},
         |${round("cent1", "a1", "cent2")},
         |fin_raw AS (
         |  SELECT s.vec_id, c.cid, $d2 AS d2
         |  FROM q s CROSS JOIN cent2 c),
         |fin AS (
         |  SELECT vec_id, cid,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |  FROM fin_raw)
         |SELECT vec_id, cid AS cell FROM fin WHERE rn = 1
         |ORDER BY vec_id""".stripMargin
    }) { (s, d) =>
    val q = SemDedup.quantize(Tables.embeddings(s, d).select("vec_id", "embedding"))
    val seedRows = SemDedup.seeds(q, 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    val refined = refineSeeds(q, seedRows, iters = 2)
    SemDedup.assignCells(q, refined)
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id")
  }

  val entries: Seq[Entry] = Seq(b102)
}
