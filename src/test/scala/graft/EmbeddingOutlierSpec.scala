package graft

import org.scalatest.funsuite.AnyFunSuite

/** B284 embedding-space outlier audit: full JVM replay of both legs
  * (quantize → floor-mean centroid → integer d² → stats → top-3), plus
  * the planted-corruption contract: every 3×-scaled vector is flagged.
  */
class EmbeddingOutlierSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private val Mul = graft.llm.Quantize.OutlierMul
  private val Mod = graft.llm.Quantize.CorruptMod
  private val Off = graft.llm.Quantize.CorruptIdOffset

  /** (leg, label) -> ((vec_id -> d2), n, mean_d2, n_out) replayed in
    * plain Scala from the raw parquet. */
  private def replay(): Map[(String, Long), (Map[Long, Long], Long, Long, Long)] = {
    val raw = graft.sources.Tables.embeddings(spark, sf)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getInt(2).toLong))
    def quant(x: Float, scale: Long): Long =
      math.floor(x.toDouble * scale + 0.5).toLong
    val legs: Seq[(String, Long, Long, Array[Long])] =
      raw.toIndexedSeq.map { case (id, e, l) =>
        ("clean", id, l, e.map(quant(_, 127L)))
      } ++
      raw.toIndexedSeq.map { case (id, e, l) =>
        ("planted", id, l, e.map(quant(_, 127L)))
      } ++
      raw.toIndexedSeq.collect { case (id, e, l) if id % Mod == 0 =>
        ("planted", id + Off, l, e.map(quant(_, 381L)))
      }
    legs.groupBy(v => (v._1, v._3)).map { case ((leg, label), vs) =>
      val dim = vs.head._4.length
      val cent = (0 until dim).map { p =>
        // trunc-toward-zero division: Spark `div` ≡ DuckDB `//` ≡ Scala /
        // (the b262 negative-band convention) — NOT floorDiv
        vs.map(_._4(p)).sum / vs.length.toLong
      }
      val d2 = vs.map { case (_, id, _, q) =>
        id -> (0 until dim).map(p => (q(p) - cent(p)) * (q(p) - cent(p))).sum
      }.toMap
      val n = vs.length.toLong
      val mean = d2.values.sum / n
      val nOut = d2.values.count(_ > Mul * mean).toLong
      (leg, label) -> ((d2, n, mean, nOut))
    }
  }

  test("B284: all rows replay in the JVM (quantize, floor-mean centroid," +
    " integer d2, stats, rank)") {
    val got = SparkEntry.queries("b284_embedding_outliers")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    val rep = replay()
    assert(got.size === rep.size * 3, "not exactly 3 rows per (leg, label)")
    for (((leg, label), (d2, n, mean, nOut)) <- rep) {
      val top = d2.toSeq.sortBy { case (id, d) => (-d, id) }.take(3)
      top.zipWithIndex.foreach { case ((id, d), i) =>
        assert(got((leg, label, i + 1L)) === ((id, d, n, mean, nOut)),
          s"($leg, $label, rn=${i + 1}) diverges from the JVM replay")
      }
    }
  }

  test("B284: every planted 3x-scaled vector is flagged as an outlier," +
    " and labels that received a plant rank it first") {
    val rep = replay()
    val planted = rep.collect { case ((leg, label), v) if leg == "planted" =>
      label -> v }
    var plantedLabels = 0
    for ((label, (d2, _, mean, nOut)) <- planted) {
      val doctored = d2.keys.filter(_ >= Off).toSeq
      doctored.foreach { id =>
        assert(d2(id) > Mul * mean,
          s"doctored vector $id (label $label) not flagged")
      }
      assert(nOut >= doctored.length.toLong)
      if (doctored.nonEmpty) {
        plantedLabels += 1
        val top = d2.toSeq.sortBy { case (id, d) => (-d, id) }.head._1
        assert(top >= Off,
          s"label $label's most distant vector is not the planted one")
      }
    }
    assert(plantedLabels > 0, "no label received a plant at this SF")
    // and the clean leg never sees the planted ids
    rep.collect { case (("clean", _), (d2, _, _, _)) => d2.keys }
      .flatten.foreach(id => assert(id < Off))
  }
}
