package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Scalar UDF + typed UDAF implementations (SURVEY B24, B39). */
object Udfs {

  /** Great-circle distance in km (haversine). Registered as a Scala UDF —
    * the deliberate example of the UDF extension path (B39); the formula is
    * replicated verbatim in the DuckDB oracle, so both engines execute the
    * identical double-precision operation sequence. */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val r = 6371.0088
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon / 2) * math.sin(dLon / 2)
    2 * r * math.asin(math.sqrt(a))
  }
}

/** B24 — custom typed UDAF: weighted mean (e.g. price weighted by
  * quantity). An [[Aggregator]] gets Spark's full two-phase aggregation:
  * map-side partial reduce → shuffle of (sum, weight) pairs only → merge,
  * so state per group is constant-size at any data scale.
  */
object WeightedMeanAgg extends Aggregator[(Double, Double), (Double, Double), Double] {
  /** (value, weight) → running (weightedSum, weightSum). */
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** B87 — exact grouped top-k as a BOUNDED-STATE Aggregator: the state is
  * the k best (value, id) pairs seen so far, kept sorted (value desc, id
  * asc — the id tiebreak makes the result total and engine-stable).
  * Spark's two-phase aggregation then gives top-k the right 100 TB shape
  * for free: each map task reduces its rows into a k-row buffer, the
  * shuffle carries ≤ k pairs PER GROUP PER PARTITION, and merge zips two
  * sorted buffers — versus the window formulation (b25/b29), which
  * shuffles and sorts EVERY row of every group before row_number can
  * discard all but k. Same result (oracle is the window SQL), shuffle
  * volume groups·k instead of rows.
  */
case class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Insert keeping the buffer sorted-best-first and ≤ k long. */
  private def insert(s: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (s.size >= k && !better(x, s.last)) s
    else {
      val (front, back) = s.span(better(_, x))
      (front ++ (x +: back)).take(k)
    }

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(s: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    insert(s, a)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(s: Seq[(Double, Long)]): Seq[(Double, Long)] = s
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
