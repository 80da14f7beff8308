package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PostingCodec

/** B179 — the delta+varint posting codec and its report entry: lossless
  * round-trip on randomized sorted lists, the analytic LEB128 length
  * law, loud failure on unsorted input and truncated buffers, and the
  * Zipf compression claim on the real corpus. */
class PostingCompressSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private def arr(xs: Seq[Long]) = new GenericArrayData(xs.toArray)

  test("encode/decode round-trips randomized sorted lists; length obeys the LEB128 law") {
    val rnd = new scala.util.Random(179)
    (1 to 300).foreach { _ =>
      val n = rnd.nextInt(40)
      // gaps spanning several varint widths, including multi-byte jumps
      val ids = Iterator.iterate(rnd.nextInt(1000).toLong)(
        _ + 1 + (if (rnd.nextInt(4) == 0) rnd.nextInt(1 << 20) else rnd.nextInt(100)))
        .take(n).toVector
      val enc = PostingCodec.encode(arr(ids))
      assert(PostingCodec.decode(enc).toLongArray().toVector === ids)
      val wantLen = ids.zip(0L +: ids).map { case (id, prev) =>
        PostingCodec.varintLen(id - prev)
      }.sum
      assert(enc.length === wantLen, s"encoded length off for $ids")
    }
    // empty list → empty buffer → empty list
    assert(PostingCodec.encode(arr(Nil)).isEmpty)
    assert(PostingCodec.decode(Array.empty[Byte]).numElements() === 0)
  }

  test("varintLen matches the boolean-sum formula at every width boundary") {
    // k stops at 8: 2^56 is the last boundary a non-negative Long can
    // cross (2^63 overflows signed Long, and negatives are rejected)
    val bounds = (1 to 8).map(k => 1L << (7 * k))
    (Seq(0L, 1L, 127L) ++ bounds.flatMap(b => Seq(b - 1, b)) :+ Long.MaxValue)
      .foreach { v =>
        val want = 1 + bounds.count(b => v >= b)
        assert(PostingCodec.varintLen(v) === want, s"varintLen($v)")
      }
  }

  test("unsorted, duplicate, or negative input throws; truncated buffers throw") {
    intercept[IllegalArgumentException](PostingCodec.encode(arr(Seq(5L, 3L))))
    intercept[IllegalArgumentException](PostingCodec.encode(arr(Seq(3L, 3L))))
    intercept[IllegalArgumentException](PostingCodec.encode(arr(Seq(-1L, 3L))))
    val enc = PostingCodec.encode(arr(Seq(1000000L)))
    assert(enc.length > 1)
    intercept[IllegalArgumentException](PostingCodec.decode(enc.dropRight(1)))
    // ADVICE r14: an overlong varint (11 continuation bytes) must THROW,
    // not wrap the shift mod 64 and silently decode a wrong value
    val overlong = Array.fill(11)(0x80.toByte) :+ 0x01.toByte
    intercept[IllegalArgumentException](PostingCodec.decode(overlong))
  }

  test("B179 entry: round-trip green corpus-wide, sizes lawful, dense postings compress") {
    val rows = SparkEntry.queries("b179_posting_compress")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (term, df, raw, enc, ratio, ok) =>
      assert(ok === 1L, s"round-trip broke for '$term'")
      assert(raw === 8 * df)
      assert(enc >= df, s"'$term': fewer bytes than postings")
      assert(enc <= raw, s"'$term': varint never beats raw? $enc > $raw")
      assert(ratio === enc * 10000 / raw)
    }
    // Zipf claim: the densest posting list compresses at least 4x
    val best = rows.map(r => r._5).min
    assert(best <= 2500, s"densest list only reached ${best}bp — codec not biting")
  }
}
