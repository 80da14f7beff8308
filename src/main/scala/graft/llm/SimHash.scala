package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection (driver mandate alongside MinHash).
  *
  * Each document folds its token hashes into one 64-bit signature: bit b of
  * the signature is 1 iff the sum over tokens of ±1 (sign of bit b of
  * xxhash64(token)) is positive. Near-duplicates differ in few bits
  * (Hamming distance), so candidates are found by exact-matching one of 4
  * 16-bit signature bands (any pair within Hamming distance 3 shares at
  * least one intact band by pigeonhole).
  *
  * Scale posture: the signature is a single aggregate per doc (64 sums,
  * map-side partial); candidate generation is a band-bucket self-join like
  * MinHash; Hamming verification is an O(1) popcount per candidate pair.
  * Everything shuffles hashes and signatures, never document text.
  */
object SimHash {
  val Bits = 64
  val Bands = 4
  val BitsPerBand: Int = Bits / Bands

  /** 64-bit SimHash per doc_id from whitespace tokens. */
  def signatures(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .withColumn("h", xxhash64(col("term")))
    // per bit: sum of ±1 depending on the bit of the token hash
    val bitSums = (0 until Bits).map(b =>
      sum(when(expr(s"(h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"s$b"))
    val agg = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    // assemble signature: bit b set iff s_b > 0  (shiftleft on long)
    val sig = (0 until Bits)
      .map(b => when(col(s"s$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** Candidate pairs (a<b) agreeing exactly on ≥1 of the 4 16-bit bands. */
  def candidatePairs(sigs: DataFrame): DataFrame = {
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        s"""transform(sequence(0, ${Bands - 1}),
           |          b -> (simhash >> (b * $BitsPerBand)) & ${(1L << BitsPerBand) - 1})""".stripMargin)))
      .select(col("doc_id"), col("simhash"), col("pos").as("band"), col("col").as("bucket"))
    banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.simhash").as("sig_a"), col("r.simhash").as("sig_b"))
      .distinct()
  }

  /** Near-dup pairs within `maxHamming` bits. */
  def nearDuplicates(docs: DataFrame, maxHamming: Int): DataFrame =
    candidatePairs(signatures(docs))
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
}
