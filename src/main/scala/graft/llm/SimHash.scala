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

  /** Default token hash: engine-native xxhash64 (64 signature bits — the
    * scale path). `term` is the bound token column name. */
  val XxTermHash = "xxhash64(term)"

  /** Oracle-replicable token hash: the 40-bit polynomial fold of
    * [[Winnowing.PolyGramHash]] followed by three xor-shift finalizer
    * rounds. The bare *31 fold leaves high bits empty for short tokens
    * (a 4-char token stays below 2^23), which would make most signature
    * bits constant across the corpus; the finalizer spreads entropy to
    * near-uniform per-bit balance (validated against a random-hash
    * reference). All ops are in-range for ANSI mode (h*1048573 < 2^60)
    * and DuckDB evaluates the same rounds verbatim via list_reduce —
    * which is what makes a SimHash t2 oracle possible. */
  val PolyTermHash: String =
    s"""aggregate(array(13, 29, 17),
       |          ${Winnowing.polyFoldSpark("term")},
       |          (h, sh) -> ((h * 1048573 + 11) & ${Winnowing.PolyMask})
       |                     ^ shiftright((h * 1048573 + 11) & ${Winnowing.PolyMask}, sh))""".stripMargin

  /** SimHash signature per doc_id from whitespace tokens. `termHash` is a
    * SQL expression over the token column `term`; `bits` must be a
    * multiple of [[Bands]] and no wider than the hash. */
  def signatures(docs: DataFrame, termHash: String = XxTermHash,
      bits: Int = Bits): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .withColumn("h", expr(termHash))
    // per bit: sum of ±1 depending on the bit of the token hash
    val bitSums = (0 until bits).map(b =>
      sum(when(expr(s"(h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"s$b"))
    val agg = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    // assemble signature: bit b set iff s_b > 0  (shiftleft on long)
    val sig = (0 until bits)
      .map(b => when(col(s"s$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** Candidate pairs (a<b) agreeing exactly on ≥1 of the [[Bands]] bands.
    * With bands > maxHamming and `bucketCap = None` this is COMPLETE, not
    * approximate: a pair within Hamming distance maxHamming has at least
    * one untouched band (pigeonhole), so banded candidates + the Hamming
    * filter equal the exact all-pairs computation — the property the t2
    * oracle relies on (which is why the t2 twin disables the cap). With
    * the default cap, degenerate hot buckets are dropped
    * ([[LshCaps.capBuckets]]) and completeness holds for every pair not
    * confined to one. */
  def candidatePairs(sigs: DataFrame, bits: Int = Bits,
      bucketCap: Option[Int] = Some(LshCaps.DefaultBucketCap)): DataFrame = {
    val bitsPerBand = bits / Bands
    // posexplode_outer: constant 4-element band array, never empty (and
    // the non-outer Generate guard would re-evaluate it per row)
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode_outer(expr(
        s"""transform(sequence(0, ${Bands - 1}),
           |          b -> (simhash >> (b * $bitsPerBand)) & ${(1L << bitsPerBand) - 1})""".stripMargin)))
      .select(col("doc_id"), col("simhash"), col("pos").as("band"), col("col").as("bucket"))
    LshCaps.bandedCandidates(banded, "doc_id", bucketCap, carry = Seq("simhash"))
      .select(col("doc_id_a").as("doc_a"), col("doc_id_b").as("doc_b"),
        col("simhash_a").as("sig_a"), col("simhash_b").as("sig_b"))
  }

  /** Near-dup pairs within `maxHamming` bits (maxHamming < [[Bands]] for
    * the completeness guarantee; `bucketCap = None` for the exact twin). */
  def nearDuplicates(docs: DataFrame, maxHamming: Int,
      termHash: String = XxTermHash, bits: Int = Bits,
      bucketCap: Option[Int] = Some(LshCaps.DefaultBucketCap)): DataFrame =
    candidatePairs(signatures(docs, termHash, bits), bits, bucketCap)
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
}
