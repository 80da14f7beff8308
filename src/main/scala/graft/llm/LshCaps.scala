package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucket-size cap for banded-LSH candidate generation (SCALE.md §3.2).
  *
  * Every banded LSH here ([[MinHashLsh]], [[SimHash]], [[Similarity]])
  * generates candidates by self-joining (band, bucket) groups, costing
  * O(Σ bucket²). A degenerate corpus — e.g. thousands of byte-identical
  * documents — collapses into one bucket and turns that join quadratic.
  * The cap drops buckets larger than `cap` members before the self-join,
  * bounding the join at O(#buckets · cap²).
  *
  * What is lost: pairs whose ONLY collision is a hot bucket. That is the
  * standard trade (hot buckets are the LSH analogue of stopwords), and the
  * pairs a hot bucket would surface are exactly the ones exact-hash dedup
  * (b42) already catches for the identical-document case. Exactness-
  * sensitive callers (the SimHash t2 oracle twin, whose DuckDB SQL mirrors
  * uncapped complete banding) pass `bucketCap = None`.
  *
  * Bounded-candidate behavior on a 1k-identical-doc corpus is pinned by
  * SkewCapSpec.
  */
object LshCaps {
  /** Far above any honest bucket at test scale (sf0.1 buckets are ≤ small
    * dup-groups), low enough that a degenerate bucket can't go quadratic. */
  val DefaultBucketCap = 1000

  /** Drop (band, bucket) groups with more than `cap` members. The oversize
    * set has at most |banded|/cap keys (shrinks as the cap grows) and the
    * sizing pass is a map-side-combinable hash agg on the bucket key, so
    * the extra pass is one narrow shuffle of distinct bucket keys. */
  def capBuckets(banded: DataFrame, cap: Option[Int],
      keyCols: Seq[String] = Seq("band", "bucket")): DataFrame =
    cap match {
      case None => banded
      case Some(c) =>
        val oversize = banded.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("sz"))
          .filter(col("sz") > c)
          .select(keyCols.map(col): _*)
        banded.join(oversize, keyCols, "left_anti")
    }
}
