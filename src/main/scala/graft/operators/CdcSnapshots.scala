package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Shared CDC fixture for B62 (snapshot merge) and B68 (snapshot diff) —
  * the two halves of the CDC loop. Both operators derive their base
  * snapshot and change constants from HERE, in both dialects: merge
  * applies the change batch, diff recovers it, and that inverse
  * relationship only stays tested while the derivations are literally
  * shared (a constant edited in one copy would silently decouple the
  * twins). Money is exact integer cents end-to-end (the b22 lesson). */
private[operators] object CdcSnapshots {
  /** Every `updMod`-th key is updated (status replaced, +`bump` cents)
    * unless deleted; every `insMod`-th inserted under a `shift`-ed key;
    * every `delMod`-th deleted. */
  val updMod = 10
  val insMod = 25
  val delMod = 50
  val shift = 10000000L
  val bump = 500

  /** Keyed base snapshot (k, status, cents) from orders — SQL form. */
  val baseSql: String =
    """SELECT o_orderkey AS k, o_orderstatus AS status,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders""".stripMargin

  def base(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))

  /** The post-change snapshot — what `base` looks like after the change
    * batch applies; B68 diffs base against this (SQL form; expects a
    * `base` CTE in scope). */
  val currSql: String =
    s"""SELECT k,
       |         CASE WHEN k % $updMod = 0 AND k % $delMod <> 0 THEN 'X-UPDATED' ELSE status END AS status,
       |         CASE WHEN k % $updMod = 0 AND k % $delMod <> 0 THEN cents + $bump ELSE cents END AS cents
       |  FROM base WHERE k % $delMod <> 0
       |  UNION ALL
       |  SELECT k + $shift, 'N-NEW', cents FROM base WHERE k % $insMod = 0""".stripMargin

  def curr(baseDf: DataFrame): DataFrame = {
    val updated = col("k") % updMod === 0 && col("k") % delMod =!= 0
    baseDf.filter(col("k") % delMod =!= 0)
      .select(col("k"),
        when(updated, lit("X-UPDATED")).otherwise(col("status")).as("status"),
        when(updated, col("cents") + bump).otherwise(col("cents")).as("cents"))
      .unionByName(baseDf.filter(col("k") % insMod === 0)
        .select((col("k") + shift).as("k"), lit("N-NEW").as("status"),
          col("cents")))
  }
}
