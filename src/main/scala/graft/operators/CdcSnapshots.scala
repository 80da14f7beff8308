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
private[graft] object CdcSnapshots {
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

  /** The change batch as U/I/D op rows — B62's input, and the stream B72
    * replays chunk by chunk (SQL form; expects a `base` CTE in scope). */
  val changesSql: String =
    s"""SELECT k, 'U' AS op, 'X-UPDATED' AS status, cents + $bump AS cents
       |  FROM base WHERE k % $updMod = 0 AND k % $delMod <> 0
       |  UNION ALL
       |  SELECT k + $shift, 'I', 'N-NEW', cents FROM base WHERE k % $insMod = 0
       |  UNION ALL
       |  SELECT k, 'D', NULL, NULL FROM base WHERE k % $delMod = 0""".stripMargin

  def changes(baseDf: DataFrame): DataFrame =
    baseDf.filter(col("k") % updMod === 0 && col("k") % delMod =!= 0)
      .select(col("k"), lit("U").as("op"),
        lit("X-UPDATED").as("status"), (col("cents") + bump).as("cents"))
      .unionByName(baseDf.filter(col("k") % insMod === 0)
        .select((col("k") + shift).as("k"), lit("I").as("op"),
          lit("N-NEW").as("status"), col("cents")))
      .unionByName(baseDf.filter(col("k") % delMod === 0)
        .select(col("k"), lit("D").as("op"),
          lit(null).cast("string").as("status"), lit(null).cast("long").as("cents")))

  /** Apply a (k, op, status, cents) change set to a (k, status, cents)
    * state: one full-outer join on the key; change rows win, delete ops
    * drop the row. The merge is key-idempotent — each key appears at most
    * once per batch — so chunked application (B72) commutes with the
    * one-shot batch merge (B62). */
  def applyChanges(state: DataFrame, changeSet: DataFrame): DataFrame = {
    val st = state.select(col("k"), col("status").as("b_status"),
      col("cents").as("b_cents"))
    val ch = changeSet.select(col("k"), col("op"),
      col("status").as("c_status"), col("cents").as("c_cents"))
    st.join(ch, Seq("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("k"),
        when(col("op").isNotNull, col("c_status")).otherwise(col("b_status")).as("status"),
        when(col("op").isNotNull, col("c_cents")).otherwise(col("b_cents")).as("cents"))
  }

  /** The merged-result oracle — shared verbatim by B62 (one-shot merge)
    * and B72 (streaming chunked apply): both must land on this table. */
  val mergedSql: String =
    s"""WITH base AS (
       |  $baseSql),
       |changes AS (
       |  $changesSql)
       |SELECT k,
       |       CASE WHEN op IS NOT NULL THEN c.status ELSE b.status END AS status,
       |       CASE WHEN op IS NOT NULL THEN c.cents ELSE b.cents END AS cents
       |FROM base b FULL OUTER JOIN changes c USING (k)
       |WHERE op IS NULL OR op <> 'D'
       |ORDER BY k""".stripMargin

  // ——— B194: the multi-VERSION log (time travel) ———

  /** Second change batch (version 2), applied on top of version 1's
    * result: every base key k % 30 = 0 that survived v1 is RE-updated
    * (so last-writer-wins provably binds — those keys also carry a v1
    * 'U'), and every v1-inserted key with k % 100 = 0 is deleted. */
  val upd2Mod = 30
  val del2Mod = 100
  val bump2 = 700

  /** The full change LOG: (seq, k, op, status, cents), versions 1 and 2
    * — SQL form (expects `base` in scope). */
  val logSql: String =
    s"""SELECT 1 AS seq, k, op, status, cents FROM (
       |    $changesSql) v1
       |  UNION ALL
       |  SELECT 2, k, 'U', 'Z-UPD2', cents + $bump + $bump2
       |  FROM base WHERE k % $upd2Mod = 0 AND k % $delMod <> 0
       |  UNION ALL
       |  SELECT 2, k + $shift, 'D', NULL, NULL
       |  FROM base WHERE k % $insMod = 0 AND k % $del2Mod = 0""".stripMargin

  def log(baseDf: DataFrame): DataFrame = {
    // v2 'U' cents: v1 already bumped k%10=0 keys; k%30=0 ⊂ k%10=0, so
    // the v2 value is base + bump + bump2 (matching the SQL above)
    changes(baseDf).select(lit(1L).as("seq"), col("k"), col("op"),
        col("status"), col("cents"))
      .unionByName(baseDf
        .filter(col("k") % upd2Mod === 0 && col("k") % delMod =!= 0)
        .select(lit(2L).as("seq"), col("k"), lit("U").as("op"),
          lit("Z-UPD2").as("status"),
          (col("cents") + bump + bump2).as("cents")))
      .unionByName(baseDf
        .filter(col("k") % insMod === 0 && col("k") % del2Mod === 0)
        .select(lit(2L).as("seq"), (col("k") + shift).as("k"),
          lit("D").as("op"), lit(null).cast("string").as("status"),
          lit(null).cast("long").as("cents")))
  }

  /** AS-OF reconstruction: collapse the log at seq ≤ asOf to its
    * LAST-WRITER-WINS row per key (max seq — at most one change per
    * (k, seq), so the struct-max is unambiguous), then one key-join
    * apply. The b62 merge is the asOf = 1 special case. */
  def asOf(baseDf: DataFrame, logDf: DataFrame, asOfSeq: Long): DataFrame = {
    val last = logDf.filter(col("seq") <= asOfSeq)
      .groupBy("k")
      .agg(max(struct(col("seq"), col("op"), col("status"), col("cents")))
        .as("w"))
      .select(col("k"), col("w.op").as("op"), col("w.status").as("status"),
        col("w.cents").as("cents"))
    applyChanges(baseDf, last)
  }
}
