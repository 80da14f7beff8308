package graft

import org.scalatest.funsuite.AnyFunSuite

/** B303 pins: every planted misalignment class is counted exactly (JVM
  * replay of the plant arithmetic over the fixture ids), the organically
  * clean check reads zero, and the report never cartesians the corpus. */
class CrossModalAuditSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  test("planted misalignment counts replay exactly from the fixture ids") {
    val out = SparkEntry.queries("b303_crossmodal_audit")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docIds = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val vecIds = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val nCov = vecIds.size.toLong
    // ghosts reference id + offset, which never lands in the fixture
    assert(out("media_ghost_doc") == docIds.count(_ % 19 == 7))
    assert(out("emb_ghost_orphan") == vecIds.count(_ % 23 == 3))
    // dropped embeddings: covered docs whose vec was removed (%17 = 2);
    // ghost vec_ids sit above the coverage bound so they never mask one
    assert(out("media_missing_embedding") ==
      docIds.count(id => id < nCov && vecIds.contains(id) && id % 17 == 2))
    assert(out("media_lang_drift") == docIds.count(_ % 13 == 5),
      "every mutated media slot must surface as lang drift")
    assert(out("media_source_drift") == 0L,
      "the untouched metadata column must audit clean")
  }

  test("plan: id-keyed joins only — no cartesian over the corpus") {
    val plan = SparkEntry.queries("b303_crossmodal_audit")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("B308 serve join: metadata attaches to every hit (k per probe), " +
    "kinds dispatch by slot, and the hit list broadcasts — the corpus " +
    "never shuffles for serving") {
    val out = SparkEntry.queries("b308_crossmodal_retrieval")(spark, sf)
      .collect()
    assert(out.length == 20 * 5, s"expected 20 probes x 5 hits, got ${out.length}")
    out.foreach { r =>
      val (id, kind) = (r.getLong(2), r.getString(6))
      val expected = (id % 3) match {
        case 0 => "image/png"; case 1 => "audio/wav"; case _ => "video/mp4"
      }
      assert(kind == expected, s"neighbor $id kind $kind")
      assert(r.getString(4).nonEmpty && r.getString(5).nonEmpty,
        "lang/source metadata must attach to every hit")
    }
    val plan = SparkEntry.queries("b308_crossmodal_retrieval")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
