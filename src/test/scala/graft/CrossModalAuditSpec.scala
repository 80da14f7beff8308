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
}
