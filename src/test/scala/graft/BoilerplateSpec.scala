package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.{Boilerplate => BP}

/** B300/B301 pins: extraction FIDELITY (for every doc whose two paragraph
  * blocks both survive the density rule, the reassembled main text equals
  * the original document text verbatim — and that is the bulk of the
  * corpus), chrome SUPPRESSION (no extracted text ever contains markup or
  * footer/nav boilerplate), the planted-leak margin (the leak-stuffed
  * footer can never reach the density threshold at the corpus's 8-char
  * word cap), the B301 verdict flip (planted docs are contaminated on raw
  * HTML, clean on extracted text — extraction CHANGED the hygiene
  * verdict), and the one-exchange plan shape. */
class BoilerplateSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private lazy val b300 =
    SparkEntry.queries("b300_boilerplate_extract")(spark, sf).collect()
  private lazy val docs = graft.sources.Tables.documents(spark, sf)
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("fidelity: whenever both paragraph halves survive (n_kept = 2), " +
    "main_text equals the original document text verbatim") {
    var full = 0
    b300.foreach { r =>
      val (id, nKept, main) = (r.getLong(0), r.getLong(2), r.getString(5))
      if (nKept == 2) { assert(main == docs(id), s"doc $id drifted"); full += 1 }
    }
    // the fidelity claim must not be vacuous: most docs keep both halves
    assert(full > b300.length * 6 / 10, s"only $full/${b300.length} full")
  }

  test("chrome suppression: extracted text never contains markup or " +
    "nav/footer boilerplate") {
    b300.foreach { r =>
      val main = r.getString(5)
      assert(!main.contains("<") && !main.contains(">"), s"markup leaked: $main")
      assert(!main.contains("copyright site"), "footer leaked")
      assert(!main.contains("about us") && !main.contains("read more"),
        "nav/related chrome leaked")
    }
  }

  test("planted-leak margin: the worst-case leak-stuffed footer stays " +
    "under the density threshold (static bound + on-corpus check)") {
    // footer block: 14 tags (footer + 5 anchor pairs + /footer /body
    // /html); static text 50 chars; leak <= 12 words * 8-char vocab cap
    // + 13 separators/padding
    val worstFooterText = 50 + BP.LeakWords * 8 + 13
    assert(worstFooterText < BP.DensityK * 14,
      "a max-length leak could make the footer survive extraction")
    // and on the fixture: no planted doc's extracted text carries the leak
    val leak = docs(0L).split(" ").take(BP.LeakWords).mkString(" ")
    b300.foreach { r =>
      val (id, main) = (r.getLong(0), r.getString(5))
      if (id % BP.PlantEvery == BP.PlantRem && id % 40 != 0 && id != 0)
        assert(!main.contains(leak), s"doc $id: leak survived extraction")
    }
  }

  test("B301 verdict flip: every planted doc is contaminated on raw HTML " +
    "and clean on extracted main text") {
    val out = SparkEntry.queries("b301_boilerplate_decontam")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val planted = out.filter(_._6 == 1L)
    val expected = docs.keySet
      .filter(id => id % BP.PlantEvery == BP.PlantRem && id % 40 != 0)
    assert(planted.map(_._1).toSet == expected,
      "a planted footer leak escaped the raw-HTML leg")
    planted.foreach { p =>
      assert(p._4 == 1L, s"doc ${p._1}: raw leg missed the planted leak")
      assert(p._5 == 0L, s"doc ${p._1}: extraction failed to clean the leak")
      assert(p._2 >= graft.llm.Decontaminate.MinOverlap,
        s"doc ${p._1}: planted overlap ${p._2} below the flag threshold")
    }
  }

  test("plan: extraction reuses ONE doc_id exchange for both windows and " +
    "both aggregates; no cartesian anywhere") {
    val blocks = BP.extractBlocks(BP.htmlDocs(spark, sf))
    val agg = BP.extractMain(blocks)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"extraction shuffled more than once:\n${plan.take(3000)}")
  }
}
