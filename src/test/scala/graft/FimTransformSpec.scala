package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.FimTransform
import graft.sources.Tables

/** B175 FIM transform: the span algebra (reconstruction, non-degenerate
  * spans, the FIM rate) beyond the t2 hash. */
class FimTransformSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  test("B175: transformed docs reconstruct exactly; spans are non-degenerate; plain passes through") {
    val original = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("b175_fim_transform")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(rows.length === original.size)
    var psm = 0; var spm = 0; var plain = 0
    rows.foreach { case (id, mode, np, nm, ns, fim) =>
      val orig = original(id)
      mode match {
        case "plain" =>
          plain += 1
          assert(fim === orig, s"doc $id: plain not passthrough")
          assert(np === 0 && nm === 0 && ns === 0)
        case "psm" | "spm" =>
          if (mode == "psm") psm += 1 else spm += 1
          assert(np > 0 && nm > 0 && ns > 0, s"doc $id: degenerate span")
          assert(np + nm + ns === orig.length.toLong, s"doc $id: span counts")
          val (p, m, sx) =
            if (mode == "psm") {
              // <PRE>p<SUF>s<MID>m
              val afterPre = fim.stripPrefix(FimTransform.Pre)
              val p = afterPre.substring(0, np.toInt)
              val rest = afterPre.substring(np.toInt).stripPrefix(FimTransform.Suf)
              val s2 = rest.substring(0, ns.toInt)
              val m = rest.substring(ns.toInt).stripPrefix(FimTransform.Mid)
              (p, m, s2)
            } else {
              // <SUF>s<PRE>p<MID>m
              val afterSuf = fim.stripPrefix(FimTransform.Suf)
              val s2 = afterSuf.substring(0, ns.toInt)
              val rest = afterSuf.substring(ns.toInt).stripPrefix(FimTransform.Pre)
              val p = rest.substring(0, np.toInt)
              val m = rest.substring(np.toInt).stripPrefix(FimTransform.Mid)
              (p, m, s2)
            }
          assert(p + m + sx === orig, s"doc $id: reconstruction broke")
      }
    }
    // the 50% FIM rate binds (doc_id % 10 < 5), PSM/SPM alternate by parity
    assert(psm > 0 && spm > 0 && plain > 0)
    assert(math.abs((psm + spm) - plain) < rows.length / 5,
      s"FIM rate off: ${psm + spm} transformed vs $plain plain")
  }
}
