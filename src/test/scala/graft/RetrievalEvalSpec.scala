package graft

import org.scalatest.funsuite.AnyFunSuite

/** B261 IR-evaluation suite: metric well-formedness, a JVM nDCG replay,
  * and the separation property — the eval must strictly rank the good
  * system above the bad one on graded gain for every query. */
class RetrievalEvalSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private lazy val rows = SparkEntry
    .queries("b261_retrieval_eval")(spark, sf).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getDouble(6)))

  test("well-formed: both rankers per query; metrics inside their ranges") {
    val byQ = rows.groupBy(_._1)
    assert(byQ.size === 3)
    for ((_, rs) <- byQ) assert(rs.map(_._2).sorted.toSeq === Seq("bm25", "worst"))
    for ((q, rk, nRel, p10, rec, rr, ndcg) <- rows) {
      assert(nRel > 0, s"q$q has no relevant docs — labels vacuous")
      assert(p10 >= 0 && p10 <= 10000, s"q$q/$rk p10 $p10")
      assert(rec >= 0 && rec <= 10000, s"q$q/$rk recall $rec")
      assert(rr >= 0 && rr <= 10000, s"q$q/$rk rr $rr")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"q$q/$rk ndcg $ndcg")
    }
  }

  test("separation: bm25 strictly dominates the worst-of-pool control on" +
    " graded nDCG (and weakly on every binary metric) for every query") {
    val byQ = rows.groupBy(_._1)
    for ((q, rs) <- byQ) {
      val good = rs.find(_._2 == "bm25").get
      val bad = rs.find(_._2 == "worst").get
      assert(good._7 > bad._7, s"q$q: nDCG failed to separate the systems")
      assert(good._4 >= bad._4 && good._5 >= bad._5 && good._6 >= bad._6,
        s"q$q: a binary metric ranked the control above bm25")
    }
  }

  test("nDCG replays in the JVM from the ranked docs and labels") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val q = Map(1L -> Seq("spark", "join"),
      2L -> Seq("window", "agg", "stream"), 3L -> Seq("fast", "table", "scan"))
    // labels: rel = min(3, sum tf div 2) over the doc's query terms
    def rel(terms: Seq[String], text: String): Long = {
      val toks = text.split(" ", -1)
      val s = terms.map(t => toks.count(_ == t).toLong).sum
      math.min(3L, s / 2)
    }
    val top = SparkEntry.queries("b107_text_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    def log2(x: Double) = math.log(x) / math.log(2.0)
    for ((qid, terms) <- q) {
      val labels = docs.map { case (id, t) => id -> rel(terms, t) }.toMap
      val dcg = top.filter(_._1 == qid)
        .map { case (_, rn, doc) =>
          (math.pow(2.0, labels(doc).toDouble) - 1.0) / log2(rn + 1.0) }.sum
      val idcg = labels.toSeq.filter(_._2 > 0)
        .sortBy { case (id, r) => (-r, id) }.take(10).zipWithIndex
        .map { case ((_, r), i) =>
          (math.pow(2.0, r.toDouble) - 1.0) / log2(i + 2.0) }.sum
      val want = BigDecimal(dcg / idcg)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val got = rows.find(r => r._1 == qid && r._2 == "bm25").get._7
      assert(math.abs(got - want) <= 1e-4 + 1e-9,
        s"q$qid ndcg: engine $got vs JVM replay $want")
    }
  }
}
