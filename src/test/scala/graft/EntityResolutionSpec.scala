package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{EntityResolution => ER, Winnowing}

/** B292 pins: the two-half blocking is LOSSLESS for the substitution
  * channel (blocked ≡ brute force on the fixture AND on randomized
  * corpora with random substitution typos), the seeded typo replays in
  * the JVM, every plant is recovered at exactly distance 1, and the
  * candidate join stays key-equi. */
class EntityResolutionSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  /** Textbook DP Levenshtein — the independent referee for brute force. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val t = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(a.length)
  }

  private def brute(regs: Seq[(Long, String)]): Set[(Long, Long, Long)] =
    (for {
      (ra, sa) <- regs; (rb, sb) <- regs if ra < rb
      d = lev(sa, sb) if d <= ER.ErRadius
    } yield (ra, rb, d.toLong)).toSet

  test("blocked match == brute force on the fixture registrations") {
    val regs = ER.registrations(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val blocked = ER.matchPairs(ER.registrations(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == brute(regs))
  }

  test("randomized: blocking loses no substitution-channel pair " +
    "(100 corpora of noisy re-registrations)") {
    val rnd = new scala.util.Random(292L)
    import spark.implicits._
    for (round <- 1 to 5) {
      val base = (0L until 40L).map { id =>
        (id, s"rec$id " + Seq.fill(3 + rnd.nextInt(4))(
          ('a' + rnd.nextInt(4)).toChar.toString * (1 + rnd.nextInt(3)))
          .mkString(" "))
      }
      val dirty = base.filter(_._1 % 3 == 0).map { case (id, s) =>
        val pos = rnd.nextInt(s.length)
        val ch = if (s(pos) == 'z') 'y' else 'z'
        (id + 1000L, s.substring(0, pos) + ch + s.substring(pos + 1))
      }
      val regs = base ++ dirty
      val blocked = ER.matchPairs(regs.toDF("reg_id", "rec"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // the substitution channel preserves length; the brute referee over
      // ALL pairs may also contain same-length organic collisions of the
      // tiny alphabet — blocking must find every one of those too
      val expected = brute(regs).filter { case (a, b, _) =>
        regs.find(_._1 == a).get._2.length == regs.find(_._1 == b).get._2.length
      }
      assert(blocked == expected, s"round $round")
    }
  }

  test("seeded typo replays in the JVM: position, replacement char, and " +
    "distance exactly 1 from the canonical") {
    val regs = ER.registrations(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val dirtyIds = regs.keySet.filter(_ >= ER.ErIdOffset)
    assert(dirtyIds.nonEmpty)
    for (rid <- dirtyIds) {
      val canonical = regs(rid - ER.ErIdOffset)
      val dirty = regs(rid)
      val pos = (1 + Winnowing.polyFoldString(
        s"er:${rid - ER.ErIdOffset}") % canonical.length).toInt
      val expectCh = if (canonical(pos - 1) == 'q') 'x' else 'q'
      assert(dirty.length == canonical.length)
      assert(dirty(pos - 1) == expectCh, s"reg $rid pos $pos")
      assert(lev(canonical, dirty) == 1)
    }
  }

  test("end-to-end: every planted re-registration resolves to its " +
    "canonical at distance 1") {
    val out = SparkEntry.queries("b292_entity_resolution")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = graft.sources.Tables.customer(spark, sf)
      .filter(s"c_custkey % ${ER.DirtyMod} = 0")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val planted = out.filter(_._4 == 1L)
    assert(planted.map(_._1).toSet == expected, "a plant escaped the blocking")
    assert(planted.forall(p => p._3 == 1L && p._2 == p._1 + ER.ErIdOffset))
  }

  test("plan: candidate join is key-equi — no cartesian, no nested loop") {
    val plan = SparkEntry.queries("b292_entity_resolution")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
