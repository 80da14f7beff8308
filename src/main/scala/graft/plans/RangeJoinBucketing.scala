package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a band/range theta join into a bucketed equi
  * join (SURVEY §4B "custom pieces", generalizing the hand-written b15
  * rewrite in [[graft.operators.TemporalJoins]]).
  *
  * Spark plans a join whose only condition is a range predicate
  * (`r.ts BETWEEN l.ts AND l.ts + INTERVAL w`) as a
  * BroadcastNestedLoopJoin — an O(|L|·|R|) scan that is the single worst
  * plan shape at 100 TB. But a band predicate admits an equi-join
  * decomposition: bucket both sides by `floor(x / w)`; any pair satisfying
  * `l <= r <= l + w` has `bucket(r) - bucket(l) ∈ {0, 1}`, so joining
  * `bucket(l) = b` against the right side exploded to `{bucket(r),
  * bucket(r) - 1}` is a complete candidate set. The original predicate is
  * kept as a residual filter, so the rewrite is semantics-preserving
  * independent of bound strictness.
  *
  * Fires only when:
  *   - the join has NO usable equi conjunct (else Spark already hash-joins);
  *   - two conjuncts form a band `probe ∈ [base, base + w]` (following
  *     window) or `probe ∈ [base - w, base]` (preceding window), where
  *     probe and base sit on opposite sides of the join (either
  *     orientation) and `w` is a literal interval (timestamp) or literal
  *     integral (numeric);
  *   - join type is Inner/Cross/LeftOuter/LeftSemi/LeftAnti (the right side
  *     is duplicated 2x pre-residual, which right/full-outer would observe
  *     in their null-extension; the left side is never duplicated, and a
  *     given (l, r) pair can match through at most one bucket copy).
  *
  * Buckets use exact floor division `(x - pmod(x, w)) div w` (not `div`,
  * which truncates toward zero and would misalign buckets for negative
  * epochs/values). Disable with spark.graft.rangeJoinBucketing.enabled=false.
  */
object RangeJoinBucketing extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.rangeJoinBucketing.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    plan.transformUp {
      case j: Join if j.resolved && eligible(j.joinType) && j.condition.isDefined =>
        rewrite(j).getOrElse(j)
    }
  }

  private def eligible(jt: JoinType): Boolean = jt match {
    case Inner | Cross | LeftOuter | LeftSemi | LeftAnti => true
    case _ => false
  }

  /** A conjunct `lo <= hi` (strictness irrelevant: the full original
    * condition stays as residual). */
  private case class Bound(lo: Expression, hi: Expression)

  private def asBound(e: Expression): Option[Bound] = e match {
    case LessThan(a, b)           => Some(Bound(a, b))
    case LessThanOrEqual(a, b)    => Some(Bound(a, b))
    case GreaterThan(a, b)        => Some(Bound(b, a))
    case GreaterThanOrEqual(a, b) => Some(Bound(b, a))
    case _                        => None
  }

  /** Split `e = base + width` (width may be negative — `ts - INTERVAL w`
    * optimizes to TimestampAddInterval with a negated literal, and numeric
    * `x - 10` stays a Subtract node). Width in microseconds for timestamps,
    * raw units for integrals. */
  private def asUpper(e: Expression): Option[(Expression, Long)] = e match {
    case TimestampAddInterval(base, Literal(w: Long, _: DayTimeIntervalType), _) =>
      Some((base, w))
    case Add(base, Literal(w: Long, LongType), _)        => Some((base, w))
    case Add(base, Literal(w: Int, IntegerType), _)      => Some((base, w.toLong))
    case Subtract(base, Literal(w: Long, LongType), _)   => Some((base, -w))
    case Subtract(base, Literal(w: Int, IntegerType), _) => Some((base, -w.toLong))
    case _ => None
  }

  private def sideOf(e: Expression, j: Join): Option[Boolean] = {
    // Some(true) = evaluable on left, Some(false) = right, None = neither
    if (!e.deterministic) None
    else if (e.references.subsetOf(j.left.outputSet)) Some(true)
    else if (e.references.subsetOf(j.right.outputSet)) Some(false)
    else None
  }

  /** floor(x / w) as exact integer arithmetic on the micros/raw value,
    * spelled overflow-safe: `x div w` corrected down by 1 for negative
    * non-exact x (Math.floorDiv semantics). The earlier spelling
    * `(x - pmod(x, w)) div w` overflowed for x within w of Long.MinValue
    * — an ANSI runtime error (or a silently wrong bucket) where the
    * original nested-loop join would have succeeded. Here no intermediate
    * can leave the Long range: w > 0 by detectBand, so `x div w` and
    * `x % w` are always in range, and the -1 correction moves the
    * quotient toward zero.
    * TimestampNTZ is deliberately NOT supported: UnixMicros accepts only
    * TimestampType (its inputTypes), so an NTZ rewrite would embed a
    * type-invalid expression into the optimized plan. */
  private def bucketOf(e: Expression, w: Long): Expression = {
    val x = e.dataType match {
      case TimestampType                                 => UnixMicros(e)
      case ByteType | ShortType | IntegerType | LongType => Cast(e, LongType)
      case _                                             => return Literal(null, LongType)
    }
    val wl = Literal(w, LongType)
    val q = IntegralDivide(x, wl)
    val r = Remainder(x, wl)
    If(And(LessThan(x, Literal(0L)), Not(EqualTo(r, Literal(0L)))),
      Subtract(q, Literal(1L)), q)
  }

  private def supportedType(dt: DataType): Boolean = dt match {
    case TimestampType => true
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** A detected band: `probe ∈ [base, base + width]` (`s1 = true`, the
    * "following window" idiom) or `probe ∈ [base - width, base]`
    * (`s1 = false`, the "preceding window" idiom — `ts - INTERVAL w`
    * optimizes to TimestampAddInterval with a negative literal). */
  private case class Band(probe: Expression, base: Expression, width: Long, s1: Boolean)

  private def detectBand(bounds: Seq[Bound]): Seq[Band] = {
    val s1 = for {
      Bound(base, probe) <- bounds
      if supportedType(probe.dataType)
      Bound(p2, up) <- bounds
      if p2.semanticEquals(probe)
      (b2, w) <- asUpper(up)
      if w > 0 && b2.semanticEquals(base)
    } yield Band(probe, base, w, s1 = true)
    val s2 = for {
      Bound(loAdd, probe) <- bounds
      if supportedType(probe.dataType)
      (base, w) <- asUpper(loAdd).toSeq
      if w < 0
      Bound(p2, b2) <- bounds
      if p2.semanticEquals(probe) && b2.semanticEquals(base)
    } yield Band(probe, base, -w, s1 = false)
    s1 ++ s2
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)

    // bail if an equi conjunct across sides exists: ExtractEquiJoinKeys will
    // already give Spark a hash/sort-merge join, and firing on our own
    // output's bucket equality is what makes this rule idempotent
    val hasEqui = conjuncts.exists {
      case Equality(a, b) =>
        (sideOf(a, j), sideOf(b, j)) match {
          case (Some(x), Some(y)) => x != y
          case _                  => false
        }
      case _ => false
    }
    if (hasEqui) return None

    val candidates = detectBand(conjuncts.flatMap(asBound)).flatMap { band =>
      (sideOf(band.probe, j), sideOf(band.base, j)) match {
        case (Some(pLeft), Some(bLeft)) if pLeft != bLeft =>
          Some((band, !pLeft)) // probeOnRight
        case _ => None
      }
    }

    candidates.headOption.map { case (band, probeOnRight) =>
      val (lExpr, rExpr) =
        if (probeOnRight) (band.base, band.probe) else (band.probe, band.base)
      // With δ = bucket(probe) - bucket(base): S1 ⇒ δ ∈ {0,1}, S2 ⇒ δ ∈
      // {-1,0}. The right side therefore also matches at offset `step`:
      //   probe right, S1: bucket(l)=bucket(probe)-δ       → {b_r, b_r-1}
      //   probe right, S2: bucket(l)=bucket(probe)-δ, δ≤0  → {b_r, b_r+1}
      //   probe left,  S1: bucket(l)=bucket(base)+δ        → {b_r, b_r+1}
      //   probe left,  S2: bucket(l)=bucket(base)+δ, δ≤0   → {b_r, b_r-1}
      val step = if (probeOnRight == band.s1) -1L else 1L
      val w = band.width
      val bl = Alias(bucketOf(lExpr, w), "__graft_bucket_l")()
      val newLeft = Project(j.left.output :+ bl, j.left)
      val rBucket = bucketOf(rExpr, w)
      val arr = CreateArray(Seq(rBucket, Add(rBucket, Literal(step))))
      val genOut = AttributeReference("__graft_bucket_r", LongType)()
      val newRight =
        Generate(Explode(arr), unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(genOut), child = j.right)
      val newCond = And(EqualTo(bl.toAttribute, genOut), j.condition.get)
      Project(j.output, Join(newLeft, newRight, j.joinType, Some(newCond), j.hint))
    }
  }
}
