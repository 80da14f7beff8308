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
  *   - one conjunct bounds a right-side expression below by a left-side
  *     expression (either orientation), and another bounds it above by
  *     `same-left-expr + literal interval` (timestamp) or `+ literal
  *     integral` (numeric);
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

  /** Split `hi = base + width` for supported widths, in microseconds for
    * timestamps / raw units for integrals. */
  private def asUpper(e: Expression): Option[(Expression, Long)] = e match {
    case TimestampAddInterval(base, Literal(w: Long, _: DayTimeIntervalType), _) =>
      Some((base, w))
    case Add(base, Literal(w: Long, LongType), _)   => Some((base, w))
    case Add(base, Literal(w: Int, IntegerType), _) => Some((base, w.toLong))
    case _ => None
  }

  private def sideOf(e: Expression, j: Join): Option[Boolean] = {
    // Some(true) = evaluable on left, Some(false) = right, None = neither
    if (!e.deterministic) None
    else if (e.references.subsetOf(j.left.outputSet)) Some(true)
    else if (e.references.subsetOf(j.right.outputSet)) Some(false)
    else None
  }

  /** floor(x / w) as exact integer arithmetic on the micros/raw value. */
  private def bucketOf(e: Expression, w: Long): Expression = {
    val x = e.dataType match {
      case TimestampType | TimestampNTZType                => UnixMicros(e)
      case ByteType | ShortType | IntegerType | LongType   => Cast(e, LongType)
      case _                                               => return Literal(null, LongType)
    }
    val wl = Literal(w, LongType)
    IntegralDivide(Subtract(x, Pmod(x, wl)), wl)
  }

  private def supportedType(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType => true
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
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

    val bounds = conjuncts.flatMap(asBound)
    // lower: leftExpr <= rightExpr  (probe expr on the right side)
    val candidates = for {
      Bound(lLo, rProbe) <- bounds
      if supportedType(rProbe.dataType)
      if sideOf(lLo, j).contains(true) && sideOf(rProbe, j).contains(false)
      Bound(rProbe2, up) <- bounds
      if rProbe2.semanticEquals(rProbe)
      (base, w) <- asUpper(up)
      if w > 0 && base.semanticEquals(lLo)
    } yield (lLo, rProbe, w)

    candidates.headOption.map { case (lExpr, rExpr, w) =>
      val bl = Alias(bucketOf(lExpr, w), "__graft_bucket_l")()
      val newLeft = Project(j.left.output :+ bl, j.left)
      val rBucket = bucketOf(rExpr, w)
      val arr = CreateArray(Seq(rBucket, Subtract(rBucket, Literal(1L))))
      val genOut = AttributeReference("__graft_bucket_r", LongType)()
      val newRight =
        Generate(Explode(arr), unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(genOut), child = j.right)
      val newCond = And(EqualTo(bl.toAttribute, genOut), j.condition.get)
      Project(j.output, Join(newLeft, newRight, j.joinType, Some(newCond), j.hint))
    }
  }
}
