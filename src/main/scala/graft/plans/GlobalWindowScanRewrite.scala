package graft.plans

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: decompose a GLOBAL running sum — `sum(e) OVER (ORDER BY
  * k)` with no PARTITION BY — into the two-phase bucketed scan (SURVEY
  * §4B "custom pieces"; the B97 decomposition, generalized and automated).
  *
  * The naive spelling plans as `Exchange SinglePartition` + one Window
  * task over the ENTIRE relation — the single worst plan shape for a
  * prefix sum at 100 TB (every row funnels through one core). But a
  * running sum is associative, so it decomposes: bucket rows by
  * `k div W`; within each bucket a PARTITIONED window computes the local
  * prefix in parallel; per-bucket totals (an O(buckets) aggregate)
  * running-summed by a window over TINY input give each bucket's offset;
  * global prefix = local prefix + bucket offset, stitched by a broadcast
  * join on the bucket id.
  *
  * Fires only when (conservatively — anything else keeps the naive plan):
  *   - the Window has NO partitionSpec and exactly one ASCENDING order key
  *     of integral type (nullable keys allowed with the default
  *     NULLS FIRST ordering — the null bucket sorts first and joins via
  *     null-safe equality);
  *   - every window function is a plain `sum` (no DISTINCT, no FILTER)
  *     over a DETERMINISTIC, NON-NULLABLE integral argument — integer
  *     addition is reassociable with no float drift and no null-poisoning
  *     edge (a nullable argument changes where a running sum is NULL, so
  *     it is excluded rather than approximated);
  *   - the frame is UNBOUNDED PRECEDING .. CURRENT ROW (ROWS or RANGE —
  *     RANGE is the SQL default for an ORDER BY window and is exactly
  *     preserved: ties share a bucket);
  *   - the child is a Project/Filter/SubqueryAlias chain over
  *     multi-instantiable leaves, so the totals side can be cloned with
  *     fresh expression ids (an optimizer rule must not emit the same
  *     attribute id on both sides of a join).
  *
  * The totals-side windows sum AGGREGATED (nullable) attributes, so the
  * rule can never match its own output — no fixed-point recursion.
  * Bucket width: spark.graft.globalWindowScan.bucketWidth (default 1000);
  * disable with spark.graft.globalWindowScan.enabled=false.
  * GlobalWindowSpec pins result equality against the naive plan and the
  * partitioned shape of the corpus-feeding window.
  */
object GlobalWindowScanRewrite extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.globalWindowScan.enabled"
  private val WidthKey = "spark.graft.globalWindowScan.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    // Defensive parse (ADVICE r7): a malformed width must skip the rewrite,
    // not throw inside the optimizer (which would fail EVERY query in the
    // session); a width < 1 would make bucketOf decreasing/undefined in the
    // order key and silently corrupt the running sums.
    scala.util.Try(conf.getConfString(WidthKey, "1000").toLong).toOption
      .filter(_ >= 1L) match {
      case None => plan
      case Some(width) =>
        plan.transformUp {
          case w: Window if w.resolved && eligible(w) =>
            rewrite(w, width).getOrElse(w)
        }
    }
  }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def eligible(w: Window): Boolean =
    w.partitionSpec.isEmpty && w.orderSpec.size == 1 &&
      w.windowExpressions.nonEmpty && {
        val so = w.orderSpec.head
        so.direction == Ascending && integral(so.child.dataType) &&
          so.child.deterministic &&
          (!so.child.nullable || so.nullOrdering == NullsFirst) &&
          w.windowExpressions.forall(eligibleSum)
      }

  /** Alias(WindowExpression(sum(e) over (unbounded-preceding..current))). */
  private def eligibleSum(ne: NamedExpression): Boolean = ne match {
    case Alias(WindowExpression(
        AggregateExpression(s: Sum, Complete, false, None, _), spec), _) =>
      s.child.deterministic && !s.child.nullable && integral(s.child.dataType) &&
        (spec.frameSpecification match {
          case SpecifiedWindowFrame(RowFrame | RangeFrame,
              UnboundedPreceding, CurrentRow) => true
          case _ => false
        })
    case _ => false
  }

  /** `k div W` as exact floor division (IntegralDivide truncates toward
    * zero — wrong for negative keys unless corrected). */
  private def bucketOf(k: Expression, w: Long): Expression = {
    val x = Cast(k, LongType)
    val wl = Literal(w, LongType)
    val q = IntegralDivide(x, wl)
    val r = Remainder(x, wl)
    If(And(LessThan(x, Literal(0L)), Not(EqualTo(r, Literal(0L)))),
      Subtract(q, Literal(1L)), q)
  }

  private type AttrMap = Map[ExprId, Attribute]

  private def remap(e: Expression, m: AttrMap): Expression =
    e.transform { case a: Attribute => m.getOrElse(a.exprId, a) }

  /** Fresh-exprId structural clone of a Project/Filter/SubqueryAlias
    * chain over MultiInstanceRelation leaves; returns the clone plus the
    * old→new output attribute map. Anything else → None (skip rewrite). */
  private def cloneChain(p: LogicalPlan): Option[(LogicalPlan, AttrMap)] = p match {
    case m: MultiInstanceRelation =>
      val n = m.newInstance().asInstanceOf[LogicalPlan]
      Some((n, p.output.map(_.exprId).zip(n.output).toMap))
    case Project(list, child) =>
      cloneChain(child).flatMap { case (nc, cm) =>
        val mapped = list.map {
          case a: Alias =>
            val na = Alias(remap(a.child, cm), a.name)()
            Some((na: NamedExpression, a.exprId -> na.toAttribute))
          case attr: Attribute =>
            val na = cm.getOrElse(attr.exprId, attr)
            Some((na: NamedExpression, attr.exprId -> na))
          case _ => None
        }
        if (mapped.exists(_.isEmpty)) None
        else {
          val pairs = mapped.flatten
          Some((Project(pairs.map(_._1), nc), pairs.map(_._2).toMap))
        }
      }
    case Filter(cond, child) =>
      cloneChain(child).map { case (nc, cm) => (Filter(remap(cond, cm), nc), cm) }
    case s: SubqueryAlias =>
      cloneChain(s.child).map { case (nc, cm) => (s.copy(child = nc), cm) }
    case _ => None
  }

  private def rewrite(w: Window, width: Long): Option[LogicalPlan] = {
    val key = w.orderSpec.head.child
    val aliases = w.windowExpressions.collect {
      case a @ Alias(WindowExpression(
          AggregateExpression(s: Sum, Complete, false, None, _), _), _) => (a, s)
    }
    if (aliases.size != w.windowExpressions.size) return None

    cloneChain(w.child).map { case (rightChild, rm) =>
      // LEFT: bucket + per-bucket local running sums (parallel window)
      val bL = Alias(bucketOf(key, width), "_gw_bucket_l")()
      val leftB = Project(w.child.output :+ bL, w.child)
      val locals = aliases.zipWithIndex.map { case ((a, s), i) =>
        val we = a.child.asInstanceOf[WindowExpression]
        val spec = we.windowSpec.copy(partitionSpec = Seq(bL.toAttribute))
        Alias(WindowExpression(we.windowFunction, spec), s"_gw_loc_$i")()
      }
      val localWin =
        Window(locals, Seq(bL.toAttribute), w.orderSpec, leftB)

      // RIGHT (cloned ids): per-bucket totals → running offset over the
      // O(buckets)-row relation (its own tiny single partition is the
      // whole point), offset = running − own total
      val bR = Alias(bucketOf(remap(key, rm), width), "_gw_bucket_r")()
      val rightB = Project(rightChild.output :+ bR, rightChild)
      val tots = aliases.zipWithIndex.map { case ((_, s), i) =>
        Alias(AggregateExpression(
          s.withNewChildren(Seq(remap(s.child, rm))).asInstanceOf[Sum],
          Complete, isDistinct = false), s"_gw_tot_$i")()
      }
      val agg = Aggregate(Seq(bR.toAttribute),
        (bR.toAttribute: NamedExpression) +: tots, rightB)
      val bOrder = Seq(SortOrder(bR.toAttribute, Ascending))
      val runs = tots.zipWithIndex.map { case (t, i) =>
        Alias(WindowExpression(
          AggregateExpression(Sum(t.toAttribute), Complete, isDistinct = false),
          WindowSpecDefinition(Nil, bOrder,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
          s"_gw_run_$i")()
      }
      val offWin = Window(runs, Nil, bOrder, agg)
      val offs = tots.zip(runs).zipWithIndex.map { case ((t, r), i) =>
        Alias(Subtract(r.toAttribute, t.toAttribute), s"_gw_off_$i")()
      }
      val offProj = Project((bR.toAttribute: NamedExpression) +: offs, offWin)

      // STITCH: null-safe equi join (null keys share the null bucket),
      // offsets side broadcast, original output ids preserved
      val join = Join(localWin, offProj, Inner,
        Some(EqualNullSafe(bL.toAttribute, bR.toAttribute)),
        JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
      val restored = aliases.zipWithIndex.map { case ((a, _), i) =>
        Alias(Add(locals(i).toAttribute, offs(i).toAttribute), a.name)(
          exprId = a.exprId)
      }
      Project(w.child.output ++ restored, join)
    }
  }
}
