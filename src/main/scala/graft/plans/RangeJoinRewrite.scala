package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Catalyst optimizer rule: rewrite pure range joins (point-in-interval,
  * no equi keys) into the bucketed-equi-join decomposition of
  * [[graft.operators.RangeJoin]], automatically.
  *
  * Spark plans `points JOIN intervals ON p BETWEEN s AND e` as a
  * BroadcastNestedLoopJoin — O(|P|·|I|) compares and a hard OOM once
  * neither side broadcasts. The library API (`RangeJoin.pointInInterval`)
  * fixes that for callers who know it exists; this rule fixes it for
  * everyone else: any eligible logical Join is rewritten in place, so a
  * plain `spark.sql("... ON p >= s AND p <= e")` plans as a HASH join.
  *
  * Eligibility (all must hold, checked structurally):
  *  - INNER join with a conjunctive condition containing a lower bound
  *    (`p >= s` / `p > s`) and an upper bound (`p <= e` / `p < e`) on the
  *    SAME canonicalized point expression, where the point references
  *    exactly one join side and both bounds the other;
  *  - point and bound expressions are integral (byte/short/int/long) —
  *    bucket arithmetic stays exact (timestamps: join on `unix_micros`);
  *  - NO cross-side equality conjunct (with one, Spark already plans a
  *    hash join on it — the rewrite would only add explode overhead);
  *  - `spark.graft.rangeJoin.enabled` is true (default).
  *
  * The rewrite appends a bucket id to the point side
  * (`floor(p / width)`, exact integer arithmetic), explodes the interval
  * side to its covered buckets (`sequence(floor(s/w), floor(e/w))`), and
  * joins on bucket equality AND the ORIGINAL condition as residual — so
  * results are identical to the nested-loop plan, each pair matching in
  * the point's single bucket exactly once (the correctness argument and
  * its PropertySpec laws live on [[graft.operators.RangeJoin]]). A final
  * Project restores the original output columns.
  *
  * Bucket width comes from `spark.graft.rangeJoin.bucketWidth` (default
  * 3600000000 = one hour in epoch-micros); set it near the typical
  * interval span. Unlike the library API there is no max-buckets assert —
  * a pathologically wide interval degrades to a big (correct) explode;
  * `Sequence` itself fails loudly past ~2^31 elements.
  *
  * NULL semantics match the nested loop: a NULL point or bound makes the
  * original predicate non-true (row dropped under INNER); in the rewrite
  * the bucket id / sequence is NULL, so bucket equality (or Generate on a
  * NULL array) drops the same row.
  *
  * Idempotent by construction: the rewritten join carries a cross-side
  * equality (the bucket ids), which makes it ineligible on the next
  * fixed-point pass.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.rangeJoin.enabled"
  val WidthKey = "spark.graft.rangeJoin.bucketWidth"
  val DefaultWidth = 3600000000L // 1h in epoch-micros

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def toLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** floor(x / w) in exact integer arithmetic (negative-safe): the
    * numerator is the exact multiple x - pmod(x, w), so the integral
    * divide is exact — never a double on the way (RangeJoin.fdiv note).
    */
  private def bucket(x: Expression, w: Long): Expression = {
    val xl = toLong(x)
    new IntegralDivide(Subtract(xl, Pmod(xl, Literal(w))), Literal(w))
  }

  /** (point, lower, upper) when the conjunct set bounds one expression
    * from both sides: point refs exactly one side, bounds the other.
    */
  private def findRange(
      conjuncts: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    // normalize every comparison to (smaller, larger)
    val les = conjuncts.collect {
      case LessThanOrEqual(a, b) => (a, b)
      case LessThan(a, b) => (a, b)
      case GreaterThanOrEqual(a, b) => (b, a)
      case GreaterThan(a, b) => (b, a)
    }.filter { case (a, b) =>
      integral(a) && integral(b) && a.deterministic && b.deterministic &&
        sideOf(a).isDefined && sideOf(b).isDefined && sideOf(a) != sideOf(b)
    }
    // lower bound: s <= p; upper bound: p <= e — same canonical p, with
    // s and e on the opposite side from p
    val candidates = for {
      (s, p1) <- les
      (p2, e) <- les
      if p1.canonicalized == p2.canonicalized
      if sideOf(s) == sideOf(e) && sideOf(p1) != sideOf(s)
    } yield (p1, s, e)
    candidates.headOption
  }

  private def hasCrossEquality(
      conjuncts: Seq[Expression], left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) => crossSide(a, b, left, right)
      case EqualNullSafe(a, b) => crossSide(a, b, left, right)
      case _ => false
    }

  private def crossSide(
      a: Expression, b: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    (a.references.nonEmpty && b.references.nonEmpty) &&
      ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet)))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    val width = conf.getConfString(WidthKey, DefaultWidth.toString).toLong
    require(width > 0, s"$WidthKey must be > 0, got $width")

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && {
            val cs = splitConjunctivePredicates(cond)
            !hasCrossEquality(cs, left, right) && findRange(cs, left, right).isDefined
          } =>
        val cs = splitConjunctivePredicates(cond)
        val (p, s, e) = findRange(cs, left, right).get
        val pointOnLeft = p.references.subsetOf(left.outputSet)

        val pBkt = Alias(bucket(p, width), "__graft_bkt_p")()
        // optimizer rules run after ResolveTimeZone: the tz-aware Sequence
        // must carry its timeZoneId or the plan flips back to unresolved
        val ivSeq = Sequence(bucket(s, width), bucket(e, width), None,
          Some(conf.sessionLocalTimeZone))
        val ivAttr = AttributeReference("__graft_bkt_i", LongType)()

        def withPoint(side: LogicalPlan) = Project(side.output :+ pBkt, side)
        def withBuckets(side: LogicalPlan) =
          Generate(Explode(ivSeq), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(ivAttr), child = side)

        val (newLeft, newRight) =
          if (pointOnLeft) (withPoint(left), withBuckets(right))
          else (withBuckets(left), withPoint(right))
        val newCond = And(EqualTo(pBkt.toAttribute, ivAttr), cond)
        Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
