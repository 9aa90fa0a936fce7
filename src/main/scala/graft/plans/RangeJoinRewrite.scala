package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Catalyst optimizer rule: rewrite pure range joins — point-in-interval
  * AND interval-overlap, no equi keys — into the bucketed-equi-join
  * decomposition of [[graft.operators.RangeJoin]], automatically.
  *
  * Spark plans a bare non-equi predicate (`p BETWEEN s AND e`, or the
  * overlap test `s1 <= e2 AND s2 <= e1`) as a BroadcastNestedLoopJoin —
  * O(n·m) compares and a hard OOM once neither side broadcasts. The
  * library API (`RangeJoin.pointInInterval` / `intervalOverlap`) fixes
  * that for callers who know it exists; this rule fixes it for everyone
  * else: any eligible logical Join is rewritten in place, so a plain
  * `spark.sql("... ON p >= s AND p <= e")` plans as a HASH join.
  *
  * Eligibility (all must hold, checked structurally):
  *  - INNER join whose conjunctive condition contains either
  *    (a) '''point-in-interval''': a lower and an upper bound
  *    (`p >= s` / `p > s` and `p <= e` / `p < e`) on the SAME
  *    canonicalized point expression, point on one side, bounds on the
  *    other; or
  *    (b) '''interval overlap''': two opposite-orientation cross-side
  *    comparisons `x1 <= y2` and `y1 <= x2` (x's one side, y's other) —
  *    the standard overlap test; (a) is tried first (its point side
  *    keeps a single bucket, no explode);
  *  - every range operand is integral (byte/short/int/long) — bucket
  *    arithmetic stays exact (timestamps: join on `unix_micros`);
  *  - NO cross-side equality conjunct (with one, Spark already plans a
  *    hash join on it — the rewrite would only add explode overhead);
  *  - `spark.graft.rangeJoin.enabled` is true (default).
  *
  * Point-in-interval rewrite: bucket id projected on the point side,
  * interval side exploded to covered buckets, join on bucket equality
  * with the ORIGINAL condition as residual; a pair meets in the point's
  * single bucket exactly once. Interval-overlap rewrite: BOTH sides
  * explode over their span's buckets (endpoint order normalized with
  * least/greatest, so even inverted `x1 > x2` rows — which the original
  * join may still emit — are covered), and exactly-once is restored by
  * keeping a pair only in the FIRST shared span bucket
  * (`greatest(bucket(lo_x), bucket(lo_y))` — the spans of any
  * residual-passing pair overlap, so that bucket exists in both
  * explosions). Results are identical to the nested-loop plan in both
  * shapes; the correctness laws live on [[graft.operators.RangeJoin]]
  * and the rule's ExtensionsSpec equivalence tests. A final Project
  * restores the original output columns.
  *
  * Bucket width comes from `spark.graft.rangeJoin.bucketWidth` (default
  * 3600000000 = one hour in epoch-micros); set it near the typical
  * interval span. Unlike the library API there is no max-buckets assert —
  * a pathologically wide interval degrades to a big (correct) explode;
  * `Sequence` itself fails loudly past ~2^31 elements.
  *
  * NULL semantics match the nested loop: a NULL operand makes the
  * original predicate non-true (row dropped under INNER); in the rewrite
  * the residual drops the same pair (a NULL bucket sequence additionally
  * drops the row at the Generate — never a false match either way;
  * least/greatest skip NULLs, so an overlap row with one NULL endpoint
  * may explode and travel to the join, where the residual kills it).
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

  private sealed trait Pattern
  /** `s <= p <= e`: point expr + both bounds (bounds opposite side). */
  private case class PointInInterval(p: Expression, s: Expression, e: Expression) extends Pattern
  /** `x1 <= y2 && y1 <= x2` with x's from the LEFT side, y's RIGHT. */
  private case class IntervalOverlap(
      x1: Expression, x2: Expression, y1: Expression, y2: Expression) extends Pattern

  private def findPattern(
      conjuncts: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan): Option[Pattern] = {
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
    // point-in-interval first: its rewrite explodes only one side
    val point = (for {
      (s, p1) <- les
      (p2, e) <- les
      if p1.canonicalized == p2.canonicalized
      if sideOf(s) == sideOf(e) && sideOf(p1) != sideOf(s)
    } yield PointInInterval(p1, s, e)).headOption
    point.orElse {
      // overlap: one (left-expr <= right-expr) + one (right-expr <= left-expr)
      val lr = les.filter { case (a, _) => sideOf(a).contains(true) }
      val rl = les.filter { case (a, _) => sideOf(a).contains(false) }
      (for { (x1, y2) <- lr; (y1, x2) <- rl }
        yield IntervalOverlap(x1, x2, y1, y2)).headOption
    }
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
    // kill switch: only an explicit (case-insensitive) "false" disables —
    // any other value keeps the default-on behavior and never throws, so
    // a typo'd conf can't take down unrelated queries
    if (conf.getConfString(EnabledKey, "true").trim.equalsIgnoreCase("false")) return plan
    // width is parsed ONLY when an eligible join is actually found: a
    // malformed value must fail the query that needs the rewrite (loud,
    // actionable), not every plan in the session
    lazy val width: Long = {
      val raw = conf.getConfString(WidthKey, DefaultWidth.toString)
      val w = try raw.trim.toLong catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$WidthKey must be a positive long (epoch-micros), got '$raw'")
      }
      require(w > 0, s"$WidthKey must be > 0, got $w")
      w
    }

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) if j.resolved =>
        val cs = splitConjunctivePredicates(cond)
        if (hasCrossEquality(cs, left, right)) j
        else findPattern(cs, left, right).map(rewrite(j, _, width)).getOrElse(j)
    }
  }

  // optimizer rules run after ResolveTimeZone: the tz-aware Sequence must
  // carry its timeZoneId or the plan flips back to unresolved
  private def seqOf(lo: Expression, hi: Expression): Sequence =
    Sequence(lo, hi, None, Some(conf.sessionLocalTimeZone))

  private def explodeTo(side: LogicalPlan, seq: Sequence, attr: Attribute): Generate =
    Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(attr), child = side)

  private def rewrite(j: Join, pattern: Pattern, width: Long): LogicalPlan = pattern match {
    case PointInInterval(p, s, e) =>
      val pointOnLeft = p.references.subsetOf(j.left.outputSet)
      val pBkt = Alias(bucket(p, width), "__graft_bkt_p")()
      val ivAttr = AttributeReference("__graft_bkt_i", LongType)()
      def withPoint(side: LogicalPlan) = Project(side.output :+ pBkt, side)
      def withBuckets(side: LogicalPlan) =
        explodeTo(side, seqOf(bucket(s, width), bucket(e, width)), ivAttr)
      val (newLeft, newRight) =
        if (pointOnLeft) (withPoint(j.left), withBuckets(j.right))
        else (withBuckets(j.left), withPoint(j.right))
      val newCond = And(EqualTo(pBkt.toAttribute, ivAttr), j.condition.get)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))

    case IntervalOverlap(x1, x2, y1, y2) =>
      // endpoint order normalized per row: inverted intervals (x1 > x2)
      // can still satisfy the original predicate, and their span is
      // covered either way
      def lo(a: Expression, b: Expression) = bucket(Least(Seq(toLong(a), toLong(b))), width)
      def hi(a: Expression, b: Expression) = bucket(Greatest(Seq(toLong(a), toLong(b))), width)
      val lAttr = AttributeReference("__graft_bkt_l", LongType)()
      val rAttr = AttributeReference("__graft_bkt_r", LongType)()
      val newLeft = explodeTo(j.left, seqOf(lo(x1, x2), hi(x1, x2)), lAttr)
      val newRight = explodeTo(j.right, seqOf(lo(y1, y2), hi(y1, y2)), rAttr)
      // exactly-once: keep the pair only in the first bucket both spans
      // share — max of the span-lows, which overlap guarantees is in both
      val firstShared = Greatest(Seq(lo(x1, x2), lo(y1, y2)))
      val newCond = And(EqualTo(lAttr, rAttr),
        And(EqualTo(lAttr, firstShared), j.condition.get))
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}
