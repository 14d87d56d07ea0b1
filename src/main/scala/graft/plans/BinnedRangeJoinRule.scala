package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a pure point-in-interval inner join
  * (`l.p >= r.s AND l.p <= r.e`, no equi-key) into the binned equi-join
  * shape of [[graft.operators.IntervalJoin]] — transparently, at plan
  * time.
  *
  * Without an equi-key Catalyst plans a (broadcast) nested-loop join:
  * O(|left| × |right|) comparisons and a broadcast-size ceiling — the
  * join that works in a notebook and dies on a cluster. This rule adds
  * one: the point side is extended with `floor(p/w)`, the interval side
  * is exploded to every width-`w` bin it overlaps, the join runs on the
  * bin key, and the original predicate stays as the residual filter (so
  * the rewrite is semantics-preserving for ANY bin width — each
  * qualifying pair meets in exactly the point's bin, no duplicates).
  *
  * Opt-in: set `spark.graft.binnedRangeJoin.width` to a positive bin
  * width (in the join columns' units). Off by default — bin width is a
  * physical tuning decision (pick it near the typical interval span),
  * and a silent default would surprise plans that WANT a broadcast
  * nested loop for a tiny build side. This is the (c) extension path the
  * engine reserves for semantics Catalyst's built-ins cannot express:
  * activated via `spark.sql.extensions=graft.GraftExtensions` or
  * `spark.experimental.extraOptimizations`.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.binnedRangeJoin.width"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(WidthConf, "0").toLong
    if (w <= 0) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        // either orientation: points may sit on the left or the right
        extractRange(cond, left, right)
          .map { case (p, s, e) =>
            rewrite(left, right, p, s, e, cond, w, hint, pointsOnLeft = true) }
          .orElse(extractRange(cond, right, left).map { case (p, s, e) =>
            rewrite(left, right, p, s, e, cond, w, hint, pointsOnLeft = false) })
          .getOrElse(j)
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  private def numeric(e: Expression): Boolean = e.dataType match {
    case LongType | org.apache.spark.sql.types.IntegerType
       | org.apache.spark.sql.types.ShortType | DoubleType
       | org.apache.spark.sql.types.FloatType => true
    case _ => false
  }

  /** Match `p BETWEEN s AND e` where p is computed from the left side
    * only and s/e from the right side only: exactly two conjuncts, a
    * lower and an upper bound on the same point expression.
    */
  private def extractRange(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet) && e.deterministic
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet) && e.deterministic

    conjuncts(cond) match {
      case Seq(c1, c2) =>
        val lower = Seq(c1, c2).collectFirst {
          case GreaterThanOrEqual(p, s) if fromLeft(p) && fromRight(s) => (p, s)
          case LessThanOrEqual(s, p) if fromLeft(p) && fromRight(s)    => (p, s)
        }
        val upper = Seq(c1, c2).collectFirst {
          case LessThanOrEqual(p, e) if fromLeft(p) && fromRight(e)    => (p, e)
          case GreaterThanOrEqual(e, p) if fromLeft(p) && fromRight(e) => (p, e)
        }
        (lower, upper) match {
          case (Some((p1, s)), Some((p2, e)))
              if p1.semanticEquals(p2) && numeric(p1) && numeric(s) && numeric(e) =>
            Some((p1, s, e))
          case _ => None
        }
      case _ => None
    }
  }

  private def binOf(x: Expression, w: Long): Expression =
    Floor(Divide(Cast(x, DoubleType), Literal(w.toDouble))) // -> LongType

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
      p: Expression, s: Expression, e: Expression,
      cond: Expression, w: Long, hint: JoinHint,
      pointsOnLeft: Boolean): LogicalPlan = {
    val pBin = Alias(binOf(p, w), "_graft_bin_p")()
    val bins = Sequence(binOf(s, w), binOf(e, w), None,
      Some(conf.sessionLocalTimeZone))
    val iBin = AttributeReference("_graft_bin_i", LongType, nullable = true)()
    def project(side: LogicalPlan) = Project(side.output :+ pBin, side)
    def generate(side: LogicalPlan) = Generate(Explode(bins),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(iBin), child = side)
    val (newLeft, newRight) =
      if (pointsOnLeft) (project(left), generate(right))
      else (generate(left), project(right))
    val joined = Join(newLeft, newRight, Inner,
      Some(And(EqualTo(pBin.toAttribute, iBin), cond)), hint)
    // drop the bin columns so downstream operators see the original shape
    Project(left.output ++ right.output, joined)
  }
}
