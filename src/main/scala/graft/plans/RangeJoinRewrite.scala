package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst rewrite for the NAIVE range (interval) join: `a JOIN b ON
  * a.x BETWEEN b.lo AND b.hi` carries no equi-condition, so Spark
  * plans a broadcast nested loop / cartesian product — and even when
  * another equi-key is present, a skewed key degenerates to scanning
  * every interval per point. This rule BINS the range dimension
  * (Databricks' RANGE_JOIN-hint recipe, here driven by one session
  * conf): the point side computes `floor(x / binSize)`, the interval
  * side EXPLODES one row per bin in `[floor(lo/binSize),
  * floor(hi/binSize)]`, the join runs as a hash/SMJ equi-join on the
  * bin id, and the ORIGINAL condition re-verifies every candidate.
  *
  * LOSSLESS and multiplicity-exact by construction: casting to double
  * is monotone, so `lo <= x <= hi` implies x's bin lies inside the
  * interval's bin range (no true pair is lost), and a (point,
  * interval) pair meets on EXACTLY one bin — the point's — so no
  * dedup is needed and join multiplicity is untouched. Candidate
  * volume is |intervals| · (span/binSize + 1) + collisions, never
  * |A|·|B|.
  *
  * Scope guards: inner joins; both bounds on the SAME point
  * expression (by semantic equality) with the point fully on one side
  * and both bounds fully on the other; numeric / timestamp / date
  * dimensions (cast-to-double monotone). The rule only fires when
  * `spark.graft.rangeJoin.binSize` is set to a positive number — bin
  * width is a data decision (≈ the typical interval span; Databricks
  * makes the user say it in a hint for the same reason), so there is
  * no silent heuristic. Fixpoint-safe: the rewritten join's condition
  * keeps the original bounds, so a `__graft_rjb` bin-key equality in
  * the condition marks an already-rewritten join and the rule skips
  * it.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val BinSizeConf = "spark.graft.rangeJoin.binSize"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  private def binnable(dt: DataType): Boolean = dt match {
    // types with a monotone cast to double (DateType has none)
    case _: NumericType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binSize = org.apache.spark.sql.internal.SQLConf.get
      .getConfString(BinSizeConf, "")
    val w = try binSize.toDouble catch { case _: NumberFormatException => 0.0 }
    if (!(w > 0)) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if !conjuncts(cond).exists {
            case EqualTo(a: AttributeReference, _)
                if a.name.startsWith("__graft_rjb") => true
            case _ => false
          } =>
        rewrite(j, left, right, cond, w)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, w: Double): LogicalPlan = {
    val cs = conjuncts(cond)
    def side(e: Expression): Option[Int] =
      if (e.references.isEmpty) None // a literal bound can't place the interval side
      else if (e.references.subsetOf(left.outputSet)) Some(0)
      else if (e.references.subsetOf(right.outputSet)) Some(1)
      else None
    // each inequality reads both ways: a >= b is "point a, lower bound
    // b" and "point b, upper bound a"
    val lowers = scala.collection.mutable.ArrayBuffer.empty[(Expression, Expression)]
    val uppers = scala.collection.mutable.ArrayBuffer.empty[(Expression, Expression)]
    cs.foreach {
      case GreaterThanOrEqual(a, b) => lowers += ((a, b)); uppers += ((b, a))
      case GreaterThan(a, b)        => lowers += ((a, b)); uppers += ((b, a))
      case LessThanOrEqual(a, b)    => uppers += ((a, b)); lowers += ((b, a))
      case LessThan(a, b)           => uppers += ((a, b)); lowers += ((b, a))
      case _                        =>
    }
    val hit = (for {
      (xl, lo) <- lowers.iterator
      (xu, hi) <- uppers.iterator
      if xl.semanticEquals(xu) && binnable(xl.dataType) &&
        binnable(lo.dataType) && binnable(hi.dataType)
      ps <- side(xl)
      ls <- side(lo)
      hs <- side(hi)
      if ls == hs && ls != ps
    } yield (xl, lo, hi, ps)).take(1).toSeq.headOption
    hit match {
      case None => j
      case Some((x, lo, hi, pointSide)) =>
        def bin(e: Expression): Expression =
          Floor(Divide(Cast(e, DoubleType), Literal(w)))
        val pBin = Alias(bin(x), "__graft_rjb_p")()
        val (pointChild, intervalChild) =
          if (pointSide == 0) (left, right) else (right, left)
        val pointPlan = Project(pointChild.output :+ pBin, pointChild)
        val iAttr = AttributeReference("__graft_rjb_i", LongType,
          nullable = false)()
        val seq = Sequence(bin(lo), bin(hi), None,
          Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
        val intervalPlan = Generate(Explode(seq), Nil, outer = false, None,
          Seq(iAttr), intervalChild)
        val binEq = EqualTo(pBin.toAttribute, iAttr)
        val (newLeft, newRight) =
          if (pointSide == 0) (pointPlan, intervalPlan)
          else (intervalPlan, pointPlan)
        Project(j.output,
          Join(newLeft, newRight, Inner, Some(And(binEq, cond)),
            JoinHint.NONE))
    }
  }

  /** Idempotent runtime installation for sessions not built through
    * `GraftExtensions`.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
}
