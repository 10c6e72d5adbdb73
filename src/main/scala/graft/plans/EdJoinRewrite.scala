package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst rewrite for the NAIVE fuzzy join: `a JOIN b ON
  * levenshtein(a.s, b.s) <= d` has no equi-condition, so Spark can
  * only plan it as a broadcast nested loop / cartesian product —
  * O(|A|·|B|) levenshtein calls. For `d <= 1` this rule rewrites the
  * join into DELETION-NEIGHBORHOOD blocking (the
  * [[graft.operators.FuzzyJoin]] fast path, FastSS/SymSpell family):
  * `ed(a,b) <= 1` exactly when the `{self} ∪ single-deletion` variant
  * sets intersect, so candidates come from ONE hash equi-join on
  * xxhash64'd variants, and the original predicate re-verifies each
  * survivor (as the THRESHOLD form of levenshtein — banded O(d·len)
  * instead of O(len²), and structurally unmatchable by this rule, so
  * predicate pushdown re-injecting the filter into the join can never
  * re-fire the rewrite: the fixed-point batch stays a fixed point).
  *
  * JOIN MULTIPLICITY is preserved exactly: a pair sharing k variants
  * would emit k rows, and two IDENTICAL input rows are two distinct
  * join matches — so each side is tagged with a per-row id before the
  * explode, and an aggregate keyed on (left id, right id) collapses
  * the per-variant duplicates without collapsing genuine duplicate
  * rows. The rewritten subtree outputs the SAME attributes (same
  * exprIds) as the original join, so everything above resolves
  * unchanged; residual conjuncts of the original condition stay in
  * the verification filter for the optimizer to push as usual.
  *
  * Scope guards: inner joins only; the levenshtein must be the 2-arg
  * form comparing one expression per side; `d ∈ {0, 1}` (two-deletion
  * neighborhoods grow O(len²) — the d >= 2 plan is left alone; use
  * [[graft.operators.FuzzyJoin.edJoin]]'s positional-gram path
  * directly). Null strings produce a null variant array, which
  * explodes to nothing — exactly the null-never-matches semantics of
  * the original predicate.
  *
  * Registered by `GraftExtensions` (injectOptimizerRule) and
  * runtime-installable via `spark.experimental.extraOptimizations`
  * (the [[TopKPerGroup]] / VTableScanRule precedent).
  */
object EdJoinRewrite extends Rule[LogicalPlan] {

  /** Split a conjunction into its conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Match `levenshtein(x, y) <= d` (or `d >= levenshtein(x, y)`)
    * with a 2-arg levenshtein and a small integer bound.
    */
  private def levBound(e: Expression): Option[(Levenshtein, Int)] = e match {
    case LessThanOrEqual(lev: Levenshtein, Literal(d: Int, IntegerType))
        if lev.threshold.isEmpty => Some((lev, d))
    case GreaterThanOrEqual(Literal(d: Int, IntegerType), lev: Levenshtein)
        if lev.threshold.isEmpty => Some((lev, d))
    case LessThan(lev: Levenshtein, Literal(d: Int, IntegerType))
        if lev.threshold.isEmpty => Some((lev, d - 1))
    case GreaterThan(Literal(d: Int, IntegerType), lev: Levenshtein)
        if lev.threshold.isEmpty => Some((lev, d - 1))
    case EqualTo(lev: Levenshtein, Literal(0, IntegerType))
        if lev.threshold.isEmpty => Some((lev, 0))
    case EqualTo(Literal(0, IntegerType), lev: Levenshtein)
        if lev.threshold.isEmpty => Some((lev, 0))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _)
        // the multiplicity-preserving dedup groups on every original
        // output attribute; a non-groupable type (MapType) there would
        // turn a valid-if-slow NLJ plan into an invalid Aggregate —
        // leave such joins alone
        if j.output.forall(a => RowOrdering.isOrderable(a.dataType)) =>
      val parts = conjuncts(cond)
      val hit = parts.iterator.flatMap { c =>
        levBound(c).flatMap { case (lev, d) =>
          if (d < 0 || d > 1) None
          else if (lev.left.references.subsetOf(left.outputSet) &&
            lev.right.references.subsetOf(right.outputSet))
            Some((c, lev.left, lev.right, d))
          else if (lev.right.references.subsetOf(left.outputSet) &&
            lev.left.references.subsetOf(right.outputSet))
            Some((c, lev.right, lev.left, d))
          else None
        }
      }.take(1).toSeq.headOption
      hit match {
        case None => j
        case Some((matched, lStr, rStr, d)) =>
          val (lGen, lId, lVh) = variantSide(left, lStr, d, "l")
          val (rGen, rId, rVh) = variantSide(right, rStr, d, "r")
          val lenWindow = LessThanOrEqual(
            new Abs(new Subtract(Length(lStr), Length(rStr))), Literal(d))
          val blocked = Join(lGen, rGen, Inner,
            Some(And(EqualTo(lVh, rVh), lenWindow)),
            org.apache.spark.sql.catalyst.plans.logical.JoinHint.NONE)
          // re-verify with the THRESHOLD levenshtein (banded, and
          // never re-matched by this rule); keep every other conjunct
          val verify = GreaterThanOrEqual(
            new Levenshtein(lStr, rStr, Literal(d)), Literal(0))
          val residual = parts.filterNot(_ eq matched)
          val filtered = Filter((residual :+ verify).reduce(And), blocked)
          val origOutput = j.output
          Project(origOutput,
            Aggregate(Seq(lId, rId) ++ origOutput, origOutput, filtered))
      }
  }

  /** One side of the blocked join: tag rows with a per-row id, then
    * explode the xxhash64'd `{self} ∪ deletions` variant set. Output
    * keeps the side's original attributes.
    */
  private def variantSide(child: LogicalPlan, str: Expression, d: Int,
      tag: String): (LogicalPlan, Attribute, Attribute) = {
    val idAlias = Alias(MonotonicallyIncreasingID(), s"__graft_edj_${tag}id")()
    val withId = Project(child.output :+ idAlias, child)
    val len = Length(str)
    val i = NamedLambdaVariable("i", IntegerType, nullable = false)
    val deletion = Concat(Seq(
      Substring(str, Literal(1), new Subtract(i, Literal(1))),
      Substring(str, new Add(i, Literal(1)), new Subtract(len, i))))
    val body = new XxHash64(Seq(If(EqualTo(i, Literal(0)), str, deletion)))
    // i = 0 keeps the string itself; i = 1..len deletes char i (the
    // d = 0 degenerate emits only the self hash)
    val upper = if (d == 0) Literal(0) else len
    // Sequence is TimeZoneAwareExpression: without a zone it reads as
    // unresolved and the optimizer's plan validation rejects the batch
    val seq = Sequence(Literal(0), upper, None,
      Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    val variants = ArrayDistinct(ArrayTransform(
      seq, LambdaFunction(body, Seq(i))))
    val vhAttr = AttributeReference(s"__graft_edj_${tag}vh", LongType,
      nullable = false)()
    val gen = Generate(Explode(variants), Nil, outer = false, None,
      Seq(vhAttr), withId)
    (gen, idAlias.toAttribute, vhAttr)
  }

  /** Idempotent runtime installation for sessions not built through
    * `GraftExtensions`.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(EdJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ EdJoinRewrite
}
