package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}

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
  * For `2 <= d <= spark.graft.edJoin.maxRewriteDist` (deletion
  * neighborhoods at depth d grow O(len^d) — useless past 1) the rule
  * instead lowers the SAME positional q-gram blocking as
  * [[graft.operators.FuzzyJoin.edJoin]]: explode positional q-grams
  * on both sides, steer each left string's `q·d + 1`-occurrence pick
  * by right-side gram frequency (rarest first — a per-string window
  * over ≤len rows, never a corpus-scale partition), meet on (gram,
  * position bucket) with the band-to-equi bucket explode, and route
  * left strings below the pick floor (`len < q·(d+1)` — every
  * occurrence destroyable by d edits) through a length-band equi-join
  * over the bounded short slice. The two branches are disjoint on the
  * left length, so the closing per-pair aggregate never conflates
  * them even though each branch assigns its per-row ids
  * independently: equal ids across branches imply equal grouped
  * attribute values, which imply equal strings, which imply one
  * branch.
  *
  * Scope guards: inner joins only; the levenshtein must be the 2-arg
  * form comparing one expression per side; `d` at most the conf cap
  * (default 4 — candidate width grows with `q·d + 1` picks × d+1
  * buckets, and past a few edits a similarity join is the better
  * tool). Null strings produce a null gram/variant array, which
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

  /** `d > this` is left to Spark's native plan. */
  val MaxDistConf = "spark.graft.edJoin.maxRewriteDist"

  /** Gram width for the d >= 2 positional-gram path. */
  val GramSizeConf = "spark.graft.edJoin.gramSize"

  private def intConf(key: String, dflt: Int): Int =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString(key, dflt.toString).toInt
    catch { case _: NumberFormatException => dflt }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _)
        // the multiplicity-preserving dedup groups on every original
        // output attribute; a non-groupable type (MapType) there would
        // turn a valid-if-slow NLJ plan into an invalid Aggregate —
        // leave such joins alone
        if j.output.forall(a => RowOrdering.isOrderable(a.dataType)) =>
      val parts = conjuncts(cond)
      val maxD = intConf(MaxDistConf, 4)
      val hit = parts.iterator.flatMap { c =>
        levBound(c).flatMap { case (lev, d) =>
          if (d < 0 || d > maxD) None
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
          val q = math.max(1, intConf(GramSizeConf, 3))
          val blocked =
            if (d <= 1) deletionBlocked(left, right, lStr, rStr, d)
            else if (d == 2) deletionGramSplit(left, right, lStr, rStr, q, j.output)
            else gramBlocked(left, right, lStr, rStr, d, q, j.output)
          val origOutput = j.output
          val (cands, lId, rId) = blocked
          // residual conjuncts go BELOW the dedup so the optimizer can
          // keep pushing them into the children as usual
          val residual = parts.filterNot(_ eq matched)
          val preFiltered =
            if (residual.isEmpty) cands else Filter(residual.reduce(And), cands)
          // dedup BEFORE the threshold-levenshtein verify (r19,
          // measured): with the verify filter below the aggregate,
          // predicate pushdown re-injects it into the candidate JOINs'
          // conditions, where it runs once per blocking-key match — up
          // to O(len) variant / q·d+1 gram duplicates per pair. The
          // filter above the aggregate must be structurally UN-pushable
          // or PushPredicateThroughNonJoin moves it straight back (it
          // references only grouping columns), so the verify is fused
          // into an If gated on the aggregate's count(1) output — a
          // non-grouping reference pushdown cannot cross, always true,
          // and unsplittable as a conjunction. Grouping stays on
          // (ids ++ payload) — ids alone would need First() payload
          // aggregates, whose string buffers forbid HashAggregate and
          // force a full candidate SORT (measured slower).
          val cntAlias = Alias(
            Count(Seq(Literal(1))).toAggregateExpression(), "__graft_edj_cnt")()
          val dedup = Aggregate(Seq(lId, rId) ++ origOutput,
            origOutput :+ cntAlias, preFiltered)
          // re-verify with the THRESHOLD levenshtein (banded, and never
          // re-matched by this rule — the fixed-point batch stays a
          // fixed point)
          val verify = GreaterThanOrEqual(
            new Levenshtein(lStr, rStr, Literal(d)), Literal(0))
          val guarded = If(
            GreaterThanOrEqual(cntAlias.toAttribute, Literal(1L)),
            verify, Literal(false))
          // output attributes (same exprIds) pass through the grouping
          // untouched, so everything above the join resolves unchanged
          Project(origOutput, Filter(guarded, dedup))
      }
  }

  /** d <= 1 candidate generation: the deletion-neighborhood equi-join.
    * Returns (plan, left row id, right row id); the plan outputs both
    * children's original attributes plus the ids.
    */
  private def deletionBlocked(left: LogicalPlan, right: LogicalPlan,
      lStr: Expression, rStr: Expression, d: Int)
      : (LogicalPlan, Attribute, Attribute) = {
    val (lGen, lId, lVh) = variantSide(left, lStr, d, "l")
    val (rGen, rId, rVh) = variantSide(right, rStr, d, "r")
    val lenWindow = LessThanOrEqual(
      new Abs(new Subtract(Length(lStr), Length(rStr))), Literal(d))
    // the exploded variant sides are never broadcast-sized (Generate's
    // size estimate understates them ~len²/2×), and per-task
    // deserialization of a multi-million-row broadcast table dominates
    // the probe stage — pin the strategy to a shuffled hash join
    val joined = Join(lGen, rGen, Inner,
      Some(And(EqualTo(lVh, rVh), lenWindow)), shuffleHashRight)
    (joined, lId, rId)
  }

  /** SHUFFLE_HASH on the right (build) side — the exploded sides of
    * the candidate joins must not plan as a statically-missized
    * broadcast.
    */
  private def shuffleHashRight =
    org.apache.spark.sql.catalyst.plans.logical.JoinHint(None,
      Some(org.apache.spark.sql.catalyst.plans.logical.HintInfo(
        strategy = Some(org.apache.spark.sql.catalyst.plans.logical.SHUFFLE_HASH))))

  /** Round-robin pre-split before an O(len)–O(len²) explode: the
    * scan's partitioning is sized for the RAW bytes (often one task
    * for a dimension-sized input), so the expensive stage undersplits
    * without it.
    */
  private def presplit(child: LogicalPlan): LogicalPlan =
    Repartition(org.apache.spark.sql.internal.SQLConf.get.numShufflePartitions,
      shuffle = true, child)

  /** d = 2 candidate generation — [[graft.operators.FuzzyJoin.edJoin]]'s
    * regime split lowered to logical nodes: left strings below
    * [[graft.operators.FuzzyJoin.DeletionMaxLen]] block by DEPTH-2
    * deletion neighborhoods (vocabulary-immune — the gram path floors
    * at n²/|vocab| candidates on repetitive short-string corpora),
    * longer ones by positional grams with the pick floor raised to the
    * split point. Branches are disjoint on the left length, so the
    * closing per-pair aggregate never conflates their independently
    * assigned row ids; both shape to ONE (lid, rid) attribute pair via
    * explicit-exprId aliases so the union's head ids cover both.
    */
  private def deletionGramSplit(left: LogicalPlan, right: LogicalPlan,
      lStr: Expression, rStr: Expression, q: Int,
      origOutput: Seq[Attribute]): (LogicalPlan, Attribute, Attribute) = {
    // the split must sit AT OR ABOVE the gram pick floor q·(d+1):
    // with gramSize >= 11 (3q > DeletionMaxLen) a left string in
    // [DeletionMaxLen, 3q) has too few occurrences for the pick
    // guarantee, so the deletion regime widens to cover it — the same
    // coverage rule as FuzzyJoin.edJoin's d = 2 branch
    val s = math.max(graft.operators.FuzzyJoin.DeletionMaxLen, q * 3)
    val (delPlan, dLid, dRid) = deletionBlocked(
      Filter(LessThan(Length(lStr), Literal(s)), left),
      Filter(LessThan(Length(rStr), Literal(s + 2)), right), lStr, rStr, 2)
    val (gramPlan, gLid, gRid) = gramBlocked(left, right, lStr, rStr, 2, q,
      origOutput, aFloor0 = s, bandBranch = false)
    val lIdU = AttributeReference("__graft_edj_ulid", LongType, nullable = false)()
    val rIdU = AttributeReference("__graft_edj_urid", LongType, nullable = false)()
    def shaped(p: LogicalPlan, lid: Attribute, rid: Attribute): LogicalPlan =
      Project(Seq(
        Alias(lid, lIdU.name)(exprId = lIdU.exprId),
        Alias(rid, rIdU.name)(exprId = rIdU.exprId)) ++ origOutput, p)
    (Union(Seq(shaped(delPlan, dLid, dRid), shaped(gramPlan, gLid, gRid))),
      lIdU, rIdU)
  }

  /** d >= 2 candidate generation — the positional q-gram blocking of
    * [[graft.operators.FuzzyJoin.edJoin]] lowered to logical nodes.
    * Union of two branches, disjoint on the left string's length:
    * gram branch (`len >= q·(d+1)`, the pick guarantee's floor) and
    * length-band branch (below it). Output of both branches is
    * `(lId, rId) ++ origOutput`, exprIds preserved.
    *
    * The right subtree appears twice (gram-frequency aggregate inside
    * the left side's pick, and the occurrence table on the right side
    * of the candidate join), as does each child across the two union
    * branches — the aggregate's output is freshly aliased so no JOIN
    * in the produced plan has overlapping output sets; interior
    * duplication binds per-subtree at execution (the self-union
    * shape).
    */
  private def gramBlocked(left: LogicalPlan, right: LogicalPlan,
      lStr: Expression, rStr: Expression, d: Int, q: Int,
      origOutput: Seq[Attribute], aFloor0: Int = -1,
      bandBranch: Boolean = true): (LogicalPlan, Attribute, Attribute) = {
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    val pickLen = q * d + 1
    // the pick guarantee's floor; callers may raise it (the d = 2
    // deletion regime owns everything below DeletionMaxLen)
    val gramFloor = math.max(q * (d + 1), aFloor0)
    val w = d + 1 // position-bucket width

    val lIdAlias = Alias(MonotonicallyIncreasingID(), "__graft_edj_lid")()
    val rIdAlias = Alias(MonotonicallyIncreasingID(), "__graft_edj_rid")()
    // LEFT side: tag first, then HASH-partition by the row id (instead
    // of the round-robin pre-split) — the same explode-parallelizing
    // spread (ids are unique), but the exchange moves the RAW tagged
    // strings (|L| rows) and establishes exactly the clustering the
    // pick Window below requires, so the window's sort runs locally
    // instead of re-shuffling the O(len)×-exploded occurrence rows
    // with their payload columns (the plan's single largest exchange
    // before r19 — guide §2.4 "two operations keyed the same way share
    // one exchange")
    val lTag = RepartitionByExpression(
      Seq(lIdAlias.toAttribute),
      Project(left.output :+ lIdAlias, left),
      Some(org.apache.spark.sql.internal.SQLConf.get.numShufflePartitions))
    val rTag = Project(right.output :+ rIdAlias, presplit(right))
    val lId = lIdAlias.toAttribute
    val rId = rIdAlias.toAttribute

    // positional q-gram occurrences of one tagged side: rows with
    // len >= lenFloor explode to (…, gram, pos)
    def occurrences(tagged: LogicalPlan, str: Expression, lenFloor: Int,
        tag: String): (LogicalPlan, Attribute, Attribute) = {
      val len = Length(str)
      val i = NamedLambdaVariable("i", IntegerType, nullable = false)
      val gs = CreateNamedStruct(Seq(
        Literal("g"), Substring(str, i, Literal(q)), Literal("p"), i))
      val seq = Sequence(Literal(1), new Subtract(len, Literal(q - 1)), None, tz)
      val arr = ArrayTransform(seq, LambdaFunction(gs, Seq(i)))
      val occAttr = AttributeReference(s"__graft_edj_${tag}occ",
        gs.dataType.asInstanceOf[StructType], nullable = false)()
      val gen = Generate(Explode(arr), Nil, outer = false, None, Seq(occAttr),
        Filter(GreaterThanOrEqual(len, Literal(lenFloor)), tagged))
      val gAl = Alias(GetStructField(occAttr, 0, Some("g")), s"__graft_edj_${tag}g")()
      val pAl = Alias(GetStructField(occAttr, 1, Some("p")), s"__graft_edj_${tag}p")()
      (Project(tagged.output ++ Seq(gAl, pAl), gen),
        gAl.toAttribute, pAl.toAttribute)
    }

    val (lOcc, lG, lP) = occurrences(lTag, lStr, gramFloor, "l")
    // any b paired with a gram-branch a has len >= gramFloor - d —
    // applied as the right occurrence floor so a corpus with no
    // gram-regime strings costs two filtered scans, not an occurrence
    // explode + frequency aggregate (frequencies steer a free choice,
    // so shrinking their population is lossless)
    val (rOcc, rG, rP) = occurrences(rTag, rStr,
      math.max(q, gramFloor - d), "r")

    def bucket(posExpr: Expression): Expression =
      Floor(Divide(Cast(posExpr, DoubleType), Literal(w.toDouble)))

    // right-side gram frequencies steer the left pick (rarest-in-b
    // first; absent-in-b sorts ahead via the outer join's null→0) —
    // freshly aliased so the pick join's sides have disjoint outputs
    val dfGramAlias = Alias(rG, "__graft_edj_fg")()
    val dfCntAlias = Alias(Count(Seq(Literal(1))).toAggregateExpression(),
      "__graft_edj_df")()
    val freq = Aggregate(Seq(rG), Seq(dfGramAlias, dfCntAlias), rOcc)
    val pickJoin = Join(lOcc, freq, org.apache.spark.sql.catalyst.plans.LeftOuter,
      Some(EqualTo(lG, dfGramAlias.toAttribute)),
      org.apache.spark.sql.catalyst.plans.logical.JoinHint.NONE)
    val gdf = Coalesce(Seq(dfCntAlias.toAttribute, Literal(0L)))
    val order = Seq(
      SortOrder(gdf, Ascending), SortOrder(lG, Ascending), SortOrder(lP, Ascending))
    val rankAlias = Alias(WindowExpression(RowNumber(),
      WindowSpecDefinition(Seq(lId), order,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
      "__graft_edj_rk")()
    val picked = Filter(LessThanOrEqual(rankAlias.toAttribute, Literal(pickLen)),
      Window(Seq(rankAlias), Seq(lId), order, pickJoin))
    // each picked occurrence enumerates every bucket its ±d window can
    // touch — the band-join-to-equi-join trick
    val lPb = AttributeReference("__graft_edj_lpb", LongType, nullable = false)()
    val lKeys = Generate(Explode(Sequence(
        bucket(new Subtract(lP, Literal(d))), bucket(new Add(lP, Literal(d))),
        None, tz)),
      Nil, outer = false, None, Seq(lPb), picked)
    val rPbAlias = Alias(bucket(rP), "__graft_edj_rpb")()
    val rKeys = Project(rTag.output ++ Seq(rG, rPbAlias), rOcc)
    val lenWindow = LessThanOrEqual(
      new Abs(new Subtract(Length(lStr), Length(rStr))), Literal(d))
    val gramJoin = Join(lKeys, rKeys, Inner,
      Some(And(And(EqualTo(lG, rG), EqualTo(lPb, rPbAlias.toAttribute)),
        lenWindow)), shuffleHashRight)

    // below-pick-floor branch: partners sit within ±d of the left
    // length — the length window IS the equi-key; each pair meets on
    // exactly one key (the right length)
    val lLk = AttributeReference("__graft_edj_lk", IntegerType, nullable = false)()
    val lShort = Generate(Explode(Sequence(
        new Subtract(Length(lStr), Literal(d)), new Add(Length(lStr), Literal(d)),
        None, tz)),
      Nil, outer = false, None, Seq(lLk),
      Filter(LessThan(Length(lStr), Literal(gramFloor)), lTag))
    val shortJoin = Join(lShort,
      Filter(LessThan(Length(rStr), Literal(gramFloor + d)), rTag), Inner,
      Some(EqualTo(lLk, Length(rStr))),
      org.apache.spark.sql.catalyst.plans.logical.JoinHint.NONE)

    val cols: Seq[NamedExpression] = Seq(lId, rId) ++ origOutput
    val out =
      if (bandBranch) Union(Seq(Project(cols, gramJoin), Project(cols, shortJoin)))
      else Project(cols, gramJoin)
    (out, lId, rId)
  }

  /** One side of the blocked join: tag rows with a per-row id, then
    * explode the xxhash64'd `{self} ∪ deletions` variant set. Output
    * keeps the side's original attributes.
    */
  private def variantSide(child: LogicalPlan, str: Expression, d: Int,
      tag: String): (LogicalPlan, Attribute, Attribute) = {
    val idAlias = Alias(MonotonicallyIncreasingID(), s"__graft_edj_${tag}id")()
    val withId = Project(child.output :+ idAlias, presplit(child))
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
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    val seq = Sequence(Literal(0), upper, None, tz)
    val depth1 = ArrayTransform(seq, LambdaFunction(body, Seq(i)))
    // depth 2 (d = 2): delete chars i < j — O(len²/2) hashes; callers
    // bound the string length (FuzzyJoin.DeletionMaxLen), and
    // sequence(x, y) DESCENDS when x > y, so sub-2-char strings guard
    // to an empty depth-2 set
    val all =
      if (d < 2) depth1
      else {
        val i2 = NamedLambdaVariable("i2", IntegerType, nullable = false)
        val j2 = NamedLambdaVariable("j2", IntegerType, nullable = false)
        val del2 = new XxHash64(Seq(Concat(Seq(
          Substring(str, Literal(1), new Subtract(i2, Literal(1))),
          Substring(str, new Add(i2, Literal(1)),
            new Subtract(new Subtract(j2, i2), Literal(1))),
          Substring(str, new Add(j2, Literal(1)), new Subtract(len, j2))))))
        val inner = ArrayTransform(
          Sequence(new Add(i2, Literal(1)), len, None, tz),
          LambdaFunction(del2, Seq(j2)))
        val nested = Flatten(ArrayTransform(
          Sequence(Literal(1), new Subtract(len, Literal(1)), None, tz),
          LambdaFunction(inner, Seq(i2))))
        Concat(Seq(depth1,
          If(GreaterThanOrEqual(len, Literal(2)), nested,
            Literal.create(Array.empty[Long],
              org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))))
      }
    val variants = ArrayDistinct(all)
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
