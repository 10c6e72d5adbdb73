package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LeafNode, LogicalPlan, OneRowRelation, Project, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

import graft.sources.VersionedTable

/** Lazy, optimizer-prunable scan of a [[graft.sources.VersionedTable]].
  *
  * `VersionedTable.readWhere` gives file-level data skipping, but only
  * when the CALLER routes the predicate through it. This node makes
  * skipping automatic for declarative consumers: `vt.scan()` returns a
  * DataFrame whose leaf is a [[VTableRelation]] marker, and the
  * injected [[VTableScanRule]] collapses `Filter(cond, marker)` — the
  * shape Catalyst's own predicate pushdown produces for ANY filter the
  * user wrote anywhere above the scan, including through temp views
  * and SQL — into the stats+bloom-pruned parquet scan of exactly the
  * files `cond` might touch. A `SELECT ... WHERE k = 42` over a
  * 100 TB range-clustered table then opens O(matching) files with no
  * API cooperation from the query author, which is the property that
  * makes the table usable from plain SQL dashboards.
  *
  * Division of labor (mirrors the public Delta-on-Spark recipe,
  * Armbrust '20 VLDB: a logical marker + a pre-planning file-pruning
  * step):
  *   - [[VTableRelation]]: resolved leaf carrying the committed
  *     schema as fixed output attributes, a pinned version (snapshot
  *     semantics survive concurrent commits), and byte-size stats so
  *     join-side broadcast estimation sees the real table size.
  *   - [[VTableScanRule]]: rewrites Filter-over-marker. Registered
  *     ONLY via the runtime `spark.experimental.extraOptimizations`
  *     hook (installed by `scan()` on first use), which runs in the
  *     "User Provided Optimizers" batch at the tail of the optimizer,
  *     when filter placement is final. GraftExtensions deliberately
  *     does NOT `injectOptimizerRule` it: in the operator-optimization
  *     fixed point an early iteration would expand the marker before
  *     constraint inference and subquery rewrites have contributed
  *     their filters, forfeiting the pruning they buy (see the
  *     GraftFunctions.install comment). Only the Filter-adjacent
  *     shape rewrites — a bare marker is left alone so nothing can
  *     expand it prematurely.
  *   - [[VTableScanStrategy]]: physical-planning fallback for markers
  *     no filter ever reached — expands to the full snapshot scan.
  *
  * The rewrite re-applies the FULL predicate on the pruned scan (the
  * Filter node stays, feeding parquet row-group pushdown), so skipping
  * only ever removes provably-dead IO — result equality with
  * `read(v).where(cond)` is the invariant VTableScanSpec asserts.
  */
case class VTableRelation(dir: String, version: Int, sizeBytes: BigInt,
    rows: Option[BigInt], bounds: Map[String, (Any, Any)],
    nonNulls: Map[String, Long], ndv: Map[String, Long],
    histograms: Map[String, org.apache.spark.sql.catalyst.plans.logical.Histogram],
    output: Seq[Attribute])
  extends LeafNode with MultiInstanceRelation {
  override def newInstance(): VTableRelation = copy(output = output.map(_.newInstance()))

  /** In the column's Catalyst-internal representation (ColumnStat's
    * contract — estimation math reads these typed).
    */
  private def internal(a: Attribute, v: Any): Any = {
    import org.apache.spark.sql.types._
    a.dataType match {
      case LongType    => v.asInstanceOf[Long]
      case IntegerType => v.asInstanceOf[Long].toInt
      case ShortType   => v.asInstanceOf[Long].toShort
      case ByteType    => v.asInstanceOf[Long].toByte
      case DoubleType  => v.asInstanceOf[Double]
      case FloatType   => v.asInstanceOf[Double].toFloat
      case _           => v
    }
  }

  /** CBO-grade statistics straight from the commit log: exact row
    * count, per-column min/max and null counts from the manifest,
    * approximate distinct counts from the NDV sidecars, and
    * equi-height HISTOGRAMS from the KLL sketch sidecars — join
    * reorder and selectivity estimation get ANALYZE-quality numbers
    * (including skew-aware range selectivity) without an ANALYZE ever
    * running.
    */
  override def computeStats(): Statistics = {
    import org.apache.spark.sql.catalyst.expressions.AttributeMap
    import org.apache.spark.sql.catalyst.plans.logical.ColumnStat
    val colStats = output.flatMap { a =>
      val b = bounds.get(a.name)
      val nulls = for { r <- rows; nn <- nonNulls.get(a.name) }
        yield r - BigInt(nn)
      val dc = ndv.get(a.name).map(BigInt(_))
      val hg = histograms.get(a.name)
      if (b.isEmpty && nulls.isEmpty && dc.isEmpty && hg.isEmpty) None
      else Some(a -> ColumnStat(
        distinctCount = dc,
        min = b.map(p => internal(a, p._1)),
        max = b.map(p => internal(a, p._2)),
        nullCount = nulls,
        // equi-height histogram merged from the KLL sketch sidecars:
        // range/equality selectivity sees the actual value
        // distribution, not a uniform assumption over [min, max]
        histogram = hg))
    }
    Statistics(sizeInBytes = sizeBytes, rowCount = rows,
      attributeStats = AttributeMap(colStats))
  }

  override def simpleString(maxFields: Int): String =
    s"VTableRelation $dir v$version"
}

object VTableScan {

  /** Expand a marker to its (optionally pruned) parquet scan, output
    * re-aliased to the marker's exprIds so every reference above the
    * rewrite keeps binding. `cond`'s marker attributes are remapped to
    * the scan's — only attributes in the marker's own outputSet, so
    * same-named columns inside subquery plans are never touched.
    * `keep` narrows the restored output to the attributes the parent
    * actually references: the alias Project is what physical planning
    * reads column needs from, so restoring all columns under a
    * `SELECT count(*) WHERE k = …` would drag the full row width
    * through the parquet scan.
    *
    * `pruneOnly` joins `cond` for FILE pruning but is never
    * re-applied to rows — for conditions some enclosing operator
    * already enforces (DFP's derived IN-set: the join's own equality
    * subsumes it, and re-evaluating a 10k-literal IN per fact row
    * would cost more than the skipped IO saved).
    */
  private[plans] def expand(spark: SparkSession, r: VTableRelation,
      cond: Option[Expression],
      keep: Option[Seq[Attribute]] = None,
      pruneOnly: Option[Expression] = None): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.And
    val t = VersionedTable(spark, r.dir)
    val pruneCond = (cond, pruneOnly) match {
      case (Some(c), Some(p)) => Some(And(c, p))
      case (c, p)             => c.orElse(p)
    }
    val base = pruneCond match {
      case Some(c) => t.prunedScan(c, r.version)
      case None    => t.read(r.version)
    }
    val plan = base.queryExecution.analyzed
    val byName = plan.output.map(a => a.name -> a).toMap
    def scanAttr(o: Attribute): Attribute =
      byName.getOrElse(o.name, throw new IllegalStateException(
        s"vtable scan of ${r.dir} lost column `${o.name}` — committed schema drifted"))
    val filtered = cond match {
      case Some(c) =>
        val remapped = c.transform {
          case a: AttributeReference if r.outputSet.contains(a) => scanAttr(a)
        }
        Filter(remapped, plan)
      case None => plan
    }
    val kept0 = keep.getOrElse(r.output)
    // zero-column projections are legal but needlessly exotic — pin one
    val kept = if (kept0.nonEmpty) kept0 else r.output.take(1)
    val restored: Seq[NamedExpression] = kept.map { o =>
      Alias(scanAttr(o), o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }
    Project(restored, filtered)
  }

  /** The marker attributes a parent's expressions reference —
    * exprId-based membership (AttributeSet), NOT object equality: a
    * temp-view path decorates references with qualifiers that would
    * fail a case-class comparison against the marker's bare output.
    */
  private[plans] def needed(r: VTableRelation, exprs: Seq[Expression]): Seq[Attribute] = {
    val refs = org.apache.spark.sql.catalyst.expressions.AttributeSet(
      exprs.flatMap(_.references))
    r.output.filter(refs.contains)
  }
}

/** Collapses `Filter(cond, VTableRelation)` into the pruned scan; see
  * [[VTableRelation]]. Non-deterministic conditions pass through (they
  * must see every row exactly once, in snapshot order — the fallback
  * strategy scans the full snapshot beneath them).
  */
case class VTableScanRule(spark: SparkSession) extends Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  /** Dynamic file pruning for `marker ⋈ small-dim` inner joins (the
    * Delta-style DFP move): when one side is a lazy vtable scan and
    * the other a small deterministic plan, execute the dim's key set
    * (one tiny job — the dim is under the broadcast threshold and
    * will be fully materialized for the join anyway) and expand the
    * marker through the stats machinery with a derived constraint:
    * the literal `key IN (…)` when the dim holds at most
    * [[graft.sources.VersionedTable.MaxBloomProbeKeys]] distinct keys
    * (point-exact skipping, and Bloom sidecars prune too — a sparse
    * key set over a clustered fact opens exactly the admitting
    * files where a [min,max] band would admit nearly everything), or
    * the `key BETWEEN lo AND hi` band above that. Sound because both
    * are NECESSARY conditions for any inner-join match (equality
    * never matches outside the dim's own key set, and neither side
    * matches nulls); the full join condition still evaluates above.
    *
    * The dim must additionally be SNAPSHOT-STABLE: the key-set job
    * runs at optimization time and the join re-executes the dim, so
    * a source that can return different rows across the two
    * executions (JDBC, an unknown V2 source) could surface keys at
    * join time that fall outside the earlier set — matching fact
    * rows silently pruned. Only leaves whose contents are pinned for
    * the query's lifetime qualify: file relations (pinned listing),
    * LocalRelation / OneRowRelation / Range (literal rows), and
    * vtable markers (pinned version). Note the derivation job also
    * runs when a caller merely optimizes the plan (`explain()`), the
    * price of optimizer-time derivation; it is bounded by the
    * broadcast threshold.
    */
  private def dynamicPrune(j: Join): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
    val cond = j.condition.getOrElse(return None)
    // the marker may sit under a filter and/or the narrow Project
    // column pruning inserts (the RewriteSubquery-produced semi-join
    // shape); `keep` preserves that narrowing through the rewrite so
    // the replaced side's output is unchanged
    def markerOf(p: LogicalPlan)
        : Option[(VTableRelation, Option[Expression], Option[Seq[Attribute]])] = p match {
      case r: VTableRelation => Some((r, None, None))
      case Filter(c, r: VTableRelation) if c.deterministic => Some((r, Some(c), None))
      case Project(ps, r: VTableRelation)
          if ps.forall(_.isInstanceOf[Attribute]) =>
        Some((r, None, Some(ps.map(_.asInstanceOf[Attribute]))))
      case Project(ps, Filter(c, r: VTableRelation))
          if c.deterministic && ps.forall(_.isInstanceOf[Attribute]) =>
        Some((r, Some(c), Some(ps.map(_.asInstanceOf[Attribute]))))
      case _ => None
    }
    // Inner: either side prunes. LeftSemi (EXISTS / IN): only the LEFT
    // is output — its rows must match, so left-side pruning is sound;
    // the right is the probe set and stays whole.
    val (marker, extra, keep, dim, markerLeft) =
      (j.joinType, markerOf(j.left), markerOf(j.right)) match {
        case (Inner, Some((r, e, k)), None)    => (r, e, k, j.right, true)
        case (Inner, None, Some((r, e, k)))    => (r, e, k, j.left, false)
        case (LeftSemi, Some((r, e, k)), _)    => (r, e, k, j.right, true)
        case _ => return None
      }
    // the dim must be small (bounded double-execution) and fully
    // deterministic (a rand-filtered dim would give bounds from a
    // DIFFERENT draw than the join's own execution — unsound). A
    // subquery ANYWHERE in the dim also refuses: an expression's
    // deterministic flag doesn't look inside subquery plans, so a
    // scalar subquery over rand() would pass the flag check while
    // still drawing differently across the two executions.
    val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    if (threshold <= 0 || dim.stats.sizeInBytes > threshold) return None
    val impure = dim.exists(_.expressions.exists(e =>
      !e.deterministic || e.exists {
        case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => true
        case _ => false
      }))
    if (impure) return None
    val pair = splitConjunctivePredicates(cond).collectFirst {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          a: AttributeReference, b: AttributeReference)
          if marker.outputSet.contains(a) && dim.outputSet.contains(b) => (a, b)
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          b: AttributeReference, a: AttributeReference)
          if marker.outputSet.contains(a) && dim.outputSet.contains(b) => (a, b)
    }
    val (mk, dk) = pair.getOrElse(return None)
    val stable = dim.collectLeaves().forall {
      case _: VTableRelation => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _: OneRowRelation => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Range => true
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.isInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      case _ => false // JDBC / V2 / anything re-readable: refuse (see scaladoc)
    }
    if (!stable) return None
    // one tiny job: the dim's distinct keys, capped. A complete set at
    // or under the cap pushes the literal IN; a truncated one falls
    // back to the [min,max] band (second tiny job, bounded dim).
    val cap = graft.sources.VersionedTable.MaxBloomProbeKeys
    val keyRows = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      Project(Seq(dk), dim)).distinct().limit(cap + 1).collect()
    val keys = keyRows.iterator.map(_.get(0)).filter(_ != null).toSeq
    if (keys.isEmpty) return None // empty/all-null dim: no gain
    import org.apache.spark.sql.catalyst.expressions.{And, GreaterThanOrEqual, In, LessThanOrEqual}
    // complete key set → literal IN, for FILE pruning only (the join's
    // own equality subsumes it row-wise; re-applying a wide IN per
    // fact row would undo the win). Truncated → [min,max] band, which
    // IS re-applied (cheap, and it feeds parquet row-group pushdown).
    val (derived, rowApplied) =
      if (keyRows.length <= cap)
        (In(mk, keys.map(k => Literal.create(k, mk.dataType))), false)
      else {
        val boundsRow = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
          Aggregate(Nil, Seq(
            Alias(AggregateExpression(Min(dk), Complete, isDistinct = false, None), "lo")(),
            Alias(AggregateExpression(Max(dk), Complete, isDistinct = false, None), "hi")()),
            dim)).head()
        (And(
          GreaterThanOrEqual(mk, Literal.create(boundsRow.get(0), mk.dataType)),
          LessThanOrEqual(mk, Literal.create(boundsRow.get(1), mk.dataType))): Expression,
          true)
      }
    val pruned =
      if (rowApplied)
        VTableScan.expand(spark, marker,
          Some(extra.map(And(_, derived)).getOrElse(derived)), keep)
      else
        VTableScan.expand(spark, marker, extra, keep, pruneOnly = Some(derived))
    Some(if (markerLeft) j.copy(left = pruned) else j.copy(right = pruned))
  }

  /** The manifest-answerable ungrouped aggregates: COUNT(*) /
    * COUNT(non-null literal), and MIN/MAX of a relation column whose
    * per-file numeric stats cover every file (`r.bounds`). Strict by
    * design — any other aggregate, a FILTER clause, or DISTINCT makes
    * the whole list fall through to the real scan. Returns the
    * replacement literal per expression, or None.
    */
  private def metaAnswer(r: VTableRelation, e: NamedExpression): Option[Expression] = {
    def boundLit(a: Attribute, v: Any): Expression = {
      import org.apache.spark.sql.types._
      a.dataType match {
        case LongType    => Literal(v.asInstanceOf[Long])
        case IntegerType => Literal(v.asInstanceOf[Long].toInt)
        case ShortType   => Literal(v.asInstanceOf[Long].toShort)
        case ByteType    => Literal(v.asInstanceOf[Long].toByte)
        case DoubleType  => Literal(v.asInstanceOf[Double])
        case FloatType   => Literal(v.asInstanceOf[Double].toFloat)
        case dt          => throw new IllegalStateException(s"unexpected bound type $dt")
      }
    }
    // MIN/MAX over ZERO rows is null of the column type
    def orNull(a: Attribute, pick: ((Any, Any)) => Any): Option[Expression] =
      if (r.rows.contains(BigInt(0))) Some(Literal(null, a.dataType))
      else r.bounds.get(a.name).map(b => boundLit(a, pick(b)))
    e match {
      case Alias(AggregateExpression(
          Count(Seq(Literal(v, _))), Complete, false, None, _), _) if v != null =>
        r.rows.map(n => Literal(n.toLong))
      // COUNT(col): the exact non-null count from the 4th stats element
      case Alias(AggregateExpression(
          Count(Seq(a: AttributeReference)), Complete, false, None, _), _)
          if r.outputSet.contains(a) =>
        if (r.rows.contains(BigInt(0))) Some(Literal(0L))
        else r.nonNulls.get(a.name).map(Literal(_))
      case Alias(AggregateExpression(
          Min(a: AttributeReference), Complete, false, None, _), _)
          if r.outputSet.contains(a) =>
        orNull(a, _._1)
      case Alias(AggregateExpression(
          Max(a: AttributeReference), Complete, false, None, _), _)
          if r.outputSet.contains(a) =>
        orNull(a, _._2)
      case _ => None
    }
  }

  /** Does the condition contain an IN/EXISTS predicate subquery (the
    * shapes RewriteSubquery later turns into semi/anti joins)? Scalar
    * subqueries don't count — they never become joins over the marker.
    */
  private def hasPredicateSubquery(cond: Expression): Boolean =
    cond.exists {
      case _: org.apache.spark.sql.catalyst.expressions.InSubquery => true
      case _: org.apache.spark.sql.catalyst.expressions.Exists     => true
      case _ => false
    }

  private def metadataAgg(r: VTableRelation,
      exprs: Seq[NamedExpression]): Option[LogicalPlan] = {
    if (r.rows.isEmpty || exprs.isEmpty) return None
    val answers = exprs.map(e => metaAnswer(r, e))
    if (answers.exists(_.isEmpty)) None
    else Some(Project(
      exprs.zip(answers).collect { case (a: Alias, Some(lit0)) =>
        Alias(lit0, a.name)(exprId = a.exprId, qualifier = a.qualifier)
      },
      OneRowRelation()))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // metadata-only aggregates: per-file row counts sum to the exact
    // snapshot cardinality (copy-on-write — no tombstones) and global
    // numeric [min,max] folds from full-coverage per-file stats, so
    // SELECT count(*) / min(k) / max(ts) answers in O(1) without
    // opening a single data file — on a 100 TB table the difference
    // between a dashboard ping and a full scan. The optimizer usually
    // parks a (possibly empty) column-pruning Project between the
    // aggregate and the leaf — projections of plain attributes change
    // neither cardinality nor column values, so the manifest's answer
    // stands; an alias-computing Project makes the Min/Max argument
    // reference the alias, which fails the outputSet test and falls
    // through.
    case agg @ Aggregate(Nil, exprs, r: VTableRelation, _) =>
      metadataAgg(r, exprs).getOrElse(agg)
    case agg @ Aggregate(Nil, exprs, Project(ps, r: VTableRelation), _)
        if ps.forall(_.isInstanceOf[Attribute]) =>
      metadataAgg(r, exprs).getOrElse(agg)
    // marker joined to a small dim: derive the dim's key bounds and
    // prune the marker's file set before the join plans (DFP).
    // Single evaluation — dynamicPrune runs a (tiny) Spark job, so a
    // guard + body double-call would run it twice
    case j: Join =>
      dynamicPrune(j).getOrElse(j)
    // the column-pruned shape the optimizer leaves over a filtered
    // scan: Project(narrow) over Filter over leaf. Narrow the restored
    // output to what the Project (and nothing else) references.
    // Conditions holding a PREDICATE subquery (IN / EXISTS) defer: an
    // early rule pass would expand the marker before RewriteSubquery
    // turns the predicate into the semi join that dynamic pruning can
    // feed — expansion then happens on the rewritten shape instead.
    case p @ Project(ps, Filter(cond, r: VTableRelation))
        if cond.deterministic && !hasPredicateSubquery(cond) =>
      p.copy(child = VTableScan.expand(spark, r, Some(cond),
        Some(VTableScan.needed(r, ps))))
    case Filter(cond, r: VTableRelation)
        if cond.deterministic && !hasPredicateSubquery(cond) =>
      VTableScan.expand(spark, r, Some(cond))
    // NO case for a bare/merely-projected marker: expanding those
    // early would forfeit manifest skipping for filters that only
    // materialize in later optimizer phases (constraint inference,
    // subquery rewrites). They plan through VTableScanStrategy at
    // physical planning, where PhysicalOperation narrows the scan's
    // columns from whatever projects sit above.
  }
}

/** Plans any [[VTableRelation]] the optimizer left bare (no filter
  * above it, or a non-deterministic one) as the full snapshot scan.
  */
case class VTableScanStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case r: VTableRelation =>
      planLater(VTableScan.expand(spark, r, None)) :: Nil
    case _ => Nil
  }
}
