package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LeafNode, LogicalPlan, OneRowRelation, Project, Statistics}
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
  *     both via `SparkSessionExtensions.injectOptimizerRule` (runs in
  *     the operator-optimization fixed point, AFTER the iteration's
  *     PushDownPredicates has moved filters adjacent) and via the
  *     runtime `spark.experimental.extraOptimizations` hook (runs in
  *     the "User Provided Optimizers" batch at the tail of the
  *     optimizer, when filter placement is final). Only the
  *     Filter-adjacent shape rewrites — a bare marker is left alone so
  *     an early rule pass can never expand it prematurely and forfeit
  *     pruning that a later-pushed filter would have bought.
  *   - [[VTableScanStrategy]]: physical-planning fallback for markers
  *     no filter ever reached — expands to the full snapshot scan.
  *
  * The rewrite re-applies the FULL predicate on the pruned scan (the
  * Filter node stays, feeding parquet row-group pushdown), so skipping
  * only ever removes provably-dead IO — result equality with
  * `read(v).where(cond)` is the invariant VTableScanSpec asserts.
  */
case class VTableRelation(dir: String, version: Int, sizeBytes: BigInt,
    rows: Option[BigInt], output: Seq[Attribute])
  extends LeafNode with MultiInstanceRelation {
  override def newInstance(): VTableRelation = copy(output = output.map(_.newInstance()))
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = sizeBytes, rowCount = rows)
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
    */
  private[plans] def expand(spark: SparkSession, r: VTableRelation,
      cond: Option[Expression],
      keep: Option[Seq[Attribute]] = None): LogicalPlan = {
    val t = VersionedTable(spark, r.dir)
    val base = cond match {
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
case class VTableScanRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** An ungrouped aggregate list answerable from the manifest alone:
    * every expression is COUNT(*) / COUNT(non-null literal) (possibly
    * aliased). Strict by design — any other aggregate, a FILTER
    * clause, or DISTINCT falls through to the real scan.
    */
  private def allCountStar(exprs: Seq[NamedExpression]): Boolean =
    exprs.nonEmpty && exprs.forall {
      case Alias(AggregateExpression(
          Count(Seq(Literal(v, _))), Complete, false, None, _), _) => v != null
      case _ => false
    }

  private def metadataCount(r: VTableRelation, exprs: Seq[NamedExpression]): LogicalPlan = {
    val n = Literal(r.rows.get.toLong, org.apache.spark.sql.types.LongType)
    Project(
      exprs.map { case a: Alias =>
        Alias(n, a.name)(exprId = a.exprId, qualifier = a.qualifier)
      },
      OneRowRelation())
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // metadata-only COUNT(*): the manifest's per-file row counts sum
    // to the exact snapshot cardinality (copy-on-write — no
    // tombstones), so SELECT count(*) answers in O(1) without opening
    // a single data file. The signature move of a table format whose
    // commit log carries stats; on a 100 TB table this is the
    // difference between a dashboard ping and a full scan.
    // the optimizer usually parks an (often empty) column-pruning
    // Project between the count and the leaf — projections never
    // change cardinality, so the count is still the manifest's
    case Aggregate(Nil, exprs, r: VTableRelation, _)
        if r.rows.isDefined && allCountStar(exprs) =>
      metadataCount(r, exprs)
    case Aggregate(Nil, exprs, Project(_, r: VTableRelation), _)
        if r.rows.isDefined && allCountStar(exprs) =>
      metadataCount(r, exprs)
    // the column-pruned shape the optimizer leaves over a filtered
    // scan: Project(narrow) over Filter over leaf. Narrow the restored
    // output to what the Project (and nothing else) references.
    case p @ Project(ps, Filter(cond, r: VTableRelation)) if cond.deterministic =>
      p.copy(child = VTableScan.expand(spark, r, Some(cond),
        Some(VTableScan.needed(r, ps))))
    case Filter(cond, r: VTableRelation) if cond.deterministic =>
      VTableScan.expand(spark, r, Some(cond))
    // unfiltered but projected: no file skipping, but the scan width
    // still narrows to the projected columns
    case p @ Project(ps, r: VTableRelation) =>
      p.copy(child = VTableScan.expand(spark, r, None,
        Some(VTableScan.needed(r, ps))))
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
