package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, View}
import org.apache.spark.sql.types.TimestampType

import graft.sources.VersionedTable

/** SQL time travel over registered vtable views (Delta's
  * `VERSION AS OF` / `TIMESTAMP AS OF`, which Spark's parser already
  * grammars into [[RelationTimeTravel]]):
  *
  *   SELECT * FROM sales VERSION AS OF 3
  *   SELECT count(*) FROM sales TIMESTAMP AS OF '2026-08-01T00:00:00Z'
  *
  * Substituted at PARSE time by the injected [[graft.service.GraftSqlParser]]
  * — it cannot be an analyzer rule: Spark's built-in ResolveRelations
  * throws its eager "time travel on temp view" error in the same
  * resolution batch BEFORE any extension rule runs (catalog-table
  * engines like Delta dodge this because their relations resolve
  * through TableCatalog.loadTable(ident, version); this library's
  * tables are registered views). When the time-traveled relation is a
  * single-part name registered as a bare vtable scan, the node is
  * replaced by the analyzed scan PINNED at the requested version —
  * `versionAt(wall clock)` for the timestamp form — so every
  * downstream consumer (pruning, metadata aggregates, CBO stats) sees
  * a normal versioned marker. Non-vtable names are left untouched for
  * Spark's own resolution (and its native error surface). The
  * timestamp operand must be foldable — it is evaluated at
  * substitution time, there is no row context.
  */
object VTableTimeTravel {

  /** Replace every vtable-targeted [[RelationTimeTravel]] in a parsed
    * tree; identity when none match (the caller probes with
    * [[hasTimeTravel]] first to keep the non-time-travel path free).
    */
  def substitute(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case tt @ RelationTimeTravel(UnresolvedRelation(parts, _, _), ts, ver)
          if parts.length == 1 =>
        bareVTable(spark, parts.head) match {
          case None => tt
          case Some(dir) =>
            val vt = VersionedTable(spark, dir)
            (ver, ts) match {
              // a non-numeric version is a named REF (Iceberg's
              // `VERSION AS OF 'ref'` idiom; also the lowered form of
              // `FROM t BRANCH 'b'`): a TAG resolves to its pinned
              // version of THIS table, a BRANCH to the fork's own
              // head. Creation refuses cross-kind name collisions, so
              // the tag-first order here can never shadow a branch.
              case (Some(v), _) if v.toIntOption.isEmpty =>
                vt.tagVersion(v) match {
                  case Some(tv) => vt.scan(tv).queryExecution.analyzed
                  case None if vt.branchNames.contains(v) =>
                    vt.branch(v).read().queryExecution.analyzed
                  case None => throw new IllegalArgumentException(
                    s"VERSION AS OF wants a commit number, a tag, or a " +
                      s"live branch name, got '$v' (tags: " +
                      s"${vt.tagNames.mkString(", ")}; branches: " +
                      s"${vt.branchNames.mkString(", ")})")
                }
              case (Some(v), _) =>
                vt.scan(v.toInt).queryExecution.analyzed
              case (_, Some(e)) =>
                vt.scan(vt.versionAt(timestampMillis(spark, e)))
                  .queryExecution.analyzed
              case _ => vt.scan(-1).queryExecution.analyzed
            }
        }
    }

  def hasTimeTravel(plan: LogicalPlan): Boolean =
    plan.exists(_.isInstanceOf[RelationTimeTravel])

  private def bareVTable(spark: SparkSession, name: String): Option[String] = {
    def bare(p: LogicalPlan): Option[VTableRelation] = p match {
      case r: VTableRelation => Some(r)
      case s: SubqueryAlias  => bare(s.child)
      case v: View           => bare(v.child)
      case _                 => None
    }
    try bare(spark.table(name).queryExecution.analyzed).map(_.dir)
    catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  /** Foldable `TIMESTAMP AS OF` operand → epoch millis, via a catalyst
    * Cast to timestamp under the session zone (so a bare string like
    * '2026-08-01 12:00:00' reads in session time, same as SQL).
    */
  private def timestampMillis(spark: SparkSession, e: Expression): Long = {
    require(e.foldable, s"TIMESTAMP AS OF must be a constant, got ${e.sql}")
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    val micros = Cast(e, TimestampType, Some(zone)).eval(null)
    require(micros != null, s"TIMESTAMP AS OF operand is not a timestamp: ${e.sql}")
    micros.asInstanceOf[Long] / 1000L
  }
}
