package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group top-k as a first-class physical operator — the deepest
  * rung of the extension ladder (custom `LogicalPlan` + `SparkStrategy`
  * + `SparkPlan`), used where composing built-ins genuinely can't
  * express the efficient plan.
  *
  * The declarative spelling — `row_number() OVER (PARTITION BY g ORDER
  * BY s) <= k` — plans as a full shuffle of EVERY row on `g` followed
  * by a per-partition SORT of every group's entire contents, just to
  * throw all but k rows away. At 100 TB that sort-and-discard is the
  * bottleneck: shuffle volume is the whole fact table.
  *
  * This operator plans the same semantics as two bounded-heap passes:
  *
  *   TopKPerGroupExec(final)    per group: merge ≤ k·P candidates
  *     └ Exchange hash(g)         shuffles ≤ k rows PER GROUP PER
  *   TopKPerGroupExec(partial)    upstream partition — not the table
  *     └ child                    (map-side "combiner" for top-k)
  *
  * Each pass keeps one k-bounded binary heap per group (k+1 smallest
  * heap ops per input row, no sort), so shuffle volume drops from n
  * rows to ≤ k·groups·partitions and nothing is ever globally sorted.
  * The partial pass is exactly a map-side combine: correct because
  * top-k is a commutative, idempotent selection — the global top k of
  * a group is contained in the union of per-partition top ks.
  *
  * Memory: each task holds groups-per-partition × k row copies — the
  * same residency class as a hash aggregate's state (bounded by k,
  * unlike a window sort which holds the whole group). Determinism:
  * like any top-k, ties at the boundary are arbitrary unless the
  * ordering is total — callers wanting stable output include a unique
  * tiebreaker column, same as they would with row_number.
  *
  * Output order within/across groups is unspecified (it's a selection,
  * not a sort) — downstream consumers re-sort if they need an order.
  */
case class TopKPerGroupPlan(groupExprs: Seq[Attribute], ordering: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"top-k needs k >= 1, got $k")
  require(groupExprs.nonEmpty,
    "per-group top-k needs at least one group column (global top-k is ORDER BY ... LIMIT k)")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Plans [[TopKPerGroupPlan]] as partial→exchange→final. Registered
  * per-session via `spark.experimental.extraStrategies` (runtime
  * sessions) and through `GraftExtensions.injectPlannerStrategy`
  * (config-built sessions); strategies not matching pass through with
  * Nil per the Catalyst contract.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** One bounded-heap top-k pass. `partial = true` runs on whatever
  * distribution the child has (map-side); the final pass declares
  * [[ClusteredDistribution]] on the group columns so EnsureRequirements
  * inserts the (already k-bounded) exchange between the two.
  */
case class TopKPerGroupExec(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val grp = groupExprs
    val ord = ordering
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(grp, childOutput)
      // codegen'd row comparator; compare(a,b) < 0 ⇔ a precedes b in
      // the requested sort order ("a is better")
      val cmp = new LazilyGeneratedOrdering(ord, childOutput)
      // heap head = WORST kept row, so the boundary test is one peek
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = cmp.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row) // reused buffer — copy only on first sight
        var pq = heaps.get(key)
        if (pq == null) {
          pq = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), pq)
        }
        if (pq.size < kk) { pq.offer(row.copy()); () }
        else if (cmp.compare(row, pq.peek()) < 0) {
          pq.poll(); pq.offer(row.copy()); ()
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {

  /** Top `k` rows of `df` per distinct value of `groupCols`, "top"
    * meaning first in `orderBy` order (include a unique tiebreaker for
    * deterministic output). Installs [[TopKPerGroupStrategy]] into the
    * session's experimental strategies on first use — the public
    * runtime hook, so driver-built sessions (no extensions config)
    * plan the node too.
    */
  def apply(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val lp = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      lp.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"top-k column `$name` not in ${lp.output.map(_.name).mkString(", ")}"))
    // resolve the caller's Columns against the analyzed child: a
    // Column from col("x")/df("x").desc carries an UnresolvedAttribute
    // (or a pre-resolved AttributeReference from another frame whose
    // exprId doesn't belong to THIS plan) — both rebind by name here.
    // Anything fancier (expressions over columns) belongs in a
    // .withColumn BEFORE the top-k, where the analyzer sees it.
    def rebind(e: Expression): Expression = e match {
      case u: UnresolvedAttribute => attr(u.name)
      case a: Attribute           => attr(a.name)
      case other => throw new IllegalArgumentException(
        s"top-k ordering must be plain (possibly desc'd) columns; precompute `$other` with withColumn")
    }
    val orders = orderBy.map(GraftSqlBridge.expr(_) match {
      case so: SortOrder => so.copy(child = rebind(so.child))
      case e             => SortOrder(rebind(e), Ascending)
    })
    GraftSqlBridge.ofRows(spark, TopKPerGroupPlan(groupCols.map(attr), orders, k, lp))
  }
}
