package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Presto-style "approximate mode", as a Catalyst optimizer rule: with
  * `SET spark.graft.approxDistinct=true`, every single-column
  * COUNT(DISTINCT x) in the session rewrites to a HyperLogLog++
  * sketch before physical planning — ad-hoc dashboards get
  * sketch-speed answers over 100 TB without touching their SQL, and
  * the flag defaults off so semantics never change silently.
  *
  * The rewrite is exactly the win the sketch promises at scale: a
  * distinct count plans as Expand + two full shuffles of the distinct
  * keys, the HLL form is one partial-aggregable hash agg with KB
  * state per group. `spark.graft.approxDistinct.rsd` (default 0.05)
  * tunes the error/size trade.
  *
  * Mechanics: the result exprId of each rewritten AggregateExpression
  * is preserved (`copy` keeps `resultId`), so downstream references —
  * projections, HAVING filters, sort orders — bind unchanged.
  * Multi-column COUNT(DISTINCT a, b) is left alone (HLL hashes one
  * expression); rewrites never fire inside an already-approximate
  * aggregate.
  */
case class ApproxDistinctRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.approxDistinct").contains("true")

  private def rsd: Double =
    spark.conf.getOption("spark.graft.approxDistinct.rsd").map(_.toDouble)
      .getOrElse(0.05)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae: AggregateExpression if ae.isDistinct =>
            ae.aggregateFunction match {
              case Count(Seq(child)) =>
                ae.copy(
                  aggregateFunction = HyperLogLogPlusPlus(child, rsd),
                  isDistinct = false)
              case _ => ae
            }
        }
    }
}
