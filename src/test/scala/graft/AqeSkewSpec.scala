package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** SURVEY §6 claims AQE skew-join splitting backs the shuffle-join
  * story at 100 TB; this spec makes Spark actually DO it on a
  * manufactured hot key, so the claim is enforced by a test rather
  * than prose (the complement of Skew.scala's manual salting, which
  * q_salted_join oracles for result identity).
  */
class AqeSkewSpec extends SparkSpecBase {

  test("AQE splits a skewed shuffle-join partition at runtime") {
    import spark.implicits._
    // 200k rows of one hot key + a sprinkle of others vs a uniform
    // right side; thresholds forced low so local data sizes qualify
    val left = spark.range(0, 200000)
      .select(when(col("id") % 20 =!= 0, 0L).otherwise(col("id") % 97).as("k"),
        col("id").as("v"))
    val right = spark.range(0, 97).select(col("id").as("k"), (col("id") * 10).as("w"))
    val conf = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // no keyed agg downstream: a required hash distribution on k
      // above the join would make AQE veto the split (splitting
      // breaks the child distribution unless forceOptimizeSkewedJoin)
      val j = left.join(right, "k")
      val rows = j.collect()
      // correctness first: the hot key carries ~190k rows (every
      // id%20!=0, plus the id%20==0 stragglers whose id%97 is 0)
      val expectedHot = (0L until 200000L).count(i =>
        i % 20 != 0 || i % 97 == 0).toLong
      assert(rows.length == 200000, s"join lost rows: ${rows.length}")
      assert(rows.count(_.getAs[Long]("k") == 0L) == expectedHot)
      // then the plan: the sort-merge/shuffled-hash join must be
      // marked skew-handled after adaptive re-planning
      val plan = j.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      }.getOrElse(j.queryExecution.executedPlan.toString)
      assert(plan.contains("skew=true"),
        s"no skew-split marker on the join in the adaptive plan:\n$plan")
      assert(plan.contains("skewed"),
        s"no skewed AQEShuffleRead in the adaptive plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
