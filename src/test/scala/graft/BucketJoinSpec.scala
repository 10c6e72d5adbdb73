package graft

import org.apache.spark.sql.functions._

/** Evidence for SURVEY §6's bucketing claim: facts bucketed on their
  * join key co-locate, and the join plans with NO shuffle exchange on
  * either side — the strategy that removes the orders⋈lineitem
  * exchange at 100 TB.
  */
class BucketJoinSpec extends SparkSpecBase {

  test("join of two tables bucketed on the key plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    tables.lineitem.select("l_orderkey", "l_extendedprice", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    tables.orders.select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("s"))
    // disable broadcast so the join strategy is SMJ over the buckets
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it computes the right thing
      val n = joined.count()
      assert(n == tables.lineitem.select("l_orderkey").distinct().count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
