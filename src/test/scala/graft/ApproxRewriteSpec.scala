package graft

import org.apache.spark.sql.functions._

/** The injected optimizer Rule: COUNT(DISTINCT) silently becomes an
  * HLL sketch under the session flag and is bit-exact again the
  * moment the flag drops.
  */
class ApproxRewriteSpec extends SparkSpecBase {

  private val sql =
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust
      |FROM __graft_approx_orders GROUP BY o_orderstatus""".stripMargin

  test("flagged sessions sketch COUNT(DISTINCT); unflagged stay exact") {
    tables.orders.createOrReplaceTempView("__graft_approx_orders")
    val exact = spark.sql(sql).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val df = spark.sql(sql)
      // the rewrite happened in the OPTIMIZER — the sketch shows up in
      // the plan, and the distinct's Expand does not
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("approx_count_distinct"), opt)
      assert(!df.queryExecution.executedPlan.toString.contains("Expand"))
      val approx = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet == exact.keySet)
      exact.foreach { case (k, ex) =>
        val err = math.abs(approx(k) - ex).toDouble / ex
        assert(err <= 0.1, s"$k: approx ${approx(k)} vs exact $ex")
      }
    } finally spark.conf.unset("spark.graft.approxDistinct")
    // flag dropped: exact again, and the plan pays the distinct
    val back = spark.sql(sql).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(back == exact)
  }

  test("multi-column and already-approx aggregates are left alone") {
    tables.orders.createOrReplaceTempView("__graft_approx_orders")
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      // count(DISTINCT a, b): no single-column HLL equivalent — exact
      val multi = spark.sql(
        """SELECT count(DISTINCT o_custkey, o_orderstatus) AS n
          |FROM __graft_approx_orders""".stripMargin)
      assert(!multi.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      val exactMulti = {
        spark.conf.unset("spark.graft.approxDistinct")
        val v = multi.collect().head.getLong(0)
        spark.conf.set("spark.graft.approxDistinct", "true")
        v
      }
      assert(multi.collect().head.getLong(0) == exactMulti)
      // references through HAVING still bind on the rewritten exprId
      val having = spark.sql(
        """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust
          |FROM __graft_approx_orders GROUP BY o_orderstatus
          |HAVING count(DISTINCT o_custkey) > 0""".stripMargin)
      assert(having.collect().nonEmpty)
    } finally spark.conf.unset("spark.graft.approxDistinct")
  }
}
