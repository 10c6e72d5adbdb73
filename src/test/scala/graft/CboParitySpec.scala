package graft

/** CBO-on-by-default safety gate. Wall-clock A/B runs are too noisy
  * to detect a plan regression, so the gate is on the PLANS: with no
  * catalog statistics anywhere (plain parquet temp views), enabling
  * `spark.sql.cbo.enabled` + join reorder must leave every optimized
  * plan bit-identical — Spark's cost model falls back to the same
  * sizeInBytes heuristics the stats-less path uses, and the reorderer
  * requires row counts it doesn't have. Where manifest stats DO exist
  * (vtable lazy scans), CBO is supposed to change plans for the
  * better — that payoff direction is owned by VTableScanSpec's
  * reorder test, not this spec.
  */
class CboParitySpec extends SparkSpecBase {

  // pure-plan contract queries: building the DataFrame only reads the
  // corpus temp views (no memoized table construction side effects)
  private val statsLess = Seq(
    "q1_pricing_summary", "q2_min_bal_supplier", "q3_shipping_priority",
    "q4_priority_check", "q5_local_supplier", "q6_filter_agg",
    "q7_nation_volume", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_parts", "q12_late_shipments",
    "q13_order_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_counts", "q17_small_qty", "q18_large_orders",
    "q19_disjunctive", "q20_heavy_part_suppliers", "q21_waiting_supplier",
    "q22_idle_customers", "q_having", "q_outer_join", "q_full_outer",
    "q_semi_join", "q_anti_join", "q_scalar_subquery", "q_window_topn",
    "q_events_hourly", "q_funnel", "q_cohort_retention", "q_sql_cte",
    "q_asof_join", "q_range_join")

  /** Optimized-plan fingerprint, stable across sessions: exprIds,
    * plan ids, and cached-view instance names vary per session and
    * are normalized away.
    */
  private def fingerprint(p: org.apache.spark.sql.DataFrame): String =
    p.queryExecution.optimizedPlan.toString
      .replaceAll("#\\d+", "#")
      .replaceAll("plan_id=\\d+", "plan_id=")
      .replaceAll("@[0-9a-f]{6,}", "@")

  test("cbo on/off produce identical plans for every stats-less query") {
    val off = spark.newSession()
    val on = spark.newSession()
    off.conf.set("spark.sql.cbo.enabled", "false")
    off.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    on.conf.set("spark.sql.cbo.enabled", "true")
    on.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val diffs = statsLess.flatMap { name =>
      val fOff = fingerprint(SparkEntry.queries(name)(off, TestSpark.sfDir))
      val fOn = fingerprint(SparkEntry.queries(name)(on, TestSpark.sfDir))
      if (fOff == fOn) None else Some(name)
    }
    assert(diffs.isEmpty, s"CBO changed stats-less plans: $diffs")
  }
}
