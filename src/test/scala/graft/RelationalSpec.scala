package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpecBase {

  test("q1 groups to returnflag x linestatus with positive sums") {
    val rows = Relational.q1PricingSummary(tables).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("outer join keeps all customers; semi+anti partition them") {
    val nCust = tables.customer.count()
    assert(Relational.qOuterJoin(tables).count() == nCust)
    val semiAll = tables.customer.join(
      tables.orders.select("o_custkey"),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = Relational.qAntiJoin(tables).count()
    assert(semiAll + anti == nCust)
  }

  test("topk orders is the global maxima in order") {
    val rows = Relational.qTopkOrders(tables).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("price"))
    assert(prices.sameElements(prices.sorted.reverse))
    val globalMax = tables.orders.agg(max("o_totalprice")).head().getDouble(0)
    assert(math.abs(prices.head - math.floor(globalMax * 100 + 0.5) / 100) < 1e-9)
  }

  test("window topn emits at most 3 rows per customer, ranked") {
    val rows = Relational.qWindowTopn(tables).collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rn")).sorted.sameElements(1 to rs.length))
    }
  }

  test("rollup has per-group, subtotal, and grand-total rows") {
    val rows = Relational.qRollup(tables).collect()
    val grand = rows.filter(r => r.getAs[String]("rf") == "ALL" && r.getAs[String]("ls") == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("cnt") == tables.lineitem.count())
  }

  test("approx_count_distinct is within 10% of exact") {
    val r = Relational.qApproxDistinct(tables).head()
    val exact = tables.lineitem.select(countDistinct("l_partkey")).head().getLong(0)
    val approx = r.getAs[Long]("approx_parts")
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
    // the query's own bound audit (what the DuckDB oracle replays)
    assert(r.getAs[Boolean]("parts_ok") && r.getAs[Boolean]("orders_ok"))
  }

  test("hll sketch union estimate tracks exact distinct users within 5%") {
    val est = Relational.qHllSketch(tables).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("est_users_total")).toMap
    val exact = tables.events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (k, e) =>
      assert(math.abs(e - exact(k)).toDouble / exact(k) < 0.05,
        s"$k: sketch $e vs exact ${exact(k)}")
    }
    // the re-aggregation property itself: union of per-day sketches
    // equals a sketch built over all days at once
    val allAtOnce = tables.events.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .cast("long").as("est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (k, e) =>
      assert(e == allAtOnce(k), s"$k: day-union $e != single-pass ${allAtOnce(k)}")
    }
    // the query's own bound audit (what the DuckDB oracle replays)
    Relational.qHllSketch(tables).collect().foreach { r =>
      assert(r.getAs[Boolean]("total_ok") && r.getAs[Boolean]("wk1_ok"),
        s"${r.getString(0)}: bound flags false")
    }
  }

  test("approx_percentile tracks the exact percentiles within 1% per group") {
    val exact = Relational.qPercentile(tables).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Relational.qPercentileApprox(tables).collect()
    assert(approx.map(_.getString(0)).toSet == exact.keySet)
    approx.foreach { r =>
      val (p50, p95, q50) = exact(r.getString(0))
      def close(a: Double, e: Double) = math.abs(a - e) / math.abs(e) < 0.01
      assert(close(r.getDouble(1), p50), s"${r.getString(0)} p50: ${r.getDouble(1)} vs $p50")
      assert(close(r.getDouble(2), p95), s"${r.getString(0)} p95: ${r.getDouble(2)} vs $p95")
      assert(close(r.getDouble(3), q50), s"${r.getString(0)} qty_p50: ${r.getDouble(3)} vs $q50")
      // the query's own GK rank-bound audit (what the oracle replays)
      assert(r.getAs[Boolean]("p50_ok") && r.getAs[Boolean]("p95_ok") &&
        r.getAs[Boolean]("qty_ok"), s"${r.getString(0)}: rank-bound flags false")
    }
  }
}
