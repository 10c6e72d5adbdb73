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

  test("stored KLL sketches answer merged quantiles within the rank bound") {
    val rows = Relational.qKllQuantiles(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_ok") && r.getAs[Boolean]("p95_ok"),
        s"${r.getString(0)}: KLL rank bound failed")
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p95"))
    }
    // value-level check vs exact per-group percentile
    val exact = tables.events.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.5)).as("e50")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val e = exact(r.getString(0))
      assert(math.abs(r.getAs[Double]("p50") - e) / math.max(math.abs(e), 1e-9) < 0.2,
        s"${r.getString(0)}: merged-KLL p50 ${r.getAs[Double]("p50")} far from exact $e")
    }
  }

  test("kll aggregates partial-combine map-side; empty sketches read as null") {
    // the shuffle must carry sketches, never per-group value multisets
    val plan = Relational.qKllQuantiles(tables)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_kll_sketch_agg"),
      s"no map-side sketch partial:\n${plan.take(800)}")
    // empty sketch → SQL null on BOTH eval paths, not a library throw
    import spark.implicits._
    val empty = Seq.empty[Double].toDF("v")
      .agg(graft.functions.GraftFunctions.kllSketchAgg(col("v")).as("sk"))
      .select(graft.functions.GraftFunctions.kllValue(col("sk"), 0.5))
      .head()
    assert(empty.isNullAt(0), "p50 of nothing must be null")
  }

  test("theta sketches intersect: audience overlap matches exact at exact-mode scale") {
    val rows = Relational.qThetaOverlap(tables).collect()
    assert(rows.nonEmpty)
    val exact = tables.events
      .select(col("event_type"),
        when(dayofmonth(col("ts")) <= 7, 0).otherwise(1).as("half"), col("user_id"))
      .groupBy("event_type", "user_id")
      .agg(max(when(col("half") === 0, 1).otherwise(0)).as("h1"),
        max(when(col("half") === 1, 1).otherwise(0)).as("h2"))
      .groupBy("event_type")
      .agg(sum(when(col("h1") === 1 && col("h2") === 1, 1L).otherwise(0L)).as("b"),
        count(lit(1)).as("a")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (b, a) = exact(r.getString(0))
      // below lgK=14's nominal entries the sketch is EXACT
      assert(r.getAs[Long]("est_both") == b && r.getAs[Long]("est_any") == a,
        s"${r.getString(0)}: theta ${r.getAs[Long]("est_both")}/${r.getAs[Long]("est_any")} vs exact $b/$a")
      assert(r.getAs[Boolean]("both_ok") && r.getAs[Boolean]("any_ok") &&
        r.getAs[Boolean]("gone_ok"))
      assert(r.getAs[Long]("est_any") >= r.getAs[Long]("est_both"))
      // set identity: |A| = |A∩B| + |A\B| holds in exact mode
      assert(r.getAs[Long]("est_gone") + r.getAs[Long]("est_both") <=
        r.getAs[Long]("est_any"))
    }
  }

  test("theta overlap is total on single-half event types: both=0, churn exact, no nulls") {
    import spark.implicits._
    // a corpus where some event_type has rows in only ONE half: the
    // missing half's sketch is NULL, and without the empty-sketch
    // coalesce (A\B) would null-propagate while the intersect agg —
    // seeing one input — would report that half's full count as "both"
    val dir = java.nio.file.Files.createTempDirectory("graft-theta-half").toString
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 10:00:00")
    Seq(
      ("only_h1", ts("2024-03-02"), 1L), ("only_h1", ts("2024-03-03"), 2L),
      ("only_h2", ts("2024-03-20"), 5L),
      ("both", ts("2024-03-03"), 7L), ("both", ts("2024-03-21"), 7L),
      ("both", ts("2024-03-22"), 8L))
      .toDF("event_type", "ts", "user_id")
      .write.parquet(s"$dir/events.parquet")
    val out = Relational.qThetaOverlap(
      graft.sources.Tables(spark, dir)).collect()
    assert(out.length == 3)
    out.foreach(r => (0 until r.length).foreach(i =>
      assert(!r.isNullAt(i), s"null at ${r.schema.fieldNames(i)} for ${r.getString(0)}")))
    val m = out.map(r => r.getString(0) -> r).toMap
    // 2 users active early, nobody late: both=0, everyone churned
    assert(m("only_h1").getAs[Long]("est_both") == 0L)
    assert(m("only_h1").getAs[Long]("est_any") == 2L)
    assert(m("only_h1").getAs[Long]("est_gone") == 2L)
    // nobody early: both=0, gone=0 (nothing to churn from)
    assert(m("only_h2").getAs[Long]("est_both") == 0L)
    assert(m("only_h2").getAs[Long]("est_gone") == 0L)
    // the two-half type behaves as before: user 7 in both, 8 joined late
    assert(m("both").getAs[Long]("est_both") == 1L)
    assert(m("both").getAs[Long]("est_any") == 2L)
    assert(m("both").getAs[Long]("est_gone") == 0L)
    out.foreach { r =>
      assert(r.getAs[Boolean]("both_ok") && r.getAs[Boolean]("any_ok") &&
        r.getAs[Boolean]("gone_ok"), r.toString)
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
