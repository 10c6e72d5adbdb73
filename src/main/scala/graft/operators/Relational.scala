package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Rnd.round

import graft.sources.Tables

/** Relational operator suite (SURVEY.md §2.1).
  *
  * Each query is a declarative DataFrame plan over the TPC-H-ish test
  * tables — scan, filter, projection stay in Catalyst so parquet
  * pushdown/pruning and whole-stage codegen apply. Every floating
  * aggregate is `round(_, 2)` and every result has a deterministic
  * ORDER BY so the DuckDB oracle hash-compares cleanly.
  *
  * Scale notes are per-query: what shuffles, what broadcasts, and why
  * the plan survives 100 TB (the reference service ships these same
  * shapes through Spark SQL; see /root/reference — Spark-SQL query
  * service).
  */
object Relational {

  /** Q1-style pricing summary: single scan → partial (map-side) hash
    * agg → final agg on 2-col key (6 groups). At 100 TB the map-side
    * combine reduces the shuffle to #partitions × #groups rows.
    */
  def q1PricingSummary(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(avg("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q6-style: selective filter + global agg. Filters push to the
    * parquet scan (PushedFilters on l_shipdate/l_discount/l_quantity);
    * the agg is a single partial→final reduction, no wide shuffle.
    */
  def q6FilterAgg(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz") &&
        col("l_discount").between(0.02, 0.06) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** Q3-style shipping priority: dim-filtered customer (broadcast) →
    * orders → lineitem. customer is small relative to facts at any SF
    * → broadcast hint; orders⋈lineitem shuffles on orderkey (the
    * natural co-partitioning key; at 100 TB bucketing both facts by
    * orderkey removes this shuffle entirely).
    */
  def q3ShippingPriority(t: Tables): DataFrame = {
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = t.orders.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = t.lineitem.filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp_ntz"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q5-style local supplier volume: region→nation (tiny, broadcast)
    * joins hang off the fact pipeline; the only wide shuffles are
    * orders⋈lineitem (orderkey) and the customer join (custkey).
    */
  def q5LocalSupplier(t: Tables): DataFrame = {
    val nations = t.nation.join(
        broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = t.customer.select("c_custkey", "c_nationkey")
    val supp = t.supplier.select("s_suppkey", "s_nationkey")
    t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(t.orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** HAVING-style post-aggregation filter — filter lands above the agg
    * in the plan; nothing extra shuffles.
    */
  def qHaving(t: Tables): DataFrame =
    t.orders
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_spent"))
      .filter(col("n_orders") >= 5)
      .orderBy("o_custkey")

  /** Left outer join: every customer, with zero-order customers kept.
    * customer⋈orders shuffles on custkey; count(o_orderkey) counts
    * only matched rows (NULL-skipping), the outer-join semantics test.
    */
  def qOuterJoin(t: Tables): DataFrame =
    t.customer.select("c_custkey", "c_name")
      .join(t.orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spent"))
      .orderBy("c_custkey")

  /** FULL OUTER join: open-order counts vs fulfilled-order counts per
    * customer — both sides have keys the other lacks (customers with
    * only-open or only-fulfilled orders), so both null-extension
    * directions are exercised; the key survives via coalesce. One
    * shuffle on custkey shared by both agg inputs and the join.
    */
  def qFullOuter(t: Tables): DataFrame = {
    val open = t.orders.filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("k1")).agg(count(lit(1)).as("n_open"))
    val done = t.orders.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("k2")).agg(count(lit(1)).as("n_fulfilled"))
    open.join(done, col("k1") === col("k2"), "full_outer")
      .select(coalesce(col("k1"), col("k2")).as("custkey"),
        coalesce(col("n_open"), lit(0L)).as("n_open"),
        coalesce(col("n_fulfilled"), lit(0L)).as("n_fulfilled"))
      .orderBy("custkey")
  }

  /** Left semi join (EXISTS): customers having ≥1 'O' order. Semi join
    * dedups the probe side inside the join — no distinct needed.
    */
  def qSemiJoin(t: Tables): DataFrame =
    t.customer.select("c_custkey", "c_name")
      .join(t.orders.filter(col("o_orderstatus") === "O").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .orderBy("c_custkey")

  /** Left anti join (NOT EXISTS): customers with no orders at all. */
  def qAntiJoin(t: Tables): DataFrame =
    t.customer.select("c_custkey", "c_name")
      .join(t.orders.select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .orderBy("c_custkey")

  /** Scalar subquery: global avg computed once (1-row broadcast), then
    * a selective filter over the fact — the subquery result is a
    * literal at runtime, so the comparison stays codegen'd.
    */
  def qScalarSubquery(t: Tables): DataFrame = {
    val avgQty = t.lineitem.agg(avg("l_quantity").as("global_avg"))
    t.lineitem.select("l_orderkey", "l_linenumber", "l_quantity")
      .crossJoin(broadcast(avgQty))
      .filter(col("l_quantity") > col("global_avg") * 1.8)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Q17-style correlated aggregate: per-part avg quantity joined back
    * to lineitem. The correlated subquery becomes an aggregate + join
    * on partkey — one shuffle each, both keyed the same → AQE reuses
    * the exchange.
    */
  def q17SmallQty(t: Tables): DataFrame = {
    val perPart = t.lineitem.groupBy(col("l_partkey").as("agg_partkey"))
      .agg(avg("l_quantity").as("avg_qty"))
    t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
      .join(perPart, col("l_partkey") === col("agg_partkey"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("n_rows"))
  }

  /** Q18-style large-volume orders: IN-subquery over an agg-HAVING
    * derived table (orders whose lineitems total > minQty), joined
    * back to orders + customer. The subquery is one partial-agg'd
    * shuffle on orderkey whose HAVING filter prunes before the join;
    * quantities are integer-valued so the threshold is engine-exact.
    */
  def q18LargeOrders(t: Tables, minQty: Double = 200): DataFrame = {
    val big = t.lineitem.groupBy(col("l_orderkey"))
      .agg(sum("l_quantity").as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    t.orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("total_price"),
        round(col("sum_qty"), 2).as("sum_qty"))
      .orderBy("o_orderkey")
  }

  /** Q7-style cross-nation volume: revenue flowing between two named
    * nations per ship year. The pre-filtered 2-row nation dims
    * broadcast onto both legs BEFORE the pair predicate, so the fact
    * pipeline carries only rows touching either nation; the wide
    * shuffles are lineitem⋈orders (orderkey) and the customer join
    * (custkey) — the supplier join broadcasts too (dim-sized).
    */
  def q7NationVolume(t: Tables, nationA: String = "NATION_1",
      nationB: String = "NATION_2"): DataFrame = {
    val pair = Seq(nationA, nationB)
    val sn = t.nation.filter(col("n_name").isInCollection(pair))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val cn = t.nation.filter(col("n_name").isInCollection(pair))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
      .join(t.orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
      .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation")) // the two directions
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(Rnd.round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q20-style nested semi-join chain: nations whose suppliers shipped
    * any "heavy" part (corpus-wide quantity above a threshold). Both
    * inner derived tables are aggregates that shrink before any join;
    * the supplier→nation hop is a broadcast and the part roster rides
    * a semi-join, so no fact-scale row ever carries payload columns.
    */
  def q20HeavyPartSuppliers(t: Tables, minQty: Double = 150): DataFrame = {
    val heavy = t.lineitem.groupBy("l_partkey")
      .agg(sum("l_quantity").as("tot_qty"))
      .filter(col("tot_qty") > minQty)
      .select("l_partkey")
    val shippers = t.lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(heavy, Seq("l_partkey"), "left_semi")
      .select("l_suppkey").distinct()
    t.supplier.select("s_suppkey", "s_nationkey")
      .join(shippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(t.nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"))
      .orderBy("n_name")
  }

  /** Q8-style market share: the home nation's slice of revenue sold
    * into one region's customers for one part type, per order year.
    * Every dim (filtered part roster, region-restricted customer
    * nations, supplier→nation map) broadcasts; the only wide shuffles
    * are the two fact joins (orderkey, custkey). The ratio divides two
    * already-rounded sums so both engines quantize before the FP-
    * sensitive division.
    */
  def q8MarketShare(t: Tables, region: String = "ASIA",
      ptype: String = "PROMO", homeNation: String = "NATION_3"): DataFrame = {
    val parts = t.part.filter(col("p_type") === ptype).select("p_partkey")
    val custNations = t.nation
      .join(broadcast(t.region.filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val suppNation = t.supplier.select("s_suppkey", "s_nationkey")
      .join(broadcast(t.nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t.lineitem.select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(t.orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNations), col("c_nationkey") === col("c_nk"), "left_semi")
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        Rnd.round(sum(when(col("supp_nation") === homeNation, vol)
          .otherwise(lit(0.0))), 2).as("nat_volume"),
        Rnd.round(sum(vol), 2).as("total_volume"))
      .select(col("o_year"), col("nat_volume"), col("total_volume"),
        Rnd.round(col("nat_volume") / col("total_volume"), 4).as("mkt_share"))
      .orderBy("o_year")
  }

  /** Q9-style product profit: per supplier-nation per year, revenue
    * minus a retail-price-proportional cost, over a part-name roster.
    * The name filter prunes part to a broadcast; supplier→nation
    * broadcasts; the orders join (for the order year) is the one
    * fact-fact shuffle. At 100 TB the agg key (nation, year) is tiny,
    * so partial aggregation collapses the shuffle to nearly nothing.
    */
  def q9ProductProfit(t: Tables, namePattern: String = "%widget%"): DataFrame = {
    val parts = t.part.filter(col("p_name").like(namePattern))
      .select("p_partkey", "p_retailprice")
    val suppNation = t.supplier.select("s_suppkey", "s_nationkey")
      .join(broadcast(t.nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    // revenue minus cost cancels catastrophically in doubles — the
    // rounded sum can land a cent apart across engines. Quantize each
    // term to its exact decimal grid (cents × hundredths = 1e-4 units)
    // and sum INTEGERS; the division back to currency happens once, on
    // the final aggregate. int64 headroom: ~1e9/item leaves 9 orders
    // of magnitude for the per-group sum.
    def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")
    val scaledProfit = cents(col("l_extendedprice")) *
      cents(lit(1) - col("l_discount")) -
      cents(col("p_retailprice")) * lit(10L) * col("l_quantity").cast("long")
    t.lineitem.select("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(t.orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(Rnd.round(sum(scaledProfit) / lit(10000.0), 2).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Q10-style returned-item losses: revenue tied up in returns per
    * customer for one order quarter, top 20. The orders date filter
    * pushes to the scan and shrinks the fact side before the lineitem
    * join; nation broadcasts; the final top-k is TakeOrderedAndProject
    * over the rounded revenue (+ key tiebreak → deterministic).
    */
  def q10ReturnedItems(t: Tables): DataFrame =
    t.orders.select("o_orderkey", "o_custkey", "o_orderdate")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp_ntz"))
      .join(t.lineitem.filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"),
        col("o_orderkey") === col("l_orderkey"))
      .join(t.customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(Rnd.round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Q11-style important parts: parts whose lineitem value exceeds a
    * fraction of the corpus-wide total — the scalar subquery in the
    * HAVING clause. Both sides of the comparison come off ONE shuffle
    * (the per-part agg); the global total re-aggregates that small
    * result and broadcasts back as a 1-row cross join. Threshold and
    * per-part values are rounded before comparing, so the boundary is
    * engine-exact.
    */
  def q11ImportantParts(t: Tables, fraction: Double = 0.002): DataFrame = {
    val perPart = t.lineitem
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("raw_value"))
    val total = perPart.agg(
      Rnd.round(sum("raw_value"), 2).as("grand_total"))
    perPart
      .select(col("l_partkey"), Rnd.round(col("raw_value"), 2).as("part_value"))
      .crossJoin(broadcast(total))
      .filter(col("part_value") > col("grand_total") * fraction)
      .select("l_partkey", "part_value")
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** Q14-style promo share: percent of one month's revenue from promo
    * parts. part broadcasts onto the date-pruned lineitem scan; one
    * global agg, no wide shuffle. Numerator and denominator round
    * before the division (same FP discipline as q8).
    */
  def q14PromoRevenue(t: Tables): DataFrame = {
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t.lineitem.select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp_ntz"))
      .join(broadcast(t.part.select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        Rnd.round(sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0))), 2)
          .as("promo_volume"),
        Rnd.round(sum(vol), 2).as("total_volume"))
      .select(col("promo_volume"), col("total_volume"),
        Rnd.round(col("promo_volume") * 100 / col("total_volume"), 4)
          .as("promo_pct"))
  }

  /** Q15-style top supplier: suppliers whose quarterly revenue equals
    * the maximum — the classic view + scalar-max shape. Revenue per
    * supplier is one partial-agg'd shuffle; the max re-aggregates that
    * supplier-sized result and broadcasts back. Comparing ROUNDED
    * revenue to the max of the same rounded column keeps the tie set
    * identical across engines.
    */
  def q15TopSupplier(t: Tables): DataFrame = {
    val revs = t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz"))
      .groupBy("l_suppkey")
      .agg(Rnd.round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
    val top = revs.agg(max("total_revenue").as("max_revenue"))
    revs.crossJoin(broadcast(top))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(t.supplier.select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** Q2-style minimum-cost supplier (adapted: no partsupp table, so
    * "cost" is the supplier's account balance and the part↔supplier
    * relation derives from shipped lineitems). The correlated MIN
    * subquery becomes a per-part agg re-joined on (part, min) — both
    * sides come off the SAME distinct'd pair shuffle, so AQE reuses
    * the exchange. All dims broadcast.
    */
  def q2MinBalSupplier(t: Tables, ptype: String = "STANDARD",
      maxSize: Int = 15, region: String = "EUROPE"): DataFrame = {
    val pairs = t.lineitem.select("l_partkey", "l_suppkey").distinct()
    val parts = t.part
      .filter(col("p_type") === ptype && col("p_size") < maxSize)
      .select("p_partkey", "p_name")
    val supp = t.supplier.select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
      .join(broadcast(t.nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val cand = pairs
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
    val minPer = cand.groupBy(col("p_partkey").as("mp_partkey"))
      .agg(min("s_acctbal").as("min_bal"))
    cand.join(minPer, col("p_partkey") === col("mp_partkey") &&
        col("s_acctbal") === col("min_bal"))
      .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
      .orderBy("p_partkey", "s_name")
  }

  /** Q4-style priority check: orders from one quarter with at least
    * one lineitem shipped more than `lateDays` after the order date.
    * The EXISTS rides a left-semi join on orderkey whose non-equi
    * lateness predicate evaluates inside the join — no second pass.
    * The order-date filter pushes to the parquet scan.
    */
  def q4PriorityCheck(t: Tables, lateDays: Int = 60): DataFrame =
    t.orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
      .join(t.lineitem.select("l_orderkey", "l_shipdate"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** Q12-style shipment audit (adapted: lateness relative to the order
    * date replaces the missing commit/receipt dates; return flag
    * replaces ship mode). Conditional counts of high- vs low-priority
    * orders among late shipments — one fact-fact shuffle on orderkey,
    * then a 3-group agg that partial-aggregates to nothing.
    */
  def q12LateShipments(t: Tables, lateDays: Int = 90): DataFrame = {
    val high = col("o_orderpriority").isInCollection(Seq("1-URGENT", "2-HIGH"))
    t.lineitem.select("l_orderkey", "l_shipdate", "l_returnflag")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .join(t.orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** Q13-style customer order-count distribution: LEFT join with an
    * ON-clause filter (so order-less customers survive with count 0),
    * then a second aggregation over the counts. Two shuffles — custkey
    * then c_count — the second over a customer-sized input that
    * partial-aggregates to a handful of distinct counts.
    */
  def q13OrderDistribution(t: Tables): DataFrame =
    t.customer.select("c_custkey")
      .join(t.orders.filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Q16-style supplier diversity (adapted: shipped-pair relation
    * replaces partsupp; the exclusion list is suppliers in deficit).
    * count(DISTINCT suppkey) per (brand, size) — Spark plans the
    * distinct as a partial de-dup under the agg; the NOT IN rides a
    * broadcast anti-join off the tiny filtered supplier dim.
    */
  def q16SupplierCounts(t: Tables): DataFrame = {
    val sizes = Seq(1, 4, 9, 14, 19, 23, 36, 45)
    val deficit = t.supplier.filter(col("s_acctbal") < 0).select("s_suppkey")
    t.lineitem.select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(t.part
          .filter(col("p_brand") =!= "Brand#1" && col("p_size").isInCollection(sizes))
          .select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(deficit), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  /** Q19-style disjunctive predicate pushdown: three OR'd
    * brand/size/quantity envelopes over the part⋈lineitem join. The
    * per-branch part filters union into one broadcast roster; the
    * mixed part+lineitem OR evaluates post-join where Catalyst also
    * derives the common `p_size/l_quantity` bounds for scan pruning.
    */
  def q19Disjunctive(t: Tables): DataFrame = {
    val branch = (brand: String, szHi: Int, qLo: Int, qHi: Int) =>
      col("p_brand") === brand && col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi)
    t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(t.part.select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(branch("Brand#12", 5, 1, 11) || branch("Brand#15", 10, 10, 20) ||
        branch("Brand#19", 15, 20, 30))
      .agg(Rnd.round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** Q21-style blocking supplier (adapted: "kept the order waiting" =
    * shipped strictly last on a multi-supplier order; no receipt/commit
    * dates in this schema). EXISTS(other supplier) is a left-semi and
    * NOT EXISTS(other supplier shipping later-or-equal) a left-anti —
    * both on the SAME orderkey equi-key with non-equi residuals, so
    * the two passes reuse one exchange of the fact.
    */
  def q21WaitingSupplier(t: Tables, nation: String = "NATION_1"): DataFrame = {
    val l1 = t.lineitem.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val others = t.lineitem.select(col("l_orderkey").as("o2_orderkey"),
      col("l_suppkey").as("o2_suppkey"), col("l_shipdate").as("o2_shipdate"))
    val natSupp = t.supplier.select("s_suppkey", "s_name", "s_nationkey")
      .join(broadcast(t.nation.filter(col("n_name") === nation)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    l1.join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .join(others,
        col("o2_orderkey") === col("l_orderkey") &&
          col("o2_suppkey") =!= col("l_suppkey"), "left_semi")
      .join(others,
        col("o2_orderkey") === col("l_orderkey") &&
          col("o2_suppkey") =!= col("l_suppkey") &&
          col("o2_shipdate") >= col("l_shipdate"), "left_anti")
      .groupBy("s_name")
      .agg(countDistinct("l_orderkey").as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** Q22-style idle wealthy customers: balance above the (rounded)
    * average positive balance, with no orders at all. The scalar avg
    * broadcasts as a 1-row cross join; the NOT EXISTS is an anti-join
    * against just the orders key column. Rounding the threshold before
    * comparing keeps the boundary row set engine-exact.
    */
  def q22IdleCustomers(t: Tables): DataFrame = {
    val avgBal = t.customer.filter(col("c_acctbal") > 0)
      .agg(Rnd.round(avg("c_acctbal"), 2).as("avg_bal"))
    t.customer.select("c_custkey", "c_acctbal", "c_nationkey")
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(t.orders.select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(t.nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        Rnd.round(sum("c_acctbal"), 2).as("totacctbal"))
      .orderBy("n_name")
  }

  /** Top-k by sort+limit: Spark plans this as TakeOrderedAndProject —
    * per-partition top-k then a single driver merge; no full sort at
    * any scale.
    */
  def qTopkOrders(t: Tables): DataFrame =
    t.orders
      .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(10)

  /** Distinct: hash-agg on the projected column only (pruned scan). */
  def qDistinctSegments(t: Tables): DataFrame =
    t.customer.select("c_mktsegment").distinct().orderBy("c_mktsegment")

  /** UNION ALL + re-aggregation (distinct-by-group). Union is a no-op
    * plan-wise (no shuffle); the groupBy shuffles once on the key.
    */
  def qUnion(t: Tables): DataFrame = {
    val a = t.nation.filter(col("n_regionkey") === 0).select(col("n_nationkey").as("key"))
    val b = t.nation.filter(col("n_nationkey") < 10).select(col("n_nationkey").as("key"))
    a.unionAll(b).groupBy("key").agg(count(lit(1)).as("cnt")).orderBy("key")
  }

  /** EXCEPT (distinct): nation keys that have customers but no
    * suppliers. Planned as a left-anti join + distinct.
    */
  def qExcept(t: Tables): DataFrame =
    t.customer.select(col("c_nationkey").as("nkey"))
      .except(t.supplier.select(col("s_nationkey").as("nkey")))
      .orderBy("nkey")

  /** INTERSECT (distinct): nation keys with both customers and
    * suppliers — left-semi join + distinct.
    */
  def qIntersect(t: Tables): DataFrame =
    t.customer.select(col("c_nationkey").as("nkey"))
      .intersect(t.supplier.select(col("s_nationkey").as("nkey")))
      .orderBy("nkey")

  /** Windowed top-n per group: one shuffle on the partition key, then
    * an in-partition sort; the rn<=3 filter is pushed into the window
    * operator by Spark's LimitPushDown/WindowGroupLimit at scale.
    */
  def qWindowTopn(t: Tables): DataFrame = {
    t.orders
      .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey").orderBy(col("price").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** The same top-3-orders-per-customer selection as [[qWindowTopn]],
    * planned through the custom [[graft.plans.TopKPerGroup]] physical
    * operator instead of a window: bounded per-group heaps on both
    * sides of the exchange, so the shuffle carries ≤ 3 rows per
    * customer per upstream partition and nothing is sorted — the
    * 100 TB spelling of top-n. Same oracle family as q_window_topn
    * (identical rows, minus the rank column).
    */
  def qTopkPerGroup(t: Tables): DataFrame = {
    val base = t.orders
      .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
    graft.plans.TopKPerGroup(base, Seq("o_custkey"),
      Seq(col("price").desc, col("o_orderkey").asc), k = 3)
  }

  /** Running sum + moving average per customer over order date. The
    * frame order (o_orderdate, o_orderkey) is total → identical
    * accumulation order in any engine.
    */
  def qWindowRunning(t: Tables): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t.orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("running_spend", round(sum("o_totalprice").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .withColumn("moving_avg3", round(avg("o_totalprice").over(
        w.rowsBetween(-2, Window.currentRow)), 2))
      .select("o_custkey", "o_orderkey", "running_spend", "moving_avg3")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** lag/lead deltas per customer ordered by (date, key). */
  def qWindowLag(t: Tables): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t.orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("prev_price", round(lag("o_totalprice", 1).over(w), 2))
      .withColumn("delta", round(col("o_totalprice") - lag("o_totalprice", 1).over(w), 2))
      .select("o_custkey", "o_orderkey", "prev_price", "delta")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** RANGE-frame window: trailing-7-day spend per customer framed on
    * the VALUE of the order day (epoch-day int), so ties share a frame
    * and calendar gaps shrink it — the semantics ROWS frames can't
    * express. percent_rank/cume_dist ride the same pass for
    * rank-family coverage (deterministic under the unique
    * (price, orderkey) ordering). One shuffle on the partition key
    * serves all three window functions.
    */
  def qWindowRange(t: Tables): DataFrame = {
    val d = t.orders.select(col("o_custkey"), col("o_orderkey"),
      datediff(to_date(col("o_orderdate")), lit("1990-01-01").cast("date")).as("day"),
      col("o_totalprice"))
    val wr = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-6, 0)
    val wv = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    d.withColumn("spend_7d", round(sum("o_totalprice").over(wr), 2))
      .withColumn("pr", round(percent_rank().over(wv), 4))
      .withColumn("cd", round(cume_dist().over(wv), 4))
      .select("o_custkey", "o_orderkey", "day", "spend_7d", "pr", "cd")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** ROLLUP over (returnflag, linestatus): partial agg still applies;
    * the rollup expands to grouping sets in one pass (no re-scan).
    * NULL grouping keys are coalesced to 'ALL' for oracle stability.
    */
  def qRollup(t: Tables): DataFrame =
    t.lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("cnt"))
      .orderBy("rf", "ls")

  /** CUBE over (returnflag, linestatus) — all 4 grouping sets. */
  def qCube(t: Tables): DataFrame =
    t.lineitem
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum("l_extendedprice"), 2).as("sum_price"), count(lit(1)).as("cnt"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_price"), col("cnt"))
      .orderBy("rf", "ls")

  /** Explicit GROUPING SETS (distinct from rollup/cube): exactly the
    * named groupings in one pass, via the SQL surface.
    */
  /** View name unique per (session, corpus): the shared-session
    * service model runs concurrent requests over DIFFERENT corpora,
    * and a fixed name would let request B's registration swap the
    * table out from under request A's un-analyzed SQL — silent
    * wrong-corpus results. (__graft_-prefixed so user views survive.)
    */
  private def corpusView(t: Tables, base: String, df: DataFrame): String = {
    val name = s"${base}_${System.identityHashCode(t.spark)}_" +
      t.sfDir.replaceAll("[^A-Za-z0-9]", "_")
    df.createOrReplaceTempView(name)
    name
  }

  def qGroupingSets(t: Tables): DataFrame = {
    val v = corpusView(t, "__graft_gs_lineitem", t.lineitem)
    t.spark.sql(
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
         |       coalesce(l_linestatus, 'ALL') AS ls,
         |       count(*) AS cnt
         |FROM $v
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY rf, ls""".stripMargin)
  }

  /** ntile quartiles of customers by account balance + per-quartile
    * stats: one window pass for bucketing, one agg. An unpartitioned
    * ntile needs a global total order → one task holds the whole
    * input, so this form is scoped to dimension-sized tables;
    * qNtileScaled is the same bucketing without the global window for
    * fact-scale inputs.
    */
  def qNtile(t: Tables): DataFrame =
    t.customer
      .withColumn("quartile", ntile(4).over(
        Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)))
      .groupBy("quartile")
      .agg(count(lit(1)).as("n"),
        round(min("c_acctbal"), 2).as("lo"),
        round(max("c_acctbal"), 2).as("hi"))
      .orderBy("quartile")

  /** Quantile bucketing at fact scale: quartile cut points from ONE
    * exact-percentile aggregation (a 3-value broadcast row), bucket
    * assignment by comparison — a pure projection. No global total
    * order anywhere, so the plan is two hash aggs + a broadcast,
    * partition-parallel end to end. Buckets are value-cut rather than
    * exactly count-balanced (ties share a bucket) — the right trade
    * when the input doesn't fit one task.
    */
  def qNtileScaled(t: Tables): DataFrame = {
    val cuts = t.customer.agg(
      round(expr("percentile(c_acctbal, 0.25D)"), 2).as("q1"),
      round(expr("percentile(c_acctbal, 0.50D)"), 2).as("q2"),
      round(expr("percentile(c_acctbal, 0.75D)"), 2).as("q3"))
    t.customer.crossJoin(broadcast(cuts))
      .withColumn("quartile",
        lit(1) + when(col("c_acctbal") > col("q1"), 1).otherwise(0)
               + when(col("c_acctbal") > col("q2"), 1).otherwise(0)
               + when(col("c_acctbal") > col("q3"), 1).otherwise(0))
      .groupBy("quartile")
      .agg(count(lit(1)).as("n"),
        round(min("c_acctbal"), 2).as("lo"),
        round(max("c_acctbal"), 2).as("hi"))
      .orderBy("quartile")
  }

  /** first_value/last_value over an explicit full-partition frame:
    * each order annotated with its customer's first and latest order
    * keys by date.
    */
  def qFirstLast(t: Tables): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.orders.select("o_custkey", "o_orderkey", "o_orderdate")
      .withColumn("first_order", first("o_orderkey").over(w))
      .withColumn("last_order", last("o_orderkey").over(w))
      .select("o_custkey", "o_orderkey", "first_order", "last_order")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Pivot-style conditional aggregation: one scan, one agg — the
    * CASEs evaluate inside the partial agg (no per-status re-scan).
    */
  def qPivotStatus(t: Tables): DataFrame =
    t.orders
      .groupBy("o_orderpriority")
      .agg(
        round(sum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0.0)), 2).as("open_total"),
        round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0)), 2).as("done_total"),
        round(sum(when(col("o_orderstatus") === "P", col("o_totalprice")).otherwise(0.0)), 2).as("pending_total"),
        count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")

  /** True relational PIVOT (`RelationalGroupedDataset.pivot`) with an
    * explicit value list — one pass, no per-status re-scan, and the
    * fixed list keeps the output schema static (a valueless pivot
    * would run an extra distinct job and make the schema data-
    * dependent — wrong for a service contract). Complements
    * qPivotStatus, which is the conditional-agg formulation.
    */
  def qPivotWide(t: Tables): DataFrame =
    t.orders
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(round(sum("o_totalprice"), 2))
      .na.fill(0.0, Seq("O", "F", "P"))
      .select(col("o_orderpriority"), col("O").as("open_total"),
        col("F").as("done_total"), col("P").as("pending_total"))
      .orderBy("o_orderpriority")

  /** UNPIVOT (melt): the wide per-priority status counts back to long
    * (priority, status, n) rows via Spark's native `unpivot` — the
    * relational inverse of [[qPivotWide]]. Expand is a pure
    * projection: one row in, three out, no shuffle beyond the
    * feeding agg. Counts are integers, so the melt is engine-exact.
    */
  def qUnpivot(t: Tables): DataFrame = {
    val wide = t.orders.groupBy("o_orderpriority")
      .agg(
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_fulfilled"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_partial"))
    wide.unpivot(Array(col("o_orderpriority")),
        Array(col("n_open"), col("n_fulfilled"), col("n_partial")),
        "status", "n")
      .orderBy("o_orderpriority", "status")
  }

  /** CASE WHEN bucketing + aggregation over the bucket expression. */
  def qCaseWhen(t: Tables): DataFrame =
    t.lineitem
      .withColumn("bucket",
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("total"))
      .orderBy("bucket")

  /** Date/time extraction + agg over the events table. */
  def qEventsHourly(t: Tables): DataFrame =
    t.events
      .select(col("event_type"), hour(col("ts")).as("hr"), col("value"))
      .groupBy("event_type", "hr")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total_value"))
      .orderBy("event_type", "hr")

  /** OHLC resample: per (event_type, hour) open/high/low/close of the
    * value series. Open/close are min_by/max_by on the event time —
    * ONE hash agg with map-side partials, no window, no sort; the
    * standard financial-bar shape at fact scale. (Timestamps are
    * unique per group in this corpus; with ties, extend the ordering
    * key with a tiebreaker column.)
    */
  def qOhlc(t: Tables): DataFrame =
    t.events
      .select(col("event_type"), hour(col("ts")).as("hr"), col("value"), col("ts"))
      .groupBy("event_type", "hr")
      .agg(
        round(min_by(col("value"), col("ts")), 2).as("open"),
        round(max("value"), 2).as("high"),
        round(min("value"), 2).as("low"),
        round(max_by(col("value"), col("ts")), 2).as("close"),
        count(lit(1)).as("n"))
      .orderBy("event_type", "hr")

  /** String function suite: LIKE pushdown (StringContains reaches the
    * scan), substr/upper/concat stay codegen'd.
    */
  def qStringFuncs(t: Tables): DataFrame =
    t.part
      .filter(col("p_name").like("%a%"))
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        concat(col("p_type"), lit("/"), col("p_brand")).as("type_brand"),
        length(col("p_name")).as("name_len"))
      .orderBy("p_partkey")

  /** JSON extraction from a string column (events.props). */
  def qEventsJson(t: Tables): DataFrame =
    t.events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        coalesce(sum("k_val"), lit(0L)).as("k_sum"),
        round(avg("k_val"), 2).as("k_avg"))
      .orderBy("event_type")

  /** Deterministic mod-k sampling: the predicate is a pure function of
    * the key, so the sample is stable across engines and runs (unlike
    * TABLESAMPLE). Filter evaluates at the scan.
    */
  def qSampleMod(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_orderkey") % 10 === 0)
      .agg(count(lit(1)).as("n_rows"),
        round(sum("l_extendedprice"), 2).as("total"),
        round(avg("l_quantity"), 2).as("avg_qty"))

  /** CTE / multi-step SQL through spark.sql — exercises the same
    * SQL-service path the reference exposes (POST /sql).
    */
  def qSqlCte(t: Tables): DataFrame = {
    // register only what the query touches (registerAll reads 10
    // parquet footers; the service path registers on demand); names
    // are per-(session, corpus) — see corpusView
    val vo = corpusView(t, "__graft_cte_orders", t.orders)
    val vc = corpusView(t, "__graft_cte_customer", t.customer)
    t.spark.sql(
      s"""WITH spend AS (
         |  SELECT o_custkey, sum(o_totalprice) AS total
         |  FROM $vo GROUP BY o_custkey
         |)
         |SELECT c_mktsegment,
         |       count(*) AS n_cust,
         |       floor(avg(total) * 100 + 0.5) / 100 AS avg_spend
         |FROM $vc JOIN spend ON c_custkey = o_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin)
  }

  /** GROUP BY ALL (Spark 4 / DuckDB shared surface): every non-agg
    * select item groups implicitly — the analyst spelling that keeps
    * projection and grouping from drifting apart. Identical statement
    * in both engines.
    */
  def qGroupByAll(t: Tables): DataFrame = {
    val vl = corpusView(t, "__graft_gba_lineitem", t.lineitem)
    t.spark.sql(
      s"""SELECT l_returnflag, l_linestatus,
         |       count(*) AS n,
         |       floor(sum(l_quantity) * 100 + 0.5) / 100 AS qty
         |FROM $vl
         |GROUP BY ALL
         |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** RECURSIVE CTE (Spark 4's WITH RECURSIVE): key-doubling chains
    * over orders — each recursion level joins the frontier back to
    * the table (k → 2k edges), so the plan is a true iterative
    * fixpoint, not an unrolled union. Bounded by construction: odd
    * start keys ≤ 64, depth ≤ log2(maxkey). At scale each level is
    * one equi-join on the (pruned) key column; the recursion carries
    * only the live frontier, never the table. Depth is CAPPED (12) as
    * declared semantics: unbounded recursion is a production hazard —
    * every level is one column-pruned scan + broadcast-frontier join,
    * so the cap bounds total work at any corpus size.
    */
  def qRecursiveCte(t: Tables): DataFrame = {
    val vo = corpusView(t, "__graft_rec_orders", t.orders)
    t.spark.sql(
      s"""WITH RECURSIVE chain(start_k, k, depth) AS (
         |  SELECT o_orderkey, o_orderkey, 0
         |  FROM $vo WHERE o_orderkey % 2 = 1 AND o_orderkey <= 64
         |  UNION ALL
         |  SELECT c.start_k, o.o_orderkey, c.depth + 1
         |  FROM chain c JOIN $vo o ON o.o_orderkey = c.k * 2
         |  WHERE c.depth < 12
         |)
         |SELECT start_k, max(depth) AS chain_len, count(*) AS n_nodes
         |FROM chain GROUP BY start_k ORDER BY start_k""".stripMargin)
  }

  /** LATERAL correlated subquery: per-nation top-2 suppliers by
    * account balance through `, LATERAL (… ORDER BY … LIMIT 2)` — the
    * SQL spelling of the per-group top-n every dashboard wants, planned
    * as a lateral join (DuckDB runs the identical statement). Ties
    * break on s_suppkey so both engines pick the same rows.
    */
  def qLateralTopn(t: Tables): DataFrame = {
    val vn = corpusView(t, "__graft_lat_nation", t.nation)
    val vs = corpusView(t, "__graft_lat_supplier", t.supplier)
    t.spark.sql(
      s"""SELECT n.n_name, top.s_name,
         |       floor(top.s_acctbal * 100 + 0.5) / 100 AS bal
         |FROM $vn n,
         |LATERAL (
         |  SELECT s_name, s_acctbal FROM $vs s
         |  WHERE s.s_nationkey = n.n_nationkey
         |  ORDER BY s_acctbal DESC, s_name LIMIT 2
         |) top
         |ORDER BY n.n_name, bal DESC, top.s_name""".stripMargin)
  }

  /** Conditional distinct counts: distinct customers per order status
    * from ONE pass (count(DISTINCT CASE ...)) — no per-status
    * re-scan, the expand+distinct machinery handles all three.
    */
  def qDistinctCond(t: Tables): DataFrame =
    t.orders.agg(
      countDistinct(when(col("o_orderstatus") === "O", col("o_custkey"))).as("open_custs"),
      countDistinct(when(col("o_orderstatus") === "F", col("o_custkey"))).as("done_custs"),
      countDistinct(when(col("o_orderstatus") === "P", col("o_custkey"))).as("pending_custs"),
      countDistinct(col("o_custkey")).as("all_custs"))

  /** Z-score anomaly detection over events: per-type mean/stddev from
    * one partial-agg'd pass, broadcast back (tiny per-type stats), a
    * pure-projection score, and a threshold filter. The canonical
    * two-pass outlier scan — no window over the full stream.
    */
  def qAnomaly(t: Tables, threshold: Double = 2.5): DataFrame = {
    val stats = t.events.groupBy(col("event_type").as("s_type"))
      .agg(avg("value").as("mu"), stddev_samp("value").as("sd"))
    t.events.select("event_id", "event_type", "value")
      .join(broadcast(stats), col("event_type") === col("s_type"))
      .filter(col("sd") > 0)
      // threshold the ROUNDED z: engines' stddev accumulation orders
      // differ by ~1e-12 and an unrounded boundary compare could flip
      .withColumn("z", round((col("value") - col("mu")) / col("sd"), 2))
      .filter(abs(col("z")) >= threshold)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"), col("z"))
      .orderBy("event_id")
  }

  /** Cohort retention: users grouped by first-activity day, counted by
    * days-since-cohort activity. Two hash-aggs (first-seen per user,
    * then cohort×offset) — both partial-agg'd; day arithmetic on
    * epoch-days keeps the output integer-typed and engine-portable.
    */
  def qCohortRetention(t: Tables): DataFrame = {
    val withDay = t.events.select(col("user_id"),
      floor(unix_micros(col("ts")) / lit(86400000000L)).as("day"))
    val cohorts = withDay.groupBy("user_id").agg(min("day").as("cohort_day"))
    withDay.join(cohorts, "user_id")
      .withColumn("day_offset", (col("day") - col("cohort_day")).cast("int"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Fixed-width histogram of order totals: bucket index is a pure
    * projection (no per-bucket scan), one hash-agg over ≤ nBuckets
    * groups. The fixed [lo, hi) domain keeps the bucketing a
    * constant-folded expression — at 100 TB a two-pass min/max +
    * histogram still beats any sort-based approach.
    */
  def qHistogram(t: Tables, lo: Double = 0.0, hi: Double = 600000.0,
      nBuckets: Int = 12): DataFrame = {
    val w = (hi - lo) / nBuckets
    t.orders
      .select(least(greatest(floor((col("o_totalprice") - lo) / w), lit(0)),
        lit(nBuckets - 1).cast("long")).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")
  }

  /** Time-series resample with gap filling: the observed (type, hour)
    * grid densified to every hour in the day via a generated
    * dimension (sequence → explode, no driver loop), left-joined to
    * the sparse aggregates, missing buckets zero-filled. The dense
    * grid is |types|·24 rows — broadcast side; the fact aggregates
    * once.
    */
  def qResample(t: Tables): DataFrame = {
    val sparse = t.events
      .select(col("event_type"), hour(col("ts")).as("hr"), col("value"))
      .groupBy("event_type", "hr")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total_value"))
    val grid = t.events.select("event_type").distinct()
      .crossJoin(t.events.sparkSession.range(0, 24).select(col("id").cast("int").as("hr")))
    grid.join(sparse, Seq("event_type", "hr"), "left_outer")
      .select(col("event_type"), col("hr"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy("event_type", "hr")
  }

  /** Ordered-event funnel: per user, did view → (later) click →
    * (later) purchase happen? Stage membership from min event times
    * per type — one aggregation, no self-joins; the stage comparison
    * is a pure projection. Output: users entering each stage.
    */
  def qFunnel(t: Tables): DataFrame = {
    val perUser = t.events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tu"))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("tu"))).as("t_view"),
        min(when(col("event_type") === "click", col("tu"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("tu"))).as("t_purchase"))
    perUser.agg(
      count(lit(1)).as("n_users"),
      count(col("t_view")).as("n_view"),
      sum(when(col("t_click") > col("t_view"), 1L).otherwise(0L)).as("n_view_click"),
      sum(when(col("t_click") > col("t_view") &&
        col("t_purchase") > col("t_click"), 1L).otherwise(0L)).as("n_full_funnel"))
  }

  /** Statistical aggregates: sample stddev/variance + correlation and
    * covariance between quantity and price per group. All one-pass
    * mergeable aggregates (Welford-style buffers) — partial agg
    * applies, same as sum/avg, at any scale.
    */
  def qStatsAgg(t: Tables): DataFrame =
    t.lineitem
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 2).as("sd_qty"),
        round(var_samp(col("l_discount")), 4).as("var_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qty_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Exact interpolated percentiles per group (Spark `percentile` =
    * continuous quantile, same interpolation as DuckDB quantile_cont).
    * Exact percentile buffers per-group sorted state — fine for the
    * oracle-able small-group form here; `qPercentileApprox` below is
    * the sketch path that actually scales.
    */
  def qPercentile(t: Tables): DataFrame =
    t.lineitem
      .groupBy("l_returnflag")
      .agg(
        round(percentile(col("l_extendedprice"), lit(0.5)), 2).as("p50"),
        round(percentile(col("l_extendedprice"), lit(0.95)), 2).as("p95"),
        round(percentile(col("l_quantity"), lit(0.5)), 2).as("qty_p50"))
      .orderBy("l_returnflag")

  /** Percentiles via the Greenwald-Khanna sketch (approx_percentile) —
    * the 100 TB form of qPercentile: a fixed-size mergeable summary
    * per group (error ≤ 1/accuracy in RANK), so partial aggregation
    * collapses map-side and the shuffle carries sketches, never the
    * per-group value multiset that exact percentile sorts.
    *
    * DuckDB-oracled as a BOUND-VERIFICATION REPLAY: the sketch's
    * chosen values (engine-specific, not SQL-reproducible) are
    * exported as the decision table; both engines then independently
    * recompute each value's exact rank span over the raw rows and
    * emit the GK guarantee as `*_ok` flags — rank(v) must land within
    * n/accuracy of the target rank. Hash equality therefore proves
    * the estimates satisfy their contract against DuckDB's own exact
    * ranks, not just that Spark agrees with itself. The audit join
    * broadcasts the 3-row decision table; the per-group conditional
    * counts partial-aggregate map-side, so the audit adds one scan
    * and no extra shuffle at any scale.
    */
  def qPercentileApprox(t: Tables, accuracy: Int = 10000): DataFrame = {
    val est = t.lineitem
      .groupBy("l_returnflag")
      .agg(
        approx_percentile(col("l_extendedprice"), lit(0.5), lit(accuracy)).as("v50"),
        approx_percentile(col("l_extendedprice"), lit(0.95), lit(accuracy)).as("v95"),
        approx_percentile(col("l_quantity"), lit(0.5), lit(accuracy)).as("vq50"))
    val decided = graft.util.OracleExports.materialize(est, "pct_sketch")
    val audit = t.lineitem
      .join(broadcast(decided), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") <= col("v50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("l_extendedprice") < col("v50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("l_extendedprice") <= col("v95"), 1L).otherwise(0L)).as("le95"),
        sum(when(col("l_extendedprice") < col("v95"), 1L).otherwise(0L)).as("lt95"),
        sum(when(col("l_quantity") <= col("vq50"), 1L).otherwise(0L)).as("leq50"),
        sum(when(col("l_quantity") < col("vq50"), 1L).otherwise(0L)).as("ltq50"))
    // GK contract: some rank in (lt, le] is within n/accuracy of the
    // target rank p·n (+1 absorbs the floor/ceil convention of the
    // target index). Both engines evaluate the same double formula.
    def ok(le: String, lt: String, p: Double) = {
      val eps = col("n") / accuracy + lit(1.0)
      (col(le) >= col("n") * p - eps) && (col(lt) <= col("n") * p + eps)
    }
    decided.join(audit, "l_returnflag")
      .select(col("l_returnflag"),
        round(col("v50"), 2).as("p50"),
        round(col("v95"), 2).as("p95"),
        round(col("vq50"), 2).as("qty_p50"),
        col("n"),
        ok("le50", "lt50", 0.5).as("p50_ok"),
        ok("le95", "lt95", 0.95).as("p95_ok"),
        ok("leq50", "ltq50", 0.5).as("qty_ok"))
      .orderBy("l_returnflag")
  }

  /** Distinct-user rollup via Apache DataSketches HLL — the
    * RE-AGGREGATABLE form of count-distinct. The inner agg builds one
    * fixed-size sketch per (event_type, day); the outer
    * `hll_union_agg` merges day sketches into the per-type total
    * WITHOUT touching raw events again. That union step is the whole
    * point at 100 TB: materialize per-partition-date sketches once,
    * then answer any date-window distinct question by merging KB-sized
    * summaries — `approx_count_distinct` (qApproxDistinct) gives one
    * number, a stored sketch gives every rollup for free. Per-day and
    * overall estimates land in one result so the spec can bound both
    * against exact.
    *
    * DuckDB-oracled as a BOUND-VERIFICATION REPLAY (the sketch bytes
    * and estimator are engine-specific — DataSketches HLL_4): the
    * estimates are exported as the decision table; both engines
    * recompute the exact distinct counts from raw events and emit
    * within-bound flags (lgK=12 → 3σ relative error ≈ 4.9%, +3
    * absolute slack for the near-exact sparse regime). The exact
    * audit is itself the scalable shape — distinct (type,user) /
    * (type,day,user) hash-aggs, partial-combined map-side.
    */
  def qHllSketch(t: Tables): DataFrame = {
    val typed = t.events
      .select(col("event_type"), dayofmonth(col("ts")).as("day"), col("user_id"))
    val daily = typed
      .groupBy("event_type", "day")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sketch"),
        count(lit(1)).as("n_events"))
    val est = daily.groupBy("event_type")
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
          .cast("long").as("est_users_total"),
        sum(when(col("day") <= 7,
          hll_sketch_estimate(col("sketch"))).otherwise(lit(0)))
          .cast("long").as("est_user_days_wk1"),
        sum("n_events").as("n_events"))
    val decided = graft.util.OracleExports.materialize(est, "hll_sketch")
    val exact = typed.groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("ex_total"),
        countDistinct(when(col("day") <= 7,
          struct(col("day"), col("user_id")))).as("ex_wk1"))
    def ok(e: String, x: String) =
      abs(col(e) - col(x)) <= greatest(col(x) * 0.049, lit(3.0))
    decided.join(exact, "event_type")
      .select(col("event_type"), col("est_users_total"),
        col("est_user_days_wk1"), col("n_events"),
        ok("est_users_total", "ex_total").as("total_ok"),
        ok("est_user_days_wk1", "ex_wk1").as("wk1_ok"))
      .orderBy("event_type")
  }

  /** Re-aggregatable QUANTILES via stored KLL sketches — the quantile
    * twin of [[qHllSketch]]'s stored-HLL distinct rollup:
    * `approx_percentile`'s GK summary answers one query and is gone,
    * while a KLL sketch per (event_type, day) is materialized ONCE
    * and answers any later quantile question over any date window by
    * merging KB-sized summaries (`kll_merge_agg`), never re-touching
    * raw events. DuckDB-oracled as a BOUND-VERIFICATION REPLAY like
    * q_percentile_approx: the merged sketches' chosen values export
    * as the decision; both engines recompute each value's exact rank
    * span over raw rows and hash-compare the within-bound flags
    * (k=200 → ~1.65% normalized rank error at 99% confidence; the
    * audit allows 3% + 1).
    */
  def qKllQuantiles(t: Tables): DataFrame = {
    import graft.functions.GraftFunctions.{kllMergeAgg, kllSketchAgg, kllValue}
    val typed = t.events
      .select(col("event_type"), dayofmonth(col("ts")).as("day"), col("value"))
    val daily = typed.groupBy("event_type", "day")
      .agg(kllSketchAgg(col("value")).as("sk"))
    val est = daily.groupBy("event_type")
      .agg(kllValue(kllMergeAgg(col("sk")), 0.5).as("v50"),
        kllValue(kllMergeAgg(col("sk")), 0.95).as("v95"))
    val decided = graft.util.OracleExports.materialize(est, "kll_sketch")
    val audit = typed.join(broadcast(decided), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") <= col("v50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("value") < col("v50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("value") <= col("v95"), 1L).otherwise(0L)).as("le95"),
        sum(when(col("value") < col("v95"), 1L).otherwise(0L)).as("lt95"))
    def ok(le: String, lt: String, p: Double) = {
      val eps = col("n") * 0.03 + lit(1.0)
      (col(le) >= col("n") * p - eps) && (col(lt) <= col("n") * p + eps)
    }
    decided.join(audit, "event_type")
      .select(col("event_type"),
        round(col("v50"), 4).as("p50"), round(col("v95"), 4).as("p95"),
        col("n"),
        ok("le50", "lt50", 0.5).as("p50_ok"),
        ok("le95", "lt95", 0.95).as("p95_ok"))
      .orderBy("event_type")
  }

  /** Audience OVERLAP via Theta sketches — distinct-count sketches
    * closed under SET ALGEBRA, the operation HLL structurally cannot
    * do: per (event_type, period-half) sketches of user_id intersect
    * (`theta_intersect_agg`) into "distinct users active in BOTH
    * halves" and union into "active in either", without shuffling raw
    * ids a second time — retention/overlap at 100 TB from stored
    * KB-sized sketches. lgK=14 keeps the sketch EXACT below 16k
    * distincts per cell and ~0.8%-error beyond. DuckDB-oracled as a
    * bound-verification replay (estimates export; both engines
    * recompute exact overlap from raw rows; flags hash-compare).
    */
  def qThetaOverlap(t: Tables): DataFrame = {
    import graft.functions.GraftFunctions.{thetaANotB, thetaEstimate, thetaIntersectAgg, thetaSketchAgg, thetaUnionAgg}
    val typed = t.events
      .select(col("event_type"),
        when(dayofmonth(col("ts")) <= 7, 0).otherwise(1).as("half"),
        col("user_id"))
    val halves = typed.groupBy("event_type", "half")
      .agg(thetaSketchAgg(col("user_id"), 14).as("sk"))
    // intersection + union re-aggregate the sketch rows; CHURN (in the
    // first half, gone in the second — the A\B difference) applies the
    // scalar theta_anotb to the half sketches side by side
    val wide = halves.groupBy("event_type")
      .agg(first(when(col("half") === 0, col("sk")), ignoreNulls = true).as("sk1"),
        first(when(col("half") === 1, col("sk")), ignoreNulls = true).as("sk2"))
    // a type with rows in only ONE half has a null sketch for the
    // other — coalesce to the empty sketch (estimate 0) so A\B stays
    // arithmetic ("everyone minus nobody" / "nobody minus everyone")
    // instead of null-propagating where the oracle computes a number
    val emptySk = lit(graft.functions.DsImpl.emptyThetaBytes)
    val est = halves.groupBy("event_type")
      // the intersect agg only sees the sketch rows that EXIST — for a
      // single-half type it returns that half's sketch (∩ of one
      // input), but "active in both halves" is 0 when a half is
      // absent; the half count guards it. Union needs no guard: ∪
      // with a missing half is just the present half.
      .agg(when(count(col("sk")) === 2,
          thetaEstimate(thetaIntersectAgg(col("sk"))))
        .otherwise(lit(0.0)).cast("long").as("est_both"),
        thetaEstimate(thetaUnionAgg(col("sk"), 14)).cast("long").as("est_any"))
      .join(wide.select(col("event_type"),
        thetaEstimate(thetaANotB(coalesce(col("sk1"), emptySk),
          coalesce(col("sk2"), emptySk))).cast("long").as("est_gone")),
        "event_type")
    val decided = graft.util.OracleExports.materialize(est, "theta_overlap")
    val exact = typed.groupBy("event_type", "user_id")
      .agg(max(when(col("half") === 0, 1).otherwise(0)).as("h1"),
        max(when(col("half") === 1, 1).otherwise(0)).as("h2"))
      .groupBy("event_type")
      .agg(sum(when(col("h1") === 1 && col("h2") === 1, 1L).otherwise(0L)).as("ex_both"),
        count(lit(1)).as("ex_any"),
        sum(when(col("h1") === 1 && col("h2") === 0, 1L).otherwise(0L)).as("ex_gone"))
    def ok(e: String, x: String) =
      abs(col(e) - col(x)) <= greatest(col(x) * 0.05, lit(3.0))
    decided.join(exact, "event_type")
      .select(col("event_type"), col("est_both"), col("est_any"), col("est_gone"),
        ok("est_both", "ex_both").as("both_ok"),
        ok("est_any", "ex_any").as("any_ok"),
        ok("est_gone", "ex_gone").as("gone_ok"))
      .orderBy("event_type")
  }

  /** Set aggregation to a canonical string: collect_set → sort →
    * join. Bounded cardinality (3 statuses) — safe per-group state;
    * unbounded-domain versions belong in approx sketches.
    */
  def qCollectStatuses(t: Tables): DataFrame =
    t.orders
      .groupBy("o_custkey")
      .agg(array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  /** Approximate distinct via HLL++. At 100 TB this is the only sane
    * distinct-count: fixed-size sketches merge in the partial agg, no
    * shuffle of raw keys.
    *
    * DuckDB-oracled as a BOUND-VERIFICATION REPLAY: the estimates are
    * exported as the decision table; both engines recompute the exact
    * distinct counts from raw rows and emit within-bound flags
    * (rsd=0.02 → 3σ ≈ 6%). Hash equality proves the HLL++ estimates
    * hold against DuckDB's own exact counts.
    */
  def qApproxDistinct(t: Tables): DataFrame = {
    val est = t.lineitem.agg(
      approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
      count(lit(1)).as("n_rows"))
    val decided = graft.util.OracleExports.materialize(est, "approx_distinct")
    val exact = t.lineitem.agg(
      countDistinct(col("l_partkey")).as("ex_parts"),
      countDistinct(col("l_orderkey")).as("ex_orders"))
    decided.crossJoin(broadcast(exact))
      .select(col("approx_parts"), col("approx_orders"), col("n_rows"),
        (abs(col("approx_parts") - col("ex_parts")) <= col("ex_parts") * 0.06)
          .as("parts_ok"),
        (abs(col("approx_orders") - col("ex_orders")) <= col("ex_orders") * 0.06)
          .as("orders_ok"))
  }
}
