package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Table profiling + declarative data-quality constraints — the
  * ingest-hygiene pair every large-scale pipeline runs before (and
  * after) a batch lands. Both produce small long-form reports off a
  * bounded number of scans, so they attach to a 100 TB table the same
  * way they attach to the test tables.
  */
object Profile {

  /** One row per column: rows, nulls, distinct count, min/max (string
    * form). All per-column aggregates evaluate in ONE aggregation over
    * one scan; the long-form pivot is a driver-free explode of a
    * single assembled row.
    *
    * `approx=false` uses exact count(DISTINCT) — Spark plans the
    * multi-column distinct via Expand (input ×N columns), which is the
    * oracle-able form. At 100 TB run `approx=true`: HLL++ sketches
    * replace the distincts, the Expand disappears, and the profile is
    * a true single pass with KB-sized agg state (the plan-shape spec
    * asserts the Expand-free plan).
    */
  def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val cols = df.schema.fieldNames.toSeq
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        (if (approx) approx_count_distinct(col(c)) else countDistinct(col(c)))
          .as(s"${c}__ndv"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__ndv").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }
    one.select(explode(array(entries: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** Contract query: exact profile of `orders`. */
  def qProfile(t: Tables): DataFrame = profile(t.orders)

  /** A named data-quality constraint: `violation` marks BAD rows. */
  final case class Check(name: String, violation: Column)

  /** Evaluate row-level constraints in one conditional-agg pass:
    * (constraint_name, n_rows, n_violations, pass). No per-constraint scan
    * — each check is a when() inside the same aggregation.
    */
  def checkConstraints(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.map(c =>
      sum(when(c.violation, 1L).otherwise(0L)).as(s"${c.name}__v"))
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = checks.map { c =>
      struct(lit(c.name).as("constraint_name"), col("__n").as("n_rows"),
        col(s"${c.name}__v").as("n_violations"),
        (col(s"${c.name}__v") === 0L).as("pass"))
    }
    one.select(explode(array(entries: _*)).as("r")).select("r.*")
      .orderBy("constraint_name")
  }

  /** Uniqueness of a key: rows minus distinct keys (0 = unique). */
  def uniquenessViolations(df: DataFrame, key: String): DataFrame =
    df.agg((count(lit(1)) - countDistinct(col(key))).as("n_violations"))

  /** Referential integrity: child keys with no parent — a left-anti
    * join, counted. Null child keys are orphans by definition here
    * (they reference nothing), counted separately by a not-null check.
    */
  def orphanCount(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey)),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))

  /** Contract query: a constraint suite over lineitem + the two
    * multi-row checks (order-key uniqueness in orders, lineitem→orders
    * referential integrity), unioned into one report. The row-level
    * block is one scan of lineitem; uniqueness is one agg of orders;
    * the referential check is a semi-anti join that broadcasts nothing
    * and shuffles both sides on the key once.
    */
  def qConstraints(t: Tables): DataFrame = {
    val rowLevel = checkConstraints(t.lineitem, Seq(
      Check("lineitem_orderkey_not_null", col("l_orderkey").isNull),
      Check("lineitem_discount_in_range", !col("l_discount").between(0.0, 1.0)),
      Check("lineitem_quantity_positive", col("l_quantity") <= 0),
      Check("lineitem_price_positive", col("l_extendedprice") <= 0),
      Check("lineitem_ship_after_1994", col("l_shipdate") < lit("1994-01-01").cast("timestamp_ntz"))))
    val uniq = uniquenessViolations(t.orders, "o_orderkey")
      .select(lit("orders_orderkey_unique").as("constraint_name"),
        lit(null).cast("long").as("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
    val ref = orphanCount(t.lineitem, "l_orderkey", t.orders, "o_orderkey")
      .select(lit("lineitem_orders_ref_integrity").as("constraint_name"),
        lit(null).cast("long").as("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
    rowLevel.unionByName(uniq).unionByName(ref).orderBy("constraint_name")
  }
}
