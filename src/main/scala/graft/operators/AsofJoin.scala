package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Rnd.round

import graft.sources.Tables

/** As-of (merge-asof) join — for each left row, the latest right row
  * with right.time <= left.time within the same key. Spark has no
  * native operator for this; a naive inequality join is O(n·m) per
  * key. This is the scalable composition: tag both sides, union,
  * one shuffle on key, one in-partition sort, and a running
  * last-non-null window — O((n+m) log(n+m)) per key, no join
  * explosion, AQE-skew-splittable like any window.
  */
object AsofJoin {

  /** Generic as-of join. Output = every left column, plus
    * `asof_time` (the matched right row's time) and `asof_<p>` for
    * each payload column — all null when no right row precedes the
    * left row. The right payload travels as one struct, so a null
    * payload FIELD doesn't make the window skip to an older right row
    * (exact ASOF semantics). At equal timestamps the right row wins
    * (inclusive `<=`), matching SQL `ASOF JOIN ... ON l.t >= r.t`.
    *
    * Determinism assumption (same one q_ohlc documents): right-side
    * (key, time) pairs are unique. Two right rows at the SAME instant
    * have no defined winner — this window and DuckDB's native ASOF
    * each pick arbitrarily, so the oracle compare would flake.
    * Verified to hold for purchase events at every driver SF;
    * pre-aggregate the right side if an upstream feed can tie.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String]): DataFrame = {
    val internal = Seq("__graft_side", "__graft_p", "__graft_m")
    val outCols = "asof_time" +: payload.map(p => s"asof_$p")
    val clash = left.columns.toSet.intersect((internal ++ outCols).toSet)
    require(clash.isEmpty, s"left columns collide with asofJoin internals: $clash")
    val pStruct = struct(col(time).as("_t") +: payload.map(col): _*)
    // a NULL-time right row can never satisfy `right.time <= left.time`
    // — unfiltered it would sort FIRST (nulls-first asc) and become a
    // phantom match for every left row with no true predecessor
    // (asof_time null yet payload populated)
    val r = right.filter(col(time).isNotNull)
      .select(col(key), col(time), pStruct.as("__graft_p"))
      .withColumn("__graft_side", lit(0))
    val l = left.withColumn("__graft_side", lit(1))
      .withColumn("__graft_p", lit(null).cast(r.schema("__graft_p").dataType))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal time → inclusive match
    val w = Window.partitionBy(key).orderBy(col(time).asc, col("__graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__graft_m", last(col("__graft_p"), ignoreNulls = true).over(w))
      .filter(col("__graft_side") === 1)
    val out = matched.withColumn("asof_time", col("__graft_m._t"))
    payload.foldLeft(out)((df, p) => df.withColumn(s"asof_$p", col(s"__graft_m.$p")))
      .drop(internal: _*)
  }

  /** As-of query over events: each event joined to the user's most
    * recent (prior-or-simultaneous) purchase — time-to-last-purchase
    * and its value. Timestamps compared at exact microseconds.
    */
  def qAsofJoin(t: Tables): DataFrame = {
    val ev = t.events.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("tu"), col("event_type"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tu"), col("value"))
    asofJoin(ev, purchases, key = "user_id", time = "tu", payload = Seq("value"))
      .select(col("event_id"), col("user_id"),
        (col("tu") - col("asof_time")).as("gap_us"),
        round(col("asof_value"), 2).as("p_value"))
      .orderBy("event_id")
  }

  /** The SAME join written the way a SQL user would — through the
    * `asof_join` TVF over registered views (no DataFrame API anywhere)
    * — sharing [[qAsofJoin]]'s DuckDB native-ASOF oracle: both paths
    * must hash-match the identical decision set.
    */
  def qAsofTvf(t: Tables): DataFrame = {
    val ev = t.events.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("tu"), col("event_type"), col("value"))
    ev.createOrReplaceTempView("__graft_asof_ev")
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tu"), col("value"))
      .createOrReplaceTempView("__graft_asof_p")
    t.spark.sql(
      """SELECT event_id, user_id, tu - asof_time AS gap_us,
        |  floor(asof_value * 100 + 0.5) / 100 AS p_value
        |FROM asof_join('__graft_asof_ev', '__graft_asof_p',
        |               'user_id', 'tu', 'value')
        |ORDER BY event_id""".stripMargin)
  }
}
