package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Banded range (interval) join. A raw inequality join
  * (`a.t BETWEEN b.lo AND b.hi`) gives Spark no equi-key → nested-loop
  * per key or worse. Banding quantizes time into fixed buckets and
  * joins on (key, bucket) for each bucket the interval overlaps — an
  * equi-join Catalyst shuffles/broadcasts normally, with the exact
  * range predicate applied after. Candidate volume is
  * |intervals| · (span/bucket + 1), independent of table sizes'
  * product.
  */
object RangeJoin {

  /** Events within `windowSec` AFTER an error event of the same user
    * (error-impact attribution). Left: error events (interval start);
    * right: all events. Bucket = windowSec, so each interval overlaps
    * ≤ 2 buckets → the right side joins on (user, bucket) with the
    * error side exploded to its 2 bucket ids.
    */
  def qRangeJoin(t: Tables, windowSec: Long = 300): DataFrame = {
    val ev = t.events.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("tu"), col("event_type"))
    val win = windowSec * 1000000L
    // integer division (DIV) — a double roundtrip would be inexact in
    // the general case and floor() differs for negatives
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("tu").as("err_tu"))
      .withColumn("bucket", explode(array(expr(s"err_tu DIV $win"),
        expr(s"err_tu DIV $win") + 1)))
    val candidates = ev
      .withColumn("bucket", expr(s"tu DIV $win"))
      .join(errors, Seq("user_id", "bucket"))
    candidates
      .filter(col("tu") > col("err_tu") && col("tu") <= col("err_tu") + win)
      .groupBy("err_id")
      .agg(count(lit(1)).as("n_after"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"))
      .orderBy("err_id")
  }

  /** The NAIVE SQL spelling of a pure range join — no user key, no
    * hand bucketing: every event (any user) within the window after
    * each error, written as `a.tu > e.err_tu AND a.tu <= e.err_tu +
    * win`. Stock Spark can only nested-loop this;
    * [[graft.plans.RangeJoinRewrite]] bins it into an equi-join
    * (PlanAuditSpec's no-nested-loop sweep enforces that the rule
    * actually fired). The bin-size conf lives in a CHILD SESSION
    * scoped to this query: executions DERIVED from the returned frame
    * (`count()`, `write` — each builds a fresh QueryExecution from the
    * analyzed plan) re-run the optimizer and must still see the conf,
    * yet a 300s-derived bin must not silently become every later range
    * join's plan in the caller's session. A set-then-restore around a
    * pinned optimizedPlan satisfies only the pinned execution — the
    * derived ones re-optimize after the restore and silently fall back
    * to the nested loop (measured: 0.4 s → 12 s at sf0.1, still
    * oracle-exact, which is why only the bench caught it).
    */
  def qRangeJoinSql(t: Tables, windowSec: Long = 300): DataFrame = {
    val s2 = t.spark.newSession()
    graft.plans.RangeJoinRewrite.install(s2)
    s2.conf.set(graft.plans.RangeJoinRewrite.BinSizeConf,
      (windowSec * 1000000L).toString)
    val t2 = Tables(s2, t.sfDir)
    t2.events.select(col("event_id"), unix_micros(col("ts")).as("tu"),
        col("event_type"))
      .createOrReplaceTempView("__graft_rj_ev")
    s2.sql(
      s"""SELECT e.err_id, count(*) AS n_after,
         | sum(CASE WHEN a.event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchases
         |FROM (SELECT event_id AS err_id, tu AS err_tu FROM __graft_rj_ev
         |      WHERE event_type = 'error') e
         |JOIN __graft_rj_ev a
         |  ON a.tu > e.err_tu AND a.tu <= e.err_tu + ${windowSec * 1000000L}
         |GROUP BY e.err_id ORDER BY e.err_id""".stripMargin)
  }
}
