package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Batch sessionization (SURVEY.md §2.1): gap-based sessions via
  * window lag + a running sum of session-break flags. One shuffle on
  * user_id; within a partition everything is a single sort + two
  * window passes. The streaming equivalent (flatMapGroupsWithState)
  * lives in graft.streaming.EventStreams.
  */
object Sessionize {

  /** Events → per-session rollup. `gapSec` defines a session break.
    * Epochs are floored to whole seconds so the DuckDB oracle (double
    * epochs) agrees exactly.
    */
  def qSessionize(t: Tables, gapSec: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = t.events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("ts").cast("timestamp").cast("long").as("epoch_s"))
      .withColumn("gap", col("epoch_s") - lag("epoch_s", 1).over(byUser))
      .withColumn("is_new", when(col("gap").isNull || col("gap") > gapSec, 1).otherwise(0))
      .withColumn("session_seq", sum("is_new").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        (max("epoch_s") - min("epoch_s")).as("dur_sec"))
      .orderBy("user_id", "session_seq")
  }

  /** The same sessions via Spark's NATIVE session_window (3.2+): one
    * hash-agg whose grouping key is the merging session window —
    * Catalyst plans UpdatingSessionsExec + MergingSessionsExec, no
    * hand-rolled lag/flag/running-sum windows, and the identical
    * construction is legal under `groupBy` in a stream (see
    * EventStreams.sessionCounts). Oracled against the gaps-and-islands
    * SQL at microsecond precision; a session breaks when the gap
    * reaches `gapSec` EXACTLY (the window's end is exclusive), which
    * is why the oracle's break test is >=, not > as in [[qSessionize]].
    */
  def qSessionWindow(t: Tables, gapSec: Long = 1800): DataFrame =
    t.events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSec seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("sw.start").cast("long").as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")
}
