package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Ingest drift monitoring: Population Stability Index between two
  * time windows of the event stream, per event type — the check a
  * long-running pipeline runs on every new batch ("did yesterday's
  * value distribution move?"). Fixed-width bins + smoothed shares
  * (the standard PSI recipe; add-0.5 per bin so empty bins are
  * finite), windows split deterministically by epoch-day parity so
  * the oracle reproduces the split. Per-bin contributions quantize to
  * integer 1e-8ths before summing — the same order-independence trick
  * as the NB/LM scorers — so the PSI is engine-exact. Everything is
  * two hash aggs + a tiny type×bin grid join; nothing scales with row
  * count but the first agg.
  *
  * Reading: PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 act.
  */
object Drift {

  def qDrift(t: Tables, binWidth: Double = 50.0, bins: Int = 10): DataFrame =
    // win derives inline — one scan of events, not a ref/cur split
    // that unions two scans back together
    psiOfBinned(t.events.select(col("event_type"),
      (datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) % 2).as("win"),
      binCol(binWidth, bins)), bins)

  /** Fixed-width clamped value bin — shared by the batch query and
    * streaming gates. */
  def binCol(binWidth: Double, bins: Int) =
    least(lit(bins - 1), greatest(lit(0),
      floor(col("value") / binWidth).cast("int"))).as("bin")

  /** PSI of `cur` against `ref`, both (event_type, bin) frames — the
    * generic core [[qDrift]] window-splits into and a streaming gate
    * calls per micro-batch against a static reference (see
    * DriftSpec). Types present in only one side drop out (an inner
    * totals join): PSI needs both distributions to exist.
    */
  def psiOf(refBins: DataFrame, curBins: DataFrame, bins: Int = 10): DataFrame =
    psiOfBinned(refBins.withColumn("win", lit(0))
      .unionByName(curBins.withColumn("win", lit(1))), bins)

  private def psiOfBinned(counts: DataFrame, bins: Int): DataFrame = {
    val byBin = counts.groupBy("event_type", "win", "bin").agg(count(lit(1)).as("c"))
    // totals and the grid derive from the TINY byBin aggregate — the
    // row-scale input is scanned exactly once, as the doc promises
    val totals = byBin.groupBy("event_type", "win").agg(sum("c").as("n"))
    // every (type, bin) cell must exist — an empty bin is drift
    // evidence, not a missing row
    val grid = byBin.select("event_type").distinct()
      .select(col("event_type"), explode(sequence(lit(0), lit(bins - 1))).as("bin"))
    val ref = byBin.filter(col("win") === 0)
      .select(col("event_type"), col("bin"), col("c").as("c_ref"))
    val cur = byBin.filter(col("win") === 1)
      .select(col("event_type"), col("bin"), col("c").as("c_cur"))
    val nRef = totals.filter(col("win") === 0)
      .select(col("event_type"), col("n").as("n_ref"))
    val nCur = totals.filter(col("win") === 1)
      .select(col("event_type"), col("n").as("n_cur"))
    grid
      .join(ref, Seq("event_type", "bin"), "left")
      .join(cur, Seq("event_type", "bin"), "left")
      .join(nRef, "event_type").join(nCur, "event_type")
      .withColumn("p_ref",
        (coalesce(col("c_ref"), lit(0L)) + 0.5) / (col("n_ref") + bins * 0.5))
      .withColumn("p_cur",
        (coalesce(col("c_cur"), lit(0L)) + 0.5) / (col("n_cur") + bins * 0.5))
      .withColumn("contrib_q",
        floor(((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
          * 100000000L + 0.5).cast("long"))
      .groupBy("event_type")
      .agg(min("n_ref").as("n_ref"), min("n_cur").as("n_cur"),
        sum("contrib_q").as("psi_q"))
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        Rnd.round(col("psi_q") / 100000000.0, 6).as("psi"))
      .orderBy("event_type")
  }
}
