package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Rnd.round

import graft.sources.Tables

/** End-to-end training-data curation: the composed pipeline an LLM
  * data run executes — exact dedup (keep-first) → quality filter →
  * language routing → per-(lang, source) corpus stats.
  *
  * Keep-first is a window rank over the content hash (one shuffle on
  * the hash, no agg+join), the quality gates are pure projections on
  * top, and the stats are one final group-by — exactly two exchanges
  * end-to-end (asserted in CurateSpec). Shared vocabulary: the
  * content-hash expression comes from [[Dedup.contentHash]] and the
  * stopword list from [[TextAnalysis.stopwords]], so this pipeline
  * can't silently diverge from the standalone operators it composes.
  */
object Curate {

  /** Survivors of dedup + quality gating, with routing columns. */
  def curated(t: Tables, minTokens: Int = 20, minStopRatio: Double = 0.01): DataFrame = {
    val stops = TextAnalysis.stopwords
    t.documents
      .withColumn("_rn", row_number().over(
        Window.partitionBy(Dedup.contentHash).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_tokens", size(col("w")))
      .withColumn("stop_ratio",
        size(filter(col("w"), x => x.isin(stops.map(lit): _*))).cast("double") /
          col("n_tokens"))
      .filter(col("n_tokens") >= minTokens && col("stop_ratio") >= minStopRatio)
  }

  /** Corpus statistics after curation — the data card numbers. */
  def qCurate(t: Tables): DataFrame =
    curated(t)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        round(avg("stop_ratio"), 2).as("avg_stop_ratio"))
      .orderBy("lang", "source")
}
