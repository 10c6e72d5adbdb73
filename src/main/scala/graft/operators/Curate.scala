package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Rnd.round

import graft.sources.Tables

/** End-to-end training-data curation: the composed pipeline an LLM
  * data run executes — exact dedup (keep-first) → quality filter →
  * language routing → per-(lang, source) corpus stats. Each stage is
  * a declarative transform on the previous one, so Catalyst fuses
  * the projections and the whole thing is two shuffles (dedup
  * group-by, final group-by), no intermediate materialization.
  */
object Curate {

  /** Survivors of dedup + quality gating, with routing columns. */
  def curated(t: Tables, minTokens: Int = 20, minStopRatio: Double = 0.01): DataFrame = {
    val docs = t.documents
    val keepFirst = docs
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("doc_id"))
    docs.join(keepFirst, "doc_id")
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_tokens", size(col("w")))
      .withColumn("stop_ratio",
        size(filter(col("w"), x => x.isin(lit("the"), lit("a")))).cast("double") /
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
