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

  /** One-row corpus DATA CARD — the headline numbers a dataset
    * release documents (Gebru et al., "Datasheets for Datasets",
    * 2018): volume, exact-duplicate rate, language/source spread,
    * token and length totals. ONE pruned scan, one agg — every
    * measure is a partial-aggregable expression (countDistinct
    * expands to the two-phase distinct agg), so the card costs a
    * single pass at any corpus size. Shares [[Dedup.contentHash]] and
    * the whitespace token convention with the standalone operators,
    * so the card can never disagree with them.
    */
  def qDataCard(t: Tables): DataFrame =
    t.documents.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(Dedup.contentHash).as("n_unique"),
      graft.operators.Rnd.round(lit(1.0) -
        countDistinct(Dedup.contentHash) / count(lit(1)).cast("double"), 4)
        .as("dup_rate"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(graft.functions.GraftFunctions.tokenCount(col("text")).cast("long"))
        .as("total_tokens"),
      sum(col("n_chars").cast("long")).as("total_chars"),
      graft.operators.Rnd.round(avg(col("n_chars")), 2).as("avg_chars"))

  /** Corpus statistics after curation — the data card numbers. */
  def qCurate(t: Tables): DataFrame =
    curated(t)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        round(avg("stop_ratio"), 2).as("avg_stop_ratio"))
      .orderBy("lang", "source")

  /** Rule-cascade drop attribution — the curation observability card
    * (RefinedWeb/Dolma-style filter reports): every document is
    * attributed to the FIRST rule that rejects it, so the counts
    * answer "what does each gate actually cost" and the stages sum
    * back to the corpus size by construction. Cascade order for an
    * English-targeting run: length floor → language routing → C4
    * stopword-density gate → Gopher repetition gate → pass.
    *
    * Every threshold is an integer cross-multiplied comparison
    * (ratio < 1/25 becomes 25·n_stop < n_tok) — no float arithmetic
    * anywhere, so the attribution is engine-exact and the oracle
    * matches bit-for-bit. One pruned scan → one 5-row hash agg;
    * per-doc work is a few array ops, nothing shuffles but the
    * 5-group partial agg. At 100 TB this is the same plan.
    */
  def qFilterCascade(t: Tables): DataFrame = {
    val stops = TextAnalysis.stopwords
    val w = split(col("text"), " ")
    val nTok = size(w)
    val nStop = size(filter(w, x => x.isin(stops.map(lit): _*)))
    val nDist = size(array_distinct(w))
    val stage = when(col("n_chars") < 100, 1)
      .when(col("lang") =!= "en", 2)
      .when(nStop * 25 < nTok, 3)
      .when((nTok - nDist) * 2 > nTok, 4)
      .otherwise(5)
    val rules = array(Seq("short", "other_lang", "low_stopword",
      "repetitive", "pass").map(lit): _*)
    t.documents
      .select(stage.as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_docs"))
      .select(col("stage"), element_at(rules, col("stage")).as("rule"),
        col("n_docs"))
      .orderBy("stage")
  }
}
