package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Perplexity-based quality scoring, CCNet-style (Wenzek '19): score
  * every document under a language model trained on the corpus and
  * gate on the score. The LM here is an add-one-smoothed bigram model
  * — like [[NbFilter]], the entire "fit" is aggregations (context and
  * bigram counts + a vocab scalar), scoring is joins over the
  * holdout's bigrams, and log-probabilities quantize to integer
  * millionths so per-document totals are order-independent sums the
  * DuckDB oracle reproduces exactly. A real deployment swaps the
  * counts for a shipped KenLM; the Spark plan — train as one shuffle,
  * score as broadcast-able joins — is the same.
  */
object LmScore {

  private val Q = 1000000L

  /** Adjacent-token bigrams of every document: (doc_id, w1, w2). */
  private def bigrams(t: Tables): DataFrame = {
    val w = filter(split(col("text"), " "), x => x =!= "")
    t.documents
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (a, b) -> struct(a AS w1, b AS w2))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
  }

  /** Train on even doc_ids, score odd ones: per holdout doc the
    * number of bigrams and the average quantized log-probability
    * (higher = more in-distribution). Unseen contexts take the
    * uniform 1/V floor.
    */
  def qLmScore(t: Tables): DataFrame = {
    val bg = bigrams(t)
    val isTrain = col("doc_id") % 2 === 0
    val tr = bg.filter(isTrain)
    val ctx = tr.groupBy("w1").agg(count(lit(1)).as("ctx_n"))
    val pc = tr.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    // the vocabulary scalar stays a 1-row frame: the collect-as-literal
    // form was TRIED in r19 and measured slower at sf0.1 — the
    // countDistinct is a corpus-scale bigram pass, and collecting it
    // eagerly serializes that pass ahead of the main plan instead of
    // letting the 1-row broadcast materialize concurrently (see
    // Pretrain.dsirScores for the same finding; nb_filter's collapse
    // pays only because its scalar frames are cheap)
    val vocab = tr.agg(countDistinct("w2").as("v"))
    val scored = bg.filter(col("doc_id") % 2 === 1)
      .join(pc, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp_q",
        when(col("ctx_n").isNull,
          floor((log(lit(1.0)) - log(col("v"))) * Q + 0.5).cast("long"))
          .otherwise(floor((log(coalesce(col("c"), lit(0L)) + 1)
            - log(col("ctx_n") + col("v"))) * Q + 0.5).cast("long")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp_q").as("lp_sum"))
    scored.select(col("doc_id"), col("n_bigrams"),
      Rnd.round(col("lp_sum").cast("double") / (col("n_bigrams") * Q.toDouble), 4)
        .as("avg_lp"))
      .orderBy("doc_id")
  }
}
