package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Model-based quality filtering, CCNet/fastText-style: distill a
  * heuristic signal into a cheap multinomial Naive Bayes classifier,
  * trained ON the cluster AS aggregations — per-(token, class)
  * occurrence counts, class totals, and a vocabulary size are the
  * entire "fit", so training is two shuffles (token counts + one
  * scalar row) no matter the corpus size, and scoring is a
  * broadcast-able join over the holdout's tokens. No driver-side
  * learning loop, no UDF.
  *
  * Everything is exactly reproducible: log-odds are quantized to
  * integer millionths (the fastText trick) so document scores are
  * integer SUMS — order-independent, engine-portable — and the whole
  * train+score pipeline answers to a DuckDB oracle, confusion matrix
  * and all. The distilled signal here is the stopword-density label
  * (ratio of {"the","a"} tokens above the train-split median); on a
  * real corpus the same plan distills any reference-corpus /
  * heuristic label — only the `labeled` frame changes.
  */
object NbFilter {

  private val Q = 1000000L // log-odds quantization: integer millionths

  private def quant(x: Column): Column = floor(x * Q + 0.5).cast("long")

  private def isTrain = col("doc_id") % 2 === 0

  /** (doc_id, label): the weak label — stopword density above the
    * TRAIN-split median (the median never peeks at holdout docs).
    */
  private def labeled(t: Tables): DataFrame = {
    val words = split(col("text"), " ")
    val ratio = t.documents
      .select(col("doc_id"), filter(words, x => x =!= "").as("w"))
      .withColumn("n_tok", size(col("w")))
      .filter(col("n_tok") > 0)
      .select(col("doc_id"),
        (size(filter(col("w"), x => x === "the" || x === "a")).cast("double")
          / col("n_tok")).as("stop_ratio"))
    val med = ratio.filter(isTrain)
      .agg(expr("percentile(stop_ratio, 0.5D)").as("med"))
    ratio.crossJoin(broadcast(med))
      .select(col("doc_id"), (col("stop_ratio") > col("med")).cast("int").as("label"))
  }

  /** (doc_id, tok) occurrences — multinomial features. */
  private def occ(t: Tables): DataFrame = t.documents
    .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    .filter(col("tok") =!= "")

  /** Laplace-smoothed per-token quantized log-odds plus the two model
    * scalars (unseen-token weight, class prior). Parenthesization of
    * the double math mirrors the oracle so both engines quantize the
    * same values.
    */
  private def fit(t: Tables): (DataFrame, Long, Long, DataFrame) = {
    // the label table is read three times (train features, priors, the
    // holdout score join); checkpointed LAZILY it materializes inside
    // the first job that touches it (no extra standalone job — eager
    // checkpoints cost more than the recompute they save at small SF)
    // and the other two readers reuse the blocks: one stop-ratio scan
    // + one median job instead of three of each. 2 columns per doc —
    // exactly the distilled-label table a production pipeline persists.
    val lab = labeled(t).localCheckpoint(eager = false)
    // the train-half predicate sits on the EXPLODED side too: the join
    // key equality doesn't propagate `doc_id % 2 = 0` across the join
    // by itself, so without the explicit filter the full token explode
    // shuffled into the join and half of it was discarded after —
    // filtering first halves the exchange (guide §2.3: project/filter
    // before the exchange)
    val tr = occ(t).filter(isTrain).join(lab.filter(isTrain), "doc_id")
    val counts = tr.groupBy("tok")
      .agg(sum("label").as("c1"), sum(lit(1) - col("label")).as("c0"))
      // vocab-sized (bounded at any corpus scale); pinning it holds the
      // corpus-scale explode+join behind it to ONE pass — `tot` below
      // and the weights join both read the cached rows
      .localCheckpoint(eager = false)
    // class totals and vocabulary FOLD from the per-token counts —
    // sum-over-tokens of per-token occurrence counts IS the class
    // total, and v is the vocab row count — so the second full pass
    // over the exploded training corpus disappears (same numbers, the
    // oracle's t1/t0/v definitions are unchanged)
    val tot = counts.agg(sum("c1").as("t1"), sum("c0").as("t0"),
      count(lit(1)).as("v"))
    val pri = lab.filter(isTrain)
      .agg(sum("label").as("n1"), sum(lit(1) - col("label")).as("n0"))
    // The five model scalars COLLECT to the driver in one job and ride
    // the rest of the plan as literals: they are the deployable
    // model's constants (trainModel ships exactly these), and keeping
    // them as 1-row frames cost three broadcast-nested-loop cross
    // joins (each its own broadcast-build job) for values the plan
    // can constant-fold. Arithmetic is unchanged — the quantization
    // runs through the same Spark expressions, just once, here.
    val trow = tot.crossJoin(pri).select(
        col("t1"), col("t0"), col("v"),
        quant(log(col("t0") + col("v")) - log(col("t1") + col("v"))).as("w0"),
        quant(log(col("n1") + lit(1).cast("double"))
          - log(col("n0") + lit(1).cast("double"))).as("prior_q"))
      .collect().head
    val (t1, t0, v) = (trow.getAs[Long]("t1"), trow.getAs[Long]("t0"),
      trow.getAs[Long]("v"))
    val wts = counts
      .select(col("tok"), quant(
        log(col("c1") + 1) - log(lit(t1) + lit(v))
          - (log(col("c0") + 1) - log(lit(t0) + lit(v)))).as("w"))
    (wts, trow.getAs[Long]("w0"), trow.getAs[Long]("prior_q"), lab)
  }

  /** Train on even doc_ids, score odd ones; emit the holdout confusion
    * matrix (actual, pred, n). Unseen holdout tokens take the
    * smoothed zero-count weight `w0`.
    */
  def qNbFilter(t: Tables): DataFrame = {
    // fit hands back its labeled frame: rebuilding it here would run
    // the stop-ratio scan and the train-median job a second time
    val (wts, w0, priorQ, lab) = fit(t)
    // Scoring path reordered around what each step actually needs
    // (guide §2.3/§2.4): the holdout restriction is a PREDICATE
    // (doc_id % 2 = 1), not a join — applying it to the explode
    // directly drops the train half before anything shuffles; the
    // label is only read AFTER the per-doc sum, so the lab join moves
    // past the aggregation, where it keys on the agg's own doc_id
    // partitioning (one row per doc) instead of riding every token
    // row. The old shape shuffled the full explode by doc_id, then by
    // tok, then by doc_id again; this one pays tok + doc_id only.
    // Same rows out: lab's n_tok>0 docs are exactly the docs with >=1
    // non-empty token, i.e. the docs the explode emits.
    // wts is explicitly BROADCAST: it is the deployable model table
    // (vocab-bounded by construction — trainModel collects this exact
    // frame to the driver as the shipped filter), but it reaches this
    // join as a checkpointed LogicalRDD whose size the planner can't
    // estimate, so without the hint the scoring join planned as a
    // SortMergeJoin that shuffled the corpus-scale token explode by
    // tok (guide §3.1: use an explicit hint when you know a side is
    // small; the estimate here isn't wrong, it's absent)
    val scored = occ(t).filter(col("doc_id") % 2 === 1)
      .join(broadcast(wts), Seq("tok"), "left")
      .withColumn("wv", coalesce(col("w"), lit(w0)))
      .groupBy(col("doc_id"))
      .agg(sum("wv").as("ev"))
      .join(lab.filter(col("doc_id") % 2 === 1), "doc_id")
    scored
      .select(col("label").as("actual"),
        (lit(priorQ) + col("ev") > 0).cast("int").as("pred"))
      .groupBy("actual", "pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "pred")
  }

  /** The learned per-token table (tok, w) — exposed so the spec can
    * assert the model recovered the signal: the stopwords must carry
    * the largest positive weights.
    */
  def tokenWeights(t: Tables): DataFrame = fit(t)._1

  /** A trained model collected to the driver — the deployable form: a
    * bounded token→weight vocabulary plus the two scalars (exactly
    * what a shipped fastText-style filter is). Collecting is the
    * DEPLOY step, not a query step: vocabularies are capped in
    * production models; an unbounded vocab stays on the cluster and
    * scores via the [[qNbFilter]] join path instead.
    */
  final case class Model(weights: Map[String, Long], w0: Long, priorQ: Long)

  def trainModel(t: Tables): Model = {
    val (wts, w0, priorQ, _) = fit(t)
    Model(
      wts.collect().map(r => r.getAs[String]("tok") -> r.getAs[Long]("w")).toMap,
      w0, priorQ)
  }

  /** Stateless per-row scoring expression over a `text` column: the
    * model rides along as a map literal (broadcast with the plan), so
    * the gate is a pure projection — no shuffle, no state, append-mode
    * safe on a stream. This is how the batch-trained filter deploys
    * against live ingest.
    */
  def scoreExpr(m: Model, text: Column): Column = {
    val wmap = typedlit(m.weights)
    lit(m.priorQ) + aggregate(
      filter(split(text, " "), x => x =!= ""),
      lit(0L),
      (acc, tok) => acc + coalesce(element_at(wmap, tok), lit(m.w0)))
  }

  /** Streaming quality gate: score each document of a (doc_id, text)
    * stream and keep score > 0 — the online deployment of the
    * distilled filter.
    */
  def nbGate(docs: DataFrame, m: Model): DataFrame =
    docs.withColumn("score", scoreExpr(m, col("text")))
      .withColumn("keep", (col("score") > 0).cast("int"))
}
