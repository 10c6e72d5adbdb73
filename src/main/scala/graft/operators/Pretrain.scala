package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Pretraining-batch preparation operators (SURVEY.md §2.3b): the
  * steps between a curated corpus and a training run — sequence
  * packing, deterministic global shuffle, and domain-mixture
  * rebalancing. All three are exactly oracle-able (no RNG: packing is
  * positional, shuffle order is a fixed multiplicative hash, mixing
  * is a mod-hash gate), and none uses a corpus-wide single-partition
  * window: global positions come from a two-level distributed prefix
  * sum (per-block partial aggregation + a window over the tiny block
  * roster), the same recipe that replaces `zipWithIndex` at 100 TB.
  */
object Pretrain {

  /** The engine-portable multiplicative hash (Knuth 2654435761 over
    * the mod-prime-reduced id — reducing FIRST keeps the product under
    * 2^63 for any id). ONE definition: the shuffle order, the mixture
    * gate, and PretrainDemo must stay bit-identical or the demo's
    * sample silently desynchronizes from the contract queries.
    */
  val HashPrime = 1000000007L

  def portableHash(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ((id % HashPrime) * 2654435761L) % HashPrime

  /** Documents-per-block for the prefix-sum block roster. At sf0.1
    * (5k docs) this yields ~20 blocks; at 100 TB with B=1e6 a 10^12-row
    * corpus still produces only 10^6 roster rows — the roster window
    * stays driver-trivial while every corpus-wide stage remains fully
    * parallel.
    */
  private val BlockSize = 256L

  /** (doc_id, start) where start = Σ tokens of all earlier doc_ids —
    * the distributed prefix sum. Stage 1: per-block token subtotals
    * (map-side combinable hash agg). Stage 2: running offsets over the
    * BLOCK roster only (n/B rows — the single-partition window never
    * sees corpus-scale data). Stage 3: broadcast offsets back and take
    * a within-block running sum, partitioned by block so every
    * partition's window is bounded by B rows.
    */
  private[graft] def withStart(docs: DataFrame): DataFrame = {
    val blocked = docs.withColumn("block", expr(s"doc_id div $BlockSize"))
    val roster = blocked.groupBy("block").agg(sum("tokens").as("btok"))
    val wRoster = Window.orderBy("block")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = roster
      .withColumn("boff", coalesce(sum("btok").over(wRoster), lit(0L)))
      .select("block", "boff")
    val wIn = Window.partitionBy("block").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    blocked.join(broadcast(offsets), "block")
      .withColumn("start", col("boff") + coalesce(sum("tokens").over(wIn), lit(0L)))
  }

  /** GPT-style sequence packing: concatenate documents in doc_id order
    * into one token stream and cut it into fixed `budget`-token
    * sequences; a document straddling a boundary is split across packs
    * (what pretraining chunking actually does). Per pack: how many
    * documents touch it and how many tokens land in it — every pack
    * except the tail is exactly full by construction, and the DuckDB
    * oracle (plain window cumsum + generate_series) gates the whole
    * assignment. The explode fans each document out to only the packs
    * it overlaps (≤ tokens/budget + 1 rows), so the fan-out is bounded
    * by corpus token count / budget regardless of document skew.
    */
  def qPackSequences(t: Tables, budget: Long = 512L): DataFrame =
    packSequences(t.documents.select(col("doc_id"),
      GraftFunctions.tokenCount(col("text")).cast("long").as("tokens")), budget)

  /** Packing over any (doc_id, tokens) frame — the contract query
    * budgets by whitespace counts (oracle-able); a training run
    * passes counts from its REAL tokenizer (`Bpe.tokenCount`), which
    * is what sizes packs correctly (see PretrainDemo).
    */
  def packSequences(docs: DataFrame, budget: Long): DataFrame = {
    withStart(docs)
      .filter(col("tokens") > 0) // zero-token docs occupy no pack
      .withColumn("pack_id",
        explode(sequence(expr(s"start div $budget"),
          expr(s"(start + tokens - 1) div $budget"))))
      .withColumn("tok_in_pack",
        least((col("pack_id") + 1) * budget, col("start") + col("tokens"))
          - greatest(col("pack_id") * budget, col("start")))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok_in_pack").as("n_tokens"))
      .orderBy("pack_id")
  }

  /** Packed training sequences holding REAL BPE token ids — the
    * artifact `packSequences` only sizes: documents are tokenized by
    * the codegen'd `bpe_encode` (ids in word order), concatenated in
    * doc_id order via the same two-level distributed prefix sum, and
    * cut into `budget`-id sequences, documents straddling a boundary
    * split across sequences. Returns (seq_id, ids) where every
    * non-tail `ids` is exactly `budget` long. The per-token explode is
    * the one corpus-token-scale stage — inherent (the output IS every
    * token), map-side only, no shuffle until the per-sequence
    * reassembly, whose groups are bounded at `budget` rows. Global
    * positions make the reassembly order-exact: sequences sort their
    * ids by position inside `array_sort`, never relying on row order
    * surviving the shuffle.
    */
  def packBpeIds(docs: DataFrame, modelId: String, budget: Long): DataFrame = {
    // Sizing runs on bpe_count (count-only merge loop, per-word memo,
    // no array materialization) — withStart references its input in
    // TWO branches (block roster + main join), and building the id
    // arrays in both would double the dominant tokenization cost. The
    // arrays are built exactly once, after placement; size(encode) ==
    // count by construction (same greedy merge loop — BpeSpec pins it).
    val counted = docs.select(col("doc_id"), col("text"),
      graft.functions.Bpe.tokenCount(modelId, col("text")).cast("long").as("tokens"))
    withStart(counted)
      .filter(col("tokens") > 0) // zero-token docs occupy no sequence
      .select(col("start"),
        posexplode(graft.functions.Bpe.encode(modelId, col("text"))).as(Seq("pos", "id")))
      .withColumn("gpos", col("start") + col("pos"))
      .withColumn("seq_id", expr(s"gpos div $budget"))
      .groupBy("seq_id")
      .agg(transform(
        array_sort(collect_list(struct(col("gpos"), col("id")))),
        x => x("id")).as("ids"))
  }

  /** Contract digest over the packed-id table (rows-only — a learned
    * vocabulary isn't SQL-expressible; PretrainSpec pins conservation:
    * flattening the sequences in order reproduces the concatenated
    * per-document id stream exactly). Fullness, order, and content
    * are all visible in the digest: n_tokens proves fullness,
    * first/last ids pin the boundaries, id_sum the content.
    */
  def qPackBpe(t: Tables, budget: Long = 512L): DataFrame = {
    val (modelId, _) = TextAnalysis.corpusModel(t)
    packBpeIds(t.documents, modelId, budget)
      .select(col("seq_id"),
        size(col("ids")).as("n_tokens"),
        aggregate(col("ids"), lit(0L), (acc, x) => acc + x).as("id_sum"),
        element_at(col("ids"), 1).as("first_id"),
        element_at(col("ids"), -1).as("last_id"))
      .orderBy("seq_id")
  }

  /** Deterministic global training-order shuffle: rank every document
    * by a fixed multiplicative hash (Knuth 2654435761 over the
    * mod-prime-reduced id — reducing FIRST keeps the product under
    * 2^63 for any id, where hashing the raw id would overflow (Spark
    * wraps, other engines raise — divergence exactly at scale), to
    * stay portable across engines — doc_id ties broken by doc_id) and
    * emit rank-bucket aggregates proving the total order. The rank is
    * a distributed prefix COUNT over hash-range buckets — per-bucket
    * row counts, tiny-roster running offsets, then row_number within
    * each bucket — i.e. a declarative zipWithIndex that never sorts
    * the corpus in one partition. 64 range buckets here; a cluster
    * run would use ~#partitions buckets of the same hash space.
    */
  def qShuffleOrder(t: Tables): DataFrame = {
    val bucketWidth = HashPrime / 64 + 1
    val hashed = t.documents
      .select(col("doc_id"), portableHash(col("doc_id")).as("hv"))
      .withColumn("bucket", expr(s"hv div $bucketWidth"))
    val roster = hashed.groupBy("bucket").agg(count(lit(1)).as("bn"))
    val wRoster = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = roster
      .withColumn("boff", coalesce(sum("bn").over(wRoster), lit(0L)))
      .select("bucket", "boff")
    val wIn = Window.partitionBy("bucket").orderBy("hv", "doc_id")
    hashed.join(broadcast(offsets), "bucket")
      .withColumn("pos", col("boff") + row_number().over(wIn).cast("long") - 1L)
      .withColumn("rank_bucket", expr("pos div 100"))
      .groupBy("rank_bucket")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("sum_doc_ids"),
        min("pos").as("min_pos"), max("pos").as("max_pos"))
      .orderBy("rank_bucket")
  }

  /** Sliding-window chunking — the preprocessing an embedding model
    * needs: split each document into windows of `window` tokens every
    * `stride` tokens (overlap = window − stride keeps context across
    * cuts). Pure array ops per row (split → slice → rejoin), no
    * shuffle at all until a consumer aggregates; the final window may
    * be short (kept — dropping it loses tail tokens), but a window
    * whose tokens are ENTIRELY inside the previous one is never
    * emitted: chunk count is 1 for docs ≤ window, else
    * ceil((n−window)/stride)+1 — the last start is the first offset
    * whose window reaches the final token, no redundant tail. Fully
    * oracle-able: the chunk texts themselves are compared.
    */
  def qChunkDocs(t: Tables, window: Int = 64, stride: Int = 48): DataFrame = {
    val w = filter(split(col("text"), " "), x => x =!= "")
    t.documents
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0),
          expr(s"greatest(1, cast(ceil((size(w) - $window) / ${stride}.0) AS INT) + 1) - 1"))).as("chunk_idx"),
        col("w"))
      .select(col("doc_id"), col("chunk_idx"),
        expr(s"size(slice(w, chunk_idx * $stride + 1, $window))").as("n_tokens"),
        expr(s"concat_ws(' ', slice(w, chunk_idx * $stride + 1, $window))").as("chunk"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Target language mixture for [[qDomainMix]]: the rebalance a
    * multilingual pretraining corpus runs before sampling.
    */
  val MixWeights: Seq[(String, Double)] =
    Seq("en" -> 0.50, "de" -> 0.20, "es" -> 0.15, "fr" -> 0.10, "zh" -> 0.05)

  /** DSIR-style importance scores (Xie '23, "Data Selection for
    * Language Models via Importance Resampling"): rank documents by
    * how much their token distribution resembles a TARGET slice.
    * Because the target here is a SUBSET of the corpus, the weights
    * contrast target vs complement (the discriminative form — the
    * paper's target-vs-raw ratio degenerates when target ⊆ raw: the
    * smoothing-denominator gap hands every rare token a positive
    * weight regardless of where it occurs): per token,
    * `ln p_target(tok) - ln p_complement(tok)` under add-one
    * smoothing over the shared vocabulary. Training is ONE
    * token-count hash agg (each occurrence flagged by target
    * membership, so raw and target counts come out of the same pass)
    * + one scalar row; scoring is one join
    * over exploded tokens + an integer sum — each log-ratio is
    * quantized to integer millionths (the NbFilter/LmScore trick) so
    * document scores are order-independent sums both engines
    * reproduce exactly. At 100 TB the vocabulary bounds via DSIR's
    * hashed n-gram features (swap `tok` for a hash bucket); the plan
    * shape is unchanged.
    *
    * `corpusToks` = (doc_id, tok) one row per occurrence;
    * `targetIds` = the doc_ids defining the target distribution.
    */
  def dsirScores(corpusToks: DataFrame, targetIds: DataFrame): DataFrame = {
    val Q = 1000000L
    def quant(x: org.apache.spark.sql.Column) = floor(x * Q + 0.5).cast("long")
    val m = corpusToks
      .join(targetIds.withColumn("_tgt", lit(1L)), Seq("doc_id"), "left")
      .groupBy("tok").agg(count(lit(1)).as("rc"),
        sum(coalesce(col("_tgt"), lit(0L))).as("tc"))
    // the corpus scalars stay a 1-row frame: the nb_filter-style
    // collect-as-literals was TRIED in r19 and measured SLOWER at
    // sf0.1 (+0.2-0.4 s) — the scalar agg is a corpus pass, and the
    // eager collect serializes it ahead of the main plan where the
    // 1-row BNLJ's broadcast used to materialize concurrently. The
    // collapse only pays when the scalar frame is cheap (nb_filter's
    // tiny count frames), not when it is itself a corpus aggregate.
    val scal = m.agg(sum("tc").as("tn"), sum(col("rc") - col("tc")).as("cn"),
      count(lit(1)).as("v"))
    // parenthesization mirrors the oracle: identical doubles quantize
    // to identical integers
    val wts = m.crossJoin(broadcast(scal))
      .select(col("tok"), quant(
        log(col("tc") + 1) - log(col("tn") + col("v"))
          - (log(col("rc") - col("tc") + 1) - log(col("cn") + col("v")))).as("w"))
    // wts is vocab-bounded (hashed n-gram features at 100 TB — the
    // documented DSIR posture); without the hint the planner broadcast
    // the CORPUS-scale exploded-token side (BuildLeft in the r18 plan)
    corpusToks.join(broadcast(wts), "tok")
      .groupBy("doc_id").agg(sum("w").as("score_q"))
  }

  /** The contract form of [[dsirScores]]: target = the English slice
    * of `documents`, top-k by (score desc, doc_id) as a TakeOrdered —
    * no global window. (On the driver's synthetic corpus every
    * language shares one token distribution, so this query pins
    * engine-exactness; PretrainSpec plants a genuinely skewed target
    * to prove the ranking actually recovers distribution match.)
    */
  def qDsirSelect(t: Tables, k: Int = 25): DataFrame = {
    val toks = t.documents
      .select(col("doc_id"), col("lang"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("tok"))
    dsirScores(toks.select("doc_id", "tok"),
        t.documents.filter(col("lang") === "en").select("doc_id"))
      .orderBy(col("score_q").desc, col("doc_id"))
      .limit(k)
  }

  /** Per-language mod-hash gates from a (lang, n_lang, n_total) count
    * frame: rate = min(1, weight·n_total·budgetFrac/n_lang), quantized
    * to 1/10000 so a DuckDB oracle reproduces the gate bit-for-bit.
    * ONE definition shared by [[qDomainMix]] and PretrainDemo (they
    * derive gates from different populations — raw corpus vs gated
    * survivors — but must apply the same formula): the same
    * anti-desync rule as [[portableHash]].
    */
  def mixGates(counts: DataFrame, budgetFrac: Double = 0.5,
      capAtOne: Boolean = true): DataFrame = {
    val weights = counts.sparkSession.createDataFrame(MixWeights)
      .toDF("lang", "weight")
    val raw = col("weight") * col("n_total") * budgetFrac / col("n_lang")
    val rate = if (capAtOne) least(lit(1.0), raw) else raw
    val gateRaw = floor(col("rate") * 10000 + 0.5).cast("long")
    counts.join(weights, "lang")
      .withColumn("rate", rate)
      .withColumn("gate", if (capAtOne) least(lit(10000L), gateRaw) else gateRaw)
  }

  /** Domain-mixture rebalancing: given target weights per language and
    * a global budget (half the corpus), derive each language's
    * sampling rate `min(1, weight·target/count)` and take a
    * deterministic mod-hash sample at that rate — the declarative,
    * reproducible form of "sample the corpus to a target mixture".
    * The gate hashes the id first (the same portable multiplicative
    * hash as [[qShuffleOrder]]) so sequential/clustered ids still
    * sample uniformly. Only per-language counts (a handful of rows)
    * leave the aggregation; the corpus-scale pass is a broadcast join
    * plus a pushed-down filter, so the plan is one shuffle regardless
    * of corpus size. Rates are quantized to 1/10000 so the DuckDB
    * oracle reproduces the gate bit-for-bit.
    */
  /** Epoch-replication mixture (upsampling): when a language's target
    * share exceeds its natural share, each document is emitted
    * ⌈rate⌉ or ⌊rate⌋ times — the "epochs per source" recipe of the
    * published pretraining mixes (Gopher/Llama data tables), where
    * scarce high-value domains repeat while abundant ones subsample,
    * all in one deterministic pass. Whole epochs replicate every doc
    * (`gate div 10000`); the fractional epoch admits docs through the
    * same portable mod-hash gate as [[qDomainMix]], so the roster is
    * reproducible row-for-row. The corpus-scale plan is a broadcast
    * join + an explode bounded by ⌈rate⌉ — no shuffle until the
    * report agg; the roster itself (doc_id, epoch) streams straight
    * to a writer at 100 TB.
    */
  def qMixUpsample(t: Tables, budgetFrac: Double = 2.0): DataFrame = {
    val docs = t.documents.select("doc_id", "lang")
      .withColumn("hv", portableHash(col("doc_id")))
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      .withColumn("n_total", sum("n_lang").over(Window.partitionBy()))
    val rates = mixGates(counts, budgetFrac, capAtOne = false)
      .select(col("lang"), col("gate"))
    docs.join(broadcast(rates), "lang")
      .withColumn("n_rep", expr("gate div 10000") +
        when(pmod(col("hv"), lit(10000L)) < pmod(col("gate"), lit(10000L)), 1L)
          .otherwise(0L))
      .filter(col("n_rep") > 0)
      .select(col("lang"), explode(sequence(lit(1L), col("n_rep"))).as("epoch"))
      .groupBy("lang", "epoch").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "epoch")
  }

  def qDomainMix(t: Tables): DataFrame = {
    val docs = t.documents.select("doc_id", "lang")
      .withColumn("hv", portableHash(col("doc_id")))
    // n_total is the WHOLE corpus — computed before the weights join,
    // so a language outside the weight table still counts toward the
    // budget base (and the oracle, which totals all languages, agrees)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      .withColumn("n_total", sum("n_lang").over(Window.partitionBy()))
    val rates = mixGates(counts)
    val sampled = docs.join(broadcast(rates.select("lang", "gate")), "lang")
      .filter(pmod(col("hv"), lit(10000L)) < col("gate"))
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
    // LEFT join: a weighted language whose gate admitted zero docs
    // must report n_sampled=0, not vanish from the mixture report
    rates.select("lang", "n_lang", "gate").join(sampled, Seq("lang"), "left")
      .select(col("lang"), col("n_lang"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        Rnd.round(col("gate") / 10000.0, 4).as("rate"))
      .orderBy("lang")
  }
}
