package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Rnd.round

/** Persisted INVERTED TEXT INDEX — the keyword-search twin of the
  * on-disk ingest indexes ([[DedupIndex]] bands, [[SpanIndex]] spans,
  * [[IvfIndex]] cells): term-bucketed posting lists live on disk, a
  * query opens O(query terms) bucket directories instead of scanning
  * the corpus, and new documents absorb by appending just their
  * postings.
  *
  * Layout under `dir/`:
  *
  *   - `postings/tok_bucket=N/` — (token, doc_id, tf, dl) rows,
  *     directory-partitioned by `pmod(xxhash64(token), Buckets)`.
  *     `dl` (the document's token count) is DENORMALIZED into every
  *     posting: BM25 needs it per matched posting, and carrying 8
  *     bytes per posting beats joining a corpus-sized doc-length
  *     table on `doc_id` at query time — the join would shuffle
  *     O(corpus) rows to serve an O(matched) query.
  *   - `stats/` — a pure-append ledger of (n_docs, sum_dl), one row
  *     per build/absorb commit. Corpus-level BM25 constants (N,
  *     avgdl) aggregate O(commits) ledger rows, never the corpus;
  *     the sums are exact integer folds, so avgdl is bit-identical
  *     to computing it over the full corpus.
  *   - `_params.json` — the bucket count, pinned at build time so a
  *     probe against an index built elsewhere can never hash into
  *     the wrong partition layout.
  *
  * Query cost is O(touched buckets' postings): the bucket set for a
  * term list is computed DRIVER-SIDE (the same xxhash64 the writer
  * used, evaluated on literals — no Spark job), so the scan carries
  * PartitionFilters before any executor starts. A hot term's posting
  * list is O(df) rows — inherent to the question being asked — and
  * everything downstream is partial-agg'd, so the shuffle carries
  * per-(doc, token) rows, never token instances.
  *
  * Single-writer, reader-racing-compaction semantics are the family's
  * ([[graft.util.FoldCommit]]): probes run reader-mode recovery first
  * so a committed-but-interrupted [[compact]] can never double-count
  * folded postings.
  */
object TextIndex {

  /** Bounded directory-partition count — fine enough that a few-term
    * query prunes most of the stored scan, coarse enough that a
    * 10^10-posting corpus still gets multi-GB (splittable) buckets
    * instead of a small-file explosion.
    */
  private val Buckets = 64

  private def paramsPath(dir: String) =
    java.nio.file.Paths.get(dir, "_params.json")

  private def writeParams(dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(paramsPath(dir),
      s"""{"buckets":$Buckets}""".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  private def readBuckets(dir: String): Int = {
    val s = new String(java.nio.file.Files.readAllBytes(paramsPath(dir)),
      java.nio.charset.StandardCharsets.UTF_8)
    """"buckets":(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
  }

  /** The whitespace tokenizer shared with [[TextAnalysis]] — one
    * definition so index-served and corpus-scan scoring agree by
    * construction (and so the DuckDB oracle's `string_split(text, ' ')`
    * replays it exactly).
    */
  private def toks = split(col("text"), " ")

  /** Driver-side twin of the executor's `pmod(xxhash64(token), n)` —
    * Catalyst's own XxHash64 evaluated on a literal (seed 42, the
    * `functions.xxhash64` default), so the query's bucket list is
    * computed with zero Spark jobs and provably the writer's hash.
    */
  private[graft] def bucketOf(term: String, buckets: Int): Long = {
    val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(term)))
      .eval(null).asInstanceOf[Long]
    val m = h % buckets
    if (m < 0) m + buckets else m
  }

  /** (token, doc_id, tf, dl, tok_bucket) postings for a
    * (doc_id, text) frame: one explode, one partial-agg'd count —
    * dl rides along as `size(tokens)` (a scan-level projection, no
    * second pass and no join).
    */
  private def postings(docs: DataFrame, buckets: Int): DataFrame =
    docs.select(col("doc_id"), size(toks).as("dl"),
        explode(toks).as("token"))
      .groupBy("token", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .withColumn("tok_bucket", pmod(xxhash64(col("token")), lit(buckets)))

  private def appendBatch(docs: DataFrame, dir: String, buckets: Int,
      mode: SaveMode): Unit = {
    // pre-write repartition on the partition column: one file per
    // bucket per writing task (the family's small-file discipline)
    postings(docs, buckets).repartition(col("tok_bucket"))
      .write.mode(mode).partitionBy("tok_bucket")
      .parquet(s"$dir/postings")
    // the stats ledger row stays distributed end to end — an agg to
    // one row, coalesced to one file, appended; the driver never
    // holds corpus data
    docs.agg(count(lit(1)).cast("long").as("n_docs"),
        coalesce(sum(size(toks)), lit(0L)).cast("long").as("sum_dl"))
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(s"$dir/stats")
    ()
  }

  /** Build the index from scratch over a (doc_id, text) corpus. */
  def build(docs: DataFrame, dir: String): Unit = {
    writeParams(dir)
    // a rebuild over a previous index must not inherit its ledger:
    // postings overwrite (SaveMode), the ledger resets by delete
    val statsDir = java.nio.file.Paths.get(dir, "stats")
    if (java.nio.file.Files.isDirectory(statsDir))
      graft.util.FoldCommit.rmTree(statsDir)
    appendBatch(docs, dir, Buckets, SaveMode.Overwrite)
  }

  /** Absorb new documents: pure partition-aligned append of their
    * postings plus one ledger row; nothing stored is read or
    * rewritten (no read-modify-write, so absorb can never race a
    * probe's view into inconsistency — a reader sees the batch's
    * postings and its ledger row, or neither matters: both sides of
    * every formula that mixes them come from the same scan set).
    */
  def absorb(spark: SparkSession, dir: String, docs: DataFrame): Unit = {
    // finish any committed fold before appending (reader-mode; only
    // compact owns staging)
    graft.util.FoldCommit.recover(dir)
    appendBatch(docs, dir, readBuckets(dir), SaveMode.Append)
  }

  /** The pruned posting scan for a term list: PartitionFilters on the
    * driver-computed bucket set, then the token filter — a query for
    * k terms opens at most k of the [[Buckets]] directories.
    */
  private def matchedPostings(spark: SparkSession, dir: String,
      terms: Seq[String]): DataFrame = {
    graft.util.FoldCommit.recover(dir)
    val buckets = readBuckets(dir)
    val bs = terms.map(bucketOf(_, buckets)).distinct
    spark.read.parquet(s"$dir/postings")
      .filter(col("tok_bucket").isin(bs: _*))
      .filter(col("token").isin(terms: _*))
  }

  /** Keyword search against the index: documents matching the term
    * list — (doc_id, n_matched, total_tf), AND semantics when
    * `requireAll` (every term present), OR otherwise. One pruned
    * scan, one partial-agg'd hash agg keyed on doc_id; rows out are
    * O(matching docs).
    */
  def search(spark: SparkSession, dir: String, terms: Seq[String],
      requireAll: Boolean = true): DataFrame = {
    val m = matchedPostings(spark, dir, terms)
      .groupBy("doc_id")
      .agg(countDistinct(col("token")).as("n_matched"),
        sum(col("tf")).as("total_tf"))
    if (requireAll) m.filter(col("n_matched") === terms.distinct.size) else m
  }

  /** BM25 top-k per query term, served FROM THE INDEX — no corpus
    * scan: tf/dl come from the matched postings, df folds from them
    * (one row per (token, doc) ⇒ the per-token row count IS the
    * document frequency), and the corpus constants aggregate the
    * O(commits) stats ledger. The arithmetic is assembled in the
    * exact operand order the oracle SQL uses (double float ops are
    * non-associative — structural identity is what makes the hash
    * compare exact), and `avgdl` is an exact-integer-sum division so
    * the ledger path and a full-corpus `sum/count` agree bitwise.
    */
  def bm25(spark: SparkSession, dir: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = matchedPostings(spark, dir, terms)
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val corpus = spark.read.parquet(s"$dir/stats")
      .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1))
    val denom = col("tf") + lit(k1) *
      (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(broadcast(df), "token")
      .crossJoin(broadcast(corpus))
      .withColumn("score", round(idf * col("tf") * lit(k1 + 1) / denom, 4))
      .withColumn("rk", row_number().over(
        Window.partitionBy("token").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rk") <= topK)
      .select("token", "doc_id", "tf", "score", "rk")
  }

  /** OPTIMIZE: fold each append-grown bucket directory back to one
    * file and the stats ledger back to one row (an exact integer
    * fold), each step crash-safe via [[graft.util.FoldCommit]].
    * Returns posting rows rewritten; 0 when already compact.
    */
  def compact(spark: SparkSession, dir: String,
      store: graft.sources.CommitStore = graft.util.FoldCommit.DefaultStore): Long = {
    val n = graft.util.FoldCommit.compactPartitionedTree(spark, dir,
      "postings", "tok_bucket", store)
    compactStats(spark, dir, store)
    n
  }

  /** Fold the stats ledger to one row. Its own FoldCommit cycle
    * (stage → claim → roll forward) so a crash between the postings
    * fold and this one leaves two independently consistent trees.
    */
  private def compactStats(spark: SparkSession, dir: String,
      store: graft.sources.CommitStore): Unit = {
    graft.util.FoldCommit.recover(dir, sweepStaging = true)
    val statsRoot = java.nio.file.Paths.get(dir, "stats")
    if (!java.nio.file.Files.isDirectory(statsRoot)) return
    val files = graft.util.FoldCommit.listDataFiles(statsRoot)
    if (files.size <= 1) return
    val foldId = java.util.UUID.randomUUID().toString.take(8)
    spark.read.parquet(files.map(_.toString): _*)
      .agg(coalesce(sum("n_docs"), lit(0L)).cast("long").as("n_docs"),
        coalesce(sum("sum_dl"), lit(0L)).cast("long").as("sum_dl"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(graft.util.FoldCommit.stageDir(dir, foldId).toString)
    graft.util.FoldCommit.commit(dir, foldId, "stats",
      files.map(f => java.nio.file.Paths.get(dir).relativize(f).toString),
      store)
  }

  private case class Key(session: Int, sfDir: String)
  private val built = new graft.util.BoundedMemo[Key, String](4, _ => ())

  /** The contract queries' memoized corpus index — built over the
    * even-doc_id half, then the odd half ABSORBED, so the gate
    * exercises build AND incremental append on every run; exposed so
    * the bench bills the build under `index_build` and the timed
    * queries measure the pruned probe path.
    */
  def corpusIndexDir(t: graft.sources.Tables): String =
    built.getOrBuild(Key(System.identityHashCode(t.spark), t.sfDir)) {
      val d = graft.util.TempDirs.createWithCleanup("graft-text-idx")
      val docs = t.documents.select("doc_id", "text")
      build(docs.filter(col("doc_id") % 2 === 0), d)
      absorb(t.spark, d, docs.filter(col("doc_id") % 2 === 1))
      d
    }

  /** Contract query — FULLY DuckDB-oracled (keyword conjunction is
    * plain SQL): every document containing ALL query terms, with the
    * distinct-term count and summed term frequency, answered from the
    * index alone (build even half + absorb odd half ≡ full corpus, so
    * the oracle scans `documents` directly).
    */
  def qTextSearch(t: graft.sources.Tables): DataFrame =
    search(t.spark, corpusIndexDir(t), Seq("spark", "merge"))
      .orderBy("doc_id")

  /** Contract query — index-served BM25, FULLY DuckDB-oracled against
    * the corpus-scan formula: same terms/constants as
    * [[TextAnalysis.qBm25]], but tf/dl/df/N/avgdl all come from the
    * stored postings + ledger. Equality with the corpus-scan oracle
    * proves the whole chain: build, absorb, denormalized dl, ledger
    * folds, pruned probe.
    */
  def qTextIndexBm25(t: graft.sources.Tables): DataFrame =
    bm25(t.spark, corpusIndexDir(t), Seq("spark", "merge", "window"))
      .orderBy("token", "rk")
}
