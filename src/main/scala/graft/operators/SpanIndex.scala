package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Incremental VERBATIM-SPAN dedup ingest — [[Dedup.qSpanDedup]]'s
  * daily-crawl form, the same scale inversion as [[DedupIndex]]: the
  * corpus's span inverted index lives ON DISK partitioned by span-hash
  * bucket, a new batch checks itself against it without recomputing
  * (or reshuffling) the corpus, and accepted documents absorb by
  * appending just their spans.
  *
  * Per-batch cost is O(touched buckets) + O(batch): the batch side is
  * hinted broadcast while it fits (size-gated — an oversized batch
  * falls back to shuffle joins), the stored side only SCANS, pruned
  * by a bounded `isin` over the batch's bucket set (PartitionFilters
  * on the span table — the corpus never reshuffles). One shared k-token span
  * convicts, exactly the standing-corpus rule of `q_span_dedup` — and
  * unlike MinHash banding there is no probability in the story, so
  * the whole two-phase pipeline answers to a plain SQL oracle.
  *
  * Stored rows are raw (span, doc_id) postings; the "first owner" is
  * resolved at probe time as `min(doc_id)` per span, so absorb never
  * reads existing state (pure append, no read-modify-write) and two
  * absorbers can't race each other's rewrites.
  */
object SpanIndex {

  /** Bounded directory-partition count, fine enough that a small
    * batch's bucket filter prunes most of the stored scan.
    */
  private val Buckets = 64

  private def paramsPath(dir: String) = java.nio.file.Paths.get(dir, "_params.json")

  private def writeParams(dir: String, k: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(paramsPath(dir),
      s"""{"k":$k}""".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  private def readK(dir: String): Int = {
    val s = new String(java.nio.file.Files.readAllBytes(paramsPath(dir)),
      java.nio.charset.StandardCharsets.UTF_8)
    """"k":(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
  }

  private def spans(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
        explode(GraftFunctions.wordShingles(col("text"), k)).as("span"))
      .withColumn("span_bucket", pmod(col("span"), lit(Buckets)))

  /** Build the index from scratch over a (doc_id, text) corpus. The
    * pre-write repartition keys on the partition column so each bucket
    * lands as one file per writing task (same small-file discipline as
    * [[DedupIndex.build]]).
    */
  def build(docs: DataFrame, dir: String, k: Int = 8): Unit = {
    writeParams(dir, k)
    spans(docs, k).repartition(col("span_bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("span_bucket")
      .parquet(s"$dir/spans")
    ()
  }

  /** Check a (doc_id, text) batch against the stored corpus: one row
    * per CONVICTED batch doc — (doc_id, n_shared distinct spans,
    * first_partner = earliest owning corpus doc). In-batch overlap is
    * [[Dedup.qSpanDedup]]'s job; this checks against the INDEX.
    *
    * Two scale guards over the naive postings×postings broadcast join:
    *
    *  1. '''Hot-span fan-out.''' A boilerplate span with M stored
    *     postings would multiply every matching probe posting M-fold
    *     before the final agg. Instead the stored side is first
    *     semi-joined down to probe-matched spans (no exchange — the
    *     probe side carries the hint) and pre-aggregated to ONE owner
    *     row per span; the agg's map-side combine bounds a hot span's
    *     contribution to one row per scan task, so the conviction join
    *     emits O(probe postings) rows no matter how hot a stored span
    *     is. Identical result: `n_shared` counts distinct spans either
    *     way, and min decomposes through the pre-agg.
    *  2. '''Broadcast size gate.''' The probe side of both joins is
    *     hinted broadcast only while the batch's span explode stays
    *     under `maxBroadcastRows` (≈ tokens per doc × docs; a real
    *     daily-crawl batch can exceed the 8 GB broadcast hard limit).
    *     Above the gate the hints drop and the joins shuffle — the
    *     stored scan keeps its bucket PartitionFilters prune either
    *     way, because the `isin` sits on the scan, not the join
    *     (SpanDedupSpec pins both properties).
    */
  def checkBatch(spark: SparkSession, dir: String, batch: DataFrame,
      maxBroadcastRows: Long = 10000000L,
      dedupProbe: Boolean = false): DataFrame = {
    // reader-side recovery (see DedupIndex.checkBatch): finish a
    // committed-but-interrupted compactBuckets before scanning, or the
    // folded buckets' span rows double-count on every probe
    graft.util.FoldCommit.recover(dir)
    val k = readK(dir)
    // one signature pass for the bucket collect, the size gate, and
    // both join probes
    val probe = spans(batch, k).localCheckpoint(eager = false)
    // ONE action answers both planning questions — the bucket roster
    // (PartitionFilters on the stored scan) and the total probe row
    // count (the broadcast size gate): per-bucket counts sum to the
    // total, so the old distinct-collect + count() pair of jobs folds
    // into a single bounded agg (<= Buckets rows)
    val perBucket = probe.groupBy("span_bucket")
      .agg(count(lit(1)).as("n")).collect()
    val buckets = perBucket.map(_.getAs[Long]("span_bucket"))
    val small = perBucket.map(_.getAs[Long]("n")).sum <= maxBroadcastRows
    def hinted(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val stored = spark.read.parquet(s"$dir/spans")
      .filter(col("span_bucket").isin(buckets: _*))
    val matched = stored.join(
      hinted(probe.select("span_bucket", "span").distinct()),
      Seq("span_bucket", "span"), "left_semi")
    val owners = matched.groupBy("span_bucket", "span")
      .agg(min("doc_id").as("first_owner"))
    // optional probe-side dedup ahead of the conviction join (r18's
    // exchange-neutral idea, re-evaluated at a compute-bound SF in
    // r19 — see CoreScaleProbe): a doc repeating a shingle contributes
    // duplicate (doc, span) probe rows the final countDistinct/min agg
    // ignores anyway, so deduping first only changes WHERE the
    // collapse happens, never the result
    val convictionProbe =
      if (dedupProbe)
        probe.select("doc_id", "span_bucket", "span").distinct()
      else probe.toDF()
    owners.as("x")
      .join(hinted(convictionProbe.as("y")),
        col("x.span_bucket") === col("y.span_bucket") &&
          col("x.span") === col("y.span"))
      .groupBy(col("y.doc_id").as("doc_id"))
      .agg(countDistinct(col("x.span")).as("n_shared"),
        min(col("x.first_owner")).as("first_partner"))
  }

  /** Absorb accepted batch docs: pure partition-aligned append of
    * their spans; nothing stored is read or rewritten.
    */
  def absorb(spark: SparkSession, dir: String, accepted: DataFrame): Unit = {
    // finish any committed fold before appending (reader-mode recovery;
    // see DedupIndex.absorb)
    graft.util.FoldCommit.recover(dir)
    val k = readK(dir)
    spans(accepted, k).repartition(col("span_bucket"))
      .write.mode(SaveMode.Append).partitionBy("span_bucket")
      .parquet(s"$dir/spans")
    ()
  }

  /** OPTIMIZE for the span table — same contract as
    * [[DedupIndex.compactBuckets]]: fold each append-grown bucket
    * directory back to one file, crash-safe via
    * [[graft.util.FoldCommit.compactPartitionedTree]]. Returns rows
    * rewritten; 0 when already compact.
    */
  def compactBuckets(spark: SparkSession, dir: String,
      store: graft.sources.CommitStore = graft.util.FoldCommit.DefaultStore): Long =
    graft.util.FoldCommit.compactPartitionedTree(spark, dir, "spans",
      "span_bucket", store)

  private case class Key(session: Int, sfDir: String)
  private val built = new graft.util.BoundedMemo[Key, String](4, _ => ())

  /** The contract query's memoized even-half index — exposed so the
    * bench warms the BUILD at the target corpus (`index_build` in the
    * artifact) and the timed query measures the probe path; the
    * correctness gate still runs build+probe cold.
    */
  def corpusIndexDir(t: graft.sources.Tables): String =
    built.getOrBuild(Key(System.identityHashCode(t.spark), t.sfDir)) {
      val d = graft.util.TempDirs.createWithCleanup("graft-span-idx")
      build(t.documents.select("doc_id", "text")
        .filter(col("doc_id") % 2 === 0), d, k = 8)
      d
    }

  /** Contract query — FULLY DuckDB-oracled (span overlap is plain
    * SQL): index the even-doc_id half of the corpus on disk, ingest
    * the odd half as a batch, report each convicted batch doc with its
    * distinct-span count and earliest indexed partner.
    */
  def qSpanIngest(t: graft.sources.Tables): DataFrame = {
    val dir = corpusIndexDir(t)
    checkBatch(t.spark, dir, t.documents.select("doc_id", "text")
        .filter(col("doc_id") % 2 === 1))
      .orderBy("doc_id")
  }
}
