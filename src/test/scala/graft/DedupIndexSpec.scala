package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupIndex
import graft.operators.DedupIndex.Params

class DedupIndexSpec extends SparkSpecBase {

  private val params = Params(numHashes = 64, bands = 16, shingleSize = 5,
    threshold = 0.5)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-idx-spec").toString + "/idx"

  test("a planted near-dup batch is flagged against the indexed corpus; fresh docs pass") {
    import spark.implicits._
    val corpus = tables.documents.select("doc_id", "text")
    val dir = tmp()
    DedupIndex.build(corpus, dir, params)
    // batch: two exact copies of indexed docs (new ids), one perturbed
    // copy, one genuinely fresh doc
    val src = corpus.filter(col("doc_id").isin(1L, 2L, 3L))
      .as[(Long, String)].collect().toMap
    val batch = Seq(
      (100001L, src(1L)),
      (100002L, src(2L)),
      (100003L, src(3L).split(" ").patch(3, Seq("xyzzy"), 0).mkString(" ")),
      (100004L, Seq.fill(40)("completelyfreshtoken").zipWithIndex
        .map { case (w, i) => s"$w$i" }.mkString(" "))
    ).toDF("doc_id", "text")
    val hits = DedupIndex.checkBatch(spark, dir, batch).collect()
    val byDoc = hits.groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => r.getAs[Long]("dup_of") -> r.getAs[Double]("est_jaccard"))).toMap
    // exact copies flag their source with estimate 1.0
    assert(byDoc(100001L).exists { case (d, j) => d == 1L && j == 1.0 })
    assert(byDoc(100002L).exists { case (d, j) => d == 2L && j == 1.0 })
    // the perturbed copy still flags its source (high but < exact)
    assert(byDoc(100003L).exists { case (d, _) => d == 3L })
    // the fresh doc is clean
    assert(!byDoc.contains(100004L))
  }

  test("absorb makes a batch discoverable; the corpus side scans, never shuffles") {
    import spark.implicits._
    val corpus = tables.documents.select("doc_id", "text")
    val dir = tmp()
    DedupIndex.build(corpus.filter(col("doc_id") < 250), dir, params)
    val doc = corpus.filter(col("doc_id") === 300L).as[(Long, String)].collect().head
    val asBatch = Seq((200000L, doc._2)).toDF("doc_id", "text")
    // not indexed yet: no hit for a copy of doc 300
    assert(DedupIndex.checkBatch(spark, dir, asBatch).count() == 0)
    DedupIndex.absorb(spark, dir, corpus.filter(col("doc_id") === 300L))
    // after absorbing, the same copy is flagged against 300
    val after = DedupIndex.checkBatch(spark, dir, asBatch).collect()
    assert(after.exists(r => r.getAs[Long]("dup_of") == 300L &&
      r.getAs[Double]("est_jaccard") == 1.0), after.mkString(","))
    // scale inversion in the plan: the batch broadcasts (the stored
    // corpus is joined without an exchange on its side) and the scan
    // carries the bucket PartitionFilters
    val plan = DedupIndex.checkBatch(spark, dir, asBatch)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(plan.contains("PartitionFilters") && plan.contains("bh_bucket"),
      plan.take(800))
  }

  test("streaming ingest: each micro-batch checks against the index, clean docs absorb") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val corpus = tables.documents.select("doc_id", "text")
    val dir = tmp()
    DedupIndex.build(corpus.filter(col("doc_id") < 100), dir, params)
    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val dups = DedupIndex.checkBatch(spark, dir, batch)
          .select("doc_id", "dup_of").as[(Long, Long)].collect()
        flagged ++= dups
        val dupIds = dups.map(_._1).distinct
        DedupIndex.absorb(spark, dir,
          batch.filter(!col("doc_id").isin(dupIds: _*)))
      }.start()
    try {
      val freshText = (1 to 40).map(i => s"streamfresh$i").mkString(" ")
      val doc5 = corpus.filter(col("doc_id") === 5L).as[(Long, String)].collect().head._2
      // batch 1: a copy of indexed doc 5 (flagged, NOT absorbed) and a
      // fresh doc (clean, absorbed)
      input.addData((300001L, doc5), (300002L, freshText))
      q.processAllAvailable()
      assert(flagged.toSet == Set((300001L, 5L)), flagged)
      // batch 2: a copy of the absorbed fresh doc — now flagged
      // against 300002, proving the absorb landed
      input.addData((300003L, freshText))
      q.processAllAvailable()
      assert(flagged.toSet == Set((300001L, 5L), (300003L, 300002L)), flagged)
    } finally q.stop()
  }

  test("bucket compaction shrinks the file count, preserves results, and recovers mid-fold") {
    import spark.implicits._
    val corpus = tables.documents.select("doc_id", "text")
    val dir = tmp()
    DedupIndex.build(corpus.filter(col("doc_id") < 200), dir, params)
    // several absorbs: each appends a file per touched bucket
    (200L until 260L by 20).foreach(lo =>
      DedupIndex.absorb(spark, dir,
        corpus.filter(col("doc_id").between(lo, lo + 19))))
    val bands = java.nio.file.Paths.get(dir, "bands")
    def nFiles() = graft.util.FoldCommit.listDataFiles(bands).size
    def nDirs() = graft.util.FoldCommit.listDataFiles(bands)
      .map(_.getParent).distinct.size
    val doc = corpus.filter(col("doc_id") === 42L).as[(Long, String)].collect().head
    val batch = Seq((500000L, doc._2)).toDF("doc_id", "text")
    val before = DedupIndex.checkBatch(spark, dir, batch).collect()
      .map(r => (r.getAs[Long]("dup_of"), r.getAs[Double]("est_jaccard"))).toSet
    assert(nFiles() > nDirs(), s"absorbs should leave multi-file buckets (${nFiles()})")
    // through the SIMULATED OBJECT STORE claim: the whole battery below
    // (one file per bucket, idempotence, byte-identical probes, crash
    // recovery) holds when the commit point is a conditional PUT with
    // no rename — the 100 TB deployment shape
    val rewritten = DedupIndex.compactBuckets(spark, dir,
      graft.sources.CommitStore.simulatedConditionalPut())
    assert(rewritten > 0)
    assert(nFiles() == nDirs(), s"compaction should leave 1 file/bucket, saw ${nFiles()}/${nDirs()}")
    // idempotent: already-compact tree is a no-op
    assert(DedupIndex.compactBuckets(spark, dir) == 0L)
    val after = DedupIndex.checkBatch(spark, dir, batch).collect()
      .map(r => (r.getAs[Long]("dup_of"), r.getAs[Double]("est_jaccard"))).toSet
    assert(after == before, s"compaction changed probe results: ${after.diff(before)}")
    // crash window: stage + commit marker written, moves/deletes not
    // run — the next maintenance call (recover inside compactBuckets)
    // must roll the fold forward without doubling rows
    val files = graft.util.FoldCommit.listDataFiles(bands)
    val rows = spark.read.option("basePath", bands.toString)
      .parquet(files.map(_.toString): _*)
    val total = rows.count()
    rows.write.mode("overwrite").partitionBy("bh_bucket")
      .parquet(graft.util.FoldCommit.stageDir(dir, "cafe0001").toString)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_fold_commit.txt"),
      (Seq("cafe0001", "bands") ++ files.map(f =>
        java.nio.file.Paths.get(dir).relativize(f).toString)).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(DedupIndex.compactBuckets(spark, dir) == 0L) // recover path, then no-op
    assert(spark.read.parquet(s"$dir/bands").count() == total,
      "roll-forward must land the staged rewrite exactly once")
    assert(DedupIndex.checkBatch(spark, dir, batch).collect()
      .map(r => (r.getAs[Long]("dup_of"), r.getAs[Double]("est_jaccard"))).toSet == before)
  }

  test("contract query flags cross-half near-dups consistent with the in-session LSH") {
    val ingest = DedupIndex.qDedupIngest(tables).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"))).toSet
    // every (odd vs even) pair the in-session LSH reports must be
    // found by the incremental path too (same signatures, same bands)
    val lsh = graft.operators.Dedup.qMinhashLsh(tables).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .filter { case (a, b) => (a % 2 == 0) != (b % 2 == 0) }
      .map { case (a, b) => if (a % 2 == 1) (a, b) else (b, a) }.toSet
    assert(lsh.subsetOf(ingest), s"missing: ${lsh -- ingest}")
  }
}
