package graft

import org.apache.spark.sql.functions._

import graft.operators.TextIndex

/** Persisted inverted text index: pruned search, index-served BM25
  * equal to the corpus-scan formula, incremental absorb, crash-safe
  * compaction (SURVEY §2.5).
  */
class TextIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-textidx-$tag").toString + "/idx"

  test("search: AND requires every term, OR admits any; tf sums per doc") {
    val dir = freshDir("and-or")
    val docs = Seq(
      (1L, "spark merge spark window"),
      (2L, "merge only here"),
      (3L, "spark alone"),
      (4L, "nothing relevant")).toDF("doc_id", "text")
    TextIndex.build(docs, dir)
    val both = TextIndex.search(spark, dir, Seq("spark", "merge")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(both == Set((1L, 2L, 3L)), s"only doc 1 has both: ${both.mkString(",")}")
    val any = TextIndex.search(spark, dir, Seq("spark", "merge"),
      requireAll = false).collect().map(_.getLong(0)).toSet
    assert(any == Set(1L, 2L, 3L))
    // a duplicated query term must not relax the AND bar
    val dup = TextIndex.search(spark, dir, Seq("spark", "spark", "merge"))
      .collect().map(_.getLong(0)).toSet
    assert(dup == Set(1L))
  }

  test("probe plan: PartitionFilters prune to the query terms' buckets; no corpus shuffle before the agg") {
    val dir = freshDir("prune")
    TextIndex.build(tables.documents.select("doc_id", "text"), dir)
    val q = TextIndex.search(spark, dir, Seq("spark", "merge"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tok_bucket"),
      "term-bucket pruning must reach the scan: " + plan.take(800))
    // driver-side bucket hashing must agree with the executor's
    // pmod(xxhash64, n) — otherwise pruning silently drops postings
    val viaSpark = Seq("spark", "merge", "window", "the")
      .toDF("token")
      .select(col("token"), pmod(xxhash64(col("token")), lit(64)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    viaSpark.foreach { case (term, b) =>
      assert(TextIndex.bucketOf(term, 64) == b, s"bucket mismatch for $term")
    }
  }

  test("absorb makes docs searchable and shifts the BM25 constants exactly") {
    val dir = freshDir("absorb")
    val first = Seq(
      (1L, "spark merge window"),
      (2L, "spark spark spark filter")).toDF("doc_id", "text")
    val second = Seq(
      (3L, "merge merge spark"),
      (4L, "window pad pad pad pad pad")).toDF("doc_id", "text")
    TextIndex.build(first, dir)
    assert(TextIndex.search(spark, dir, Seq("merge"), requireAll = false)
      .collect().map(_.getLong(0)).toSet == Set(1L))
    TextIndex.absorb(spark, dir, second)
    assert(TextIndex.search(spark, dir, Seq("merge"), requireAll = false)
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // index-served BM25 over build+absorb == the same formula computed
    // directly over the full 4-doc corpus (same operand order)
    val full = first.union(second)
    val got = TextIndex.bm25(spark, dir, Seq("spark", "merge"), topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getInt(4))).toSet
    val expect = corpusScanBm25(full, Seq("spark", "merge"))
    assert(got == expect, s"index path diverged:\n got=$got\n exp=$expect")
  }

  /** The corpus-scan BM25 reference — TextAnalysis.qBm25's exact plan
    * but with avgdl spelled sum/count like the index's ledger fold.
    */
  private def corpusScanBm25(docs: org.apache.spark.sql.DataFrame,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : Set[(String, Long, Double, Int)] = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Rnd.round
    val toks = split(col("text"), " ")
    val tok = docs.select(col("doc_id"), explode(toks).as("token"))
    val dl = docs.select(col("doc_id"), size(toks).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val tf = tok.filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1))
    val denom = col("tf") + lit(k1) *
      (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(dl, "doc_id").join(broadcast(df), "token")
      .crossJoin(broadcast(corpus))
      .withColumn("score", round(idf * col("tf") * lit(k1 + 1) / denom, 4))
      .withColumn("rk", row_number().over(
        Window.partitionBy("token").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rk") <= 10)
      .collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"), r.getAs[Int]("rk"))).toSet
  }

  test("corpus contract path: index bm25 == corpus-scan bm25 on the test corpus") {
    val dir = freshDir("corpus")
    val docs = tables.documents.select("doc_id", "text")
    TextIndex.build(docs.filter(col("doc_id") % 2 === 0), dir)
    TextIndex.absorb(spark, dir, docs.filter(col("doc_id") % 2 === 1))
    val got = TextIndex.bm25(spark, dir, Seq("spark", "merge", "window"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getInt(4))).toSet
    assert(got == corpusScanBm25(docs, Seq("spark", "merge", "window")))
  }

  test("phrase search: adjacency from positions, overlap-exact counts, multi-term folds") {
    val dir = freshDir("phrase")
    val docs = Seq(
      (1L, "a spark merge b spark merge"),   // two bigram hits
      (2L, "spark x merge"),                 // terms present, not adjacent
      (3L, "merge merge merge"),             // overlapping self-bigram
      (4L, "spark merge window done"),       // trigram host
      (5L, "nothing here")).toDF("doc_id", "text")
    TextIndex.build(docs, dir)
    val bigram = TextIndex.phraseSearch(spark, dir, Seq("spark", "merge"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bigram == Set((1L, 2L), (4L, 1L)), bigram.toString)
    val selfOverlap = TextIndex.phraseSearch(spark, dir, Seq("merge", "merge"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(selfOverlap == Set((3L, 2L)), "overlapping occurrences count individually")
    val trigram = TextIndex.phraseSearch(spark, dir, Seq("spark", "merge", "window"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(trigram == Set((4L, 1L)))
    // one term degenerates to tf (bucket pruning of the shared
    // matchedPostings path is pinned by the probe-plan test above;
    // here the scan hides behind the phrase fold's local checkpoint)
    val one = TextIndex.phraseSearch(spark, dir, Seq("merge"))
    assert(one.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (2L, 1L), (3L, 3L), (4L, 1L)))
    // phrases see streamed epochs too
    TextIndex.absorbEpoch(spark, dir,
      Seq((10L, "spark merge again")).toDF("doc_id", "text"), epochId = 0L)
    assert(TextIndex.phraseSearch(spark, dir, Seq("spark", "merge"))
      .collect().map(_.getLong(0)).toSet.contains(10L))
  }

  test("nearSearch: pair counts in both modes; ordered k=1 equals the phrase; epochs visible; same-term excludes self-pairs") {
    val dir = freshDir("near")
    val docs = Seq(
      (1L, "spark x merge"),        // gap 2: any+ord at k>=2
      (2L, "merge x x spark"),      // b before a: any only (gap 3)
      (3L, "spark merge spark"),    // pairs both ways + adjacency
      (4L, "spark x x x x merge"),  // gap 5: outside k=3
      (5L, "nothing here")).toDF("doc_id", "text")
    TextIndex.build(docs, dir)
    def rows(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val any3 = rows(TextIndex.nearSearch(spark, dir, "spark", "merge", k = 3))
    // doc3: spark@1,3 merge@2 → pairs (1,2),(3,2) = 2
    assert(any3 == Map(1L -> 1L, 2L -> 1L, 3L -> 2L), any3.toString)
    val ord3 = rows(TextIndex.nearSearch(spark, dir, "spark", "merge", k = 3,
      ordered = true))
    assert(ord3 == Map(1L -> 1L, 3L -> 1L), ord3.toString)
    // ordered with k=1 IS the two-term phrase
    val ord1 = rows(TextIndex.nearSearch(spark, dir, "spark", "merge", k = 1,
      ordered = true))
    val phrase = rows(TextIndex.phraseSearch(spark, dir, Seq("spark", "merge")))
    assert(ord1 == phrase && phrase == Map(3L -> 1L), s"$ord1 vs $phrase")
    // same term: a position never pairs with itself
    val self = rows(TextIndex.nearSearch(spark, dir, "spark", "spark", k = 3))
    assert(self == Map(3L -> 2L), self.toString) // (1,3) and (3,1)
    // streamed epochs serve proximity too
    TextIndex.absorbEpoch(spark, dir,
      Seq((10L, "merge near spark")).toDF("doc_id", "text"), epochId = 0L)
    assert(rows(TextIndex.nearSearch(spark, dir, "spark", "merge", k = 3))
      .contains(10L))
  }

  test("TVF surface: text_search/text_phrase/text_near/text_bm25 over SQL keep bucket pruning, service path included") {
    val dir = freshDir("tvf")
    TextIndex.build(Seq(
      (1L, "spark merge spark window"),
      (2L, "merge only here"),
      (3L, "spark alone"),
      (4L, "spark x x merge")).toDF("doc_id", "text"), dir)
    // plain SQL: AND search
    val s = spark.sql(s"SELECT * FROM text_search('$dir', 'spark,merge') ORDER BY doc_id")
    assert(s.collect().map(_.getLong(0)).toSeq == Seq(1L, 4L))
    // OR mode via the third arg
    assert(spark.sql(
      s"SELECT doc_id FROM text_search('$dir', 'spark,merge', false) ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // phrase and proximity
    assert(spark.sql(s"SELECT doc_id FROM text_phrase('$dir', 'spark merge')")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql(
      s"SELECT doc_id, n_hits FROM text_near('$dir', 'spark', 'merge', 3) ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (4L, 1L)))
    // bm25 serves the ranked shape
    assert(spark.sql(s"SELECT * FROM text_bm25('$dir', 'spark', 2)")
      .collect().length == 2)
    // the TVF plan keeps the driver-computed bucket pruning
    val plan = s.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tok_bucket"),
      "TVF probes must stay bucket-pruned: " + plan.take(800))
    // the service's SQL entry point (the REST /sql engine) serves it too
    val svc = new graft.service.QueryService(spark)
    assert(svc.sql(s"SELECT doc_id FROM text_search('$dir', 'merge') ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    // index mutations are visible through the TVF (no stale cache):
    // absorb a doc, re-ask through the SAME service
    TextIndex.absorb(spark, dir, Seq((9L, "fresh merge doc")).toDF("doc_id", "text"))
    assert(svc.sql(s"SELECT doc_id FROM text_search('$dir', 'merge') ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 9L))
  }

  test("rebuild over a streamed index resets epochs, ledger, and the epoch fence") {
    val dir = freshDir("rebuild")
    TextIndex.build(Seq((1L, "old spark text")).toDF("doc_id", "text"), dir)
    TextIndex.absorbEpoch(spark, dir,
      Seq((2L, "old merge epoch")).toDF("doc_id", "text"), epochId = 0L)
    TextIndex.compactEpochs(spark, dir)
    assert(TextIndex.maxFoldedEpoch(dir) == 0L)
    // rebuild: nothing of the old index may survive
    TextIndex.build(Seq((10L, "new spark corpus")).toDF("doc_id", "text"), dir)
    assert(TextIndex.search(spark, dir, Seq("merge"), requireAll = false)
      .collect().isEmpty, "old epoch postings leaked through the rebuild")
    assert(TextIndex.search(spark, dir, Seq("spark"), requireAll = false)
      .collect().map(_.getLong(0)).toSet == Set(10L))
    assert(TextIndex.maxFoldedEpoch(dir) == -1L,
      "a stale high-water mark would fence out the new stream's epoch 0")
    // the fresh stream's epoch 0 must land
    assert(TextIndex.absorbEpoch(spark, dir,
      Seq((11L, "new merge doc")).toDF("doc_id", "text"), epochId = 0L) > 0)
    assert(TextIndex.search(spark, dir, Seq("merge"), requireAll = false)
      .collect().map(_.getLong(0)).toSet == Set(11L))
  }

  test("rebuild clears stale postings buckets under partitionOverwriteMode=dynamic") {
    val dir = freshDir("rebuild-dyn")
    val prior = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // the old corpus fills many tok_bucket partitions; the new one
      // hits few — a rebuild relying on SaveMode.Overwrite alone would
      // leave the old corpus's untouched buckets serving beside it
      TextIndex.build(tables.documents.select("doc_id", "text")
        .filter(col("doc_id") < 200), dir)
      TextIndex.build(Seq((10L, "solitary fresh corpus")).toDF("doc_id", "text"), dir)
      val stale = TextIndex.search(spark, dir, Seq("the", "a", "data", "spark"),
        requireAll = false).collect()
      assert(stale.isEmpty,
        s"old-corpus postings survived the dynamic-overwrite rebuild: ${stale.length} docs")
      assert(TextIndex.search(spark, dir, Seq("solitary"), requireAll = false)
        .collect().map(_.getLong(0)).toSet == Set(10L))
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("epoch absorb: visible immediately, replay converges, folded epochs skip") {
    val dir = freshDir("epoch")
    val docs = tables.documents.select("doc_id", "text")
    TextIndex.build(docs.filter(col("doc_id") < 50), dir)
    val batch = Seq((900001L, "spark merge window"),
      (900002L, "unrelated words here")).toDF("doc_id", "text")
    assert(TextIndex.absorbEpoch(spark, dir, batch, epochId = 0L) > 0)
    assert(TextIndex.search(spark, dir, Seq("spark", "merge"))
      .collect().map(_.getLong(0)).toSet.contains(900001L))
    // full-pipeline consistency through the epoch tree: index BM25 ==
    // corpus-scan BM25 over base + epoch docs (corpusStats exercises
    // the epoch-derived (n_docs, sum_dl) path)
    val full = docs.filter(col("doc_id") < 50).union(batch)
    val viaIndex = TextIndex.bm25(spark, dir, Seq("spark", "merge"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getInt(4))).toSet
    assert(viaIndex == corpusScanBm25(full, Seq("spark", "merge")))
    // redelivery of the SAME epoch overwrites its own directory — the
    // index converges instead of doubling
    assert(TextIndex.absorbEpoch(spark, dir, batch, epochId = 0L) > 0)
    assert(TextIndex.bm25(spark, dir, Seq("spark", "merge"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getInt(4))).toSet
      == viaIndex)
    // fold, then a redelivery of the folded epoch must skip whole
    val before = viaIndex
    assert(TextIndex.compactEpochs(spark, dir) > 0)
    assert(TextIndex.maxFoldedEpoch(dir) == 0L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "epochs")))
    assert(TextIndex.absorbEpoch(spark, dir, batch, epochId = 0L) == 0L)
    assert(TextIndex.bm25(spark, dir, Seq("spark", "merge"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getInt(4))).toSet
      == before, "fold + skipped replay must leave scores identical")
    // a fresh epoch above the mark still lands
    assert(TextIndex.absorbEpoch(spark, dir,
      Seq((900003L, "spark spark")).toDF("doc_id", "text"), epochId = 1L) > 0)
    assert(TextIndex.search(spark, dir, Seq("spark"), requireAll = false)
      .collect().map(_.getLong(0)).toSet.contains(900003L))
  }

  test("streaming sink: micro-batches land exactly-once and self-compact on the cadence") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = freshDir("stream")
    TextIndex.build(tables.documents.select("doc_id", "text")
      .filter(col("doc_id") < 20), dir)
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft-textidx-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.TextIndexStreamSink(dir, checkpoint, compactEvery = 2)
      .start(input.toDF().toDF("doc_id", "text"))
    try {
      input.addData((910001L, "spark merge window"))
      q.processAllAvailable()
      assert(TextIndex.search(spark, dir, Seq("spark", "merge"))
        .collect().map(_.getLong(0)).toSet.contains(910001L))
      input.addData((910002L, "merge merge spark"))
      q.processAllAvailable() // epoch 1 → cadence boundary → inline fold
      assert(TextIndex.search(spark, dir, Seq("merge"), requireAll = false)
        .collect().map(_.getLong(0)).toSet
        .intersect(Set(910001L, 910002L)) == Set(910001L, 910002L))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "epochs")),
        "the cadence boundary must have folded the epoch trees inline")
      assert(TextIndex.maxFoldedEpoch(dir) >= 1L)
    } finally q.stop()
  }

  test("compaction folds buckets and the stats ledger; probes byte-identical through the no-rename store") {
    val dir = freshDir("compact")
    val docs = tables.documents.select("doc_id", "text")
    TextIndex.build(docs.filter(col("doc_id") < 100), dir)
    (100L until 160L by 20).foreach(lo =>
      TextIndex.absorb(spark, dir, docs.filter(col("doc_id").between(lo, lo + 19))))
    val postRoot = java.nio.file.Paths.get(dir, "postings")
    val statsRoot = java.nio.file.Paths.get(dir, "stats")
    def nFiles() = graft.util.FoldCommit.listDataFiles(postRoot).size
    def nDirs() = graft.util.FoldCommit.listDataFiles(postRoot)
      .map(_.getParent).distinct.size
    def statsFiles() = graft.util.FoldCommit.listDataFiles(statsRoot).size
    assert(nFiles() > nDirs(), s"absorbs should leave multi-file buckets (${nFiles()})")
    assert(statsFiles() == 4, s"one ledger row per commit: ${statsFiles()}")
    val terms = Seq("spark", "merge", "window")
    val before = TextIndex.bm25(spark, dir, terms).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toSet
    val searchBefore = TextIndex.search(spark, dir, terms, requireAll = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rewritten = TextIndex.compact(spark, dir,
      graft.sources.CommitStore.simulatedConditionalPut())
    assert(rewritten > 0)
    assert(nFiles() == nDirs(), s"1 file/bucket after compaction, saw ${nFiles()}/${nDirs()}")
    assert(statsFiles() == 1, s"ledger folds to one row: ${statsFiles()}")
    val after = TextIndex.bm25(spark, dir, terms).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toSet
    assert(after == before, "compaction changed BM25 output")
    assert(TextIndex.search(spark, dir, terms, requireAll = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == searchBefore)
    // idempotent: a second OPTIMIZE finds nothing to fold
    assert(TextIndex.compact(spark, dir) == 0L)
    // and the index still absorbs after folding
    TextIndex.absorb(spark, dir,
      Seq((990001L, "spark merge window")).toDF("doc_id", "text"))
    assert(TextIndex.search(spark, dir, Seq("spark", "merge"))
      .collect().map(_.getLong(0)).toSet.contains(990001L))
  }
}
