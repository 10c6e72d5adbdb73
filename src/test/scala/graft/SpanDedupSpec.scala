package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.sources.Tables

/** Hand-graph semantics for the span-family operators (the DuckDB
  * oracle gates them on the real corpus; this pins the SEMANTICS on a
  * corpus built to exercise each rule): one shared 8-token span
  * convicts, earlier docs are never convicted by later ones, the
  * cross-source matrix counts distinct shared spans per source pair,
  * and the leakage-safe split puts a whole near-dup cluster on one
  * side.
  */
class SpanDedupSpec extends SparkSpecBase {

  // 8+ token docs; doc 1 and doc 2 share a verbatim 8-token run;
  // doc 3 shares nothing 8 tokens long (overlap of 7 only); doc 4
  // repeats doc 1 entirely from a different source
  private lazy val tinyTables: Tables = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-spandedup").toString
    val run = "t1 t2 t3 t4 t5 t6 t7 t8" // the convicting 8-token span
    Seq(
      (1L, s"$run a b c", "en", "srcA", 0),
      (2L, s"x y $run", "en", "srcB", 0),
      (3L, "t1 t2 t3 t4 t5 t6 t7 q r s", "en", "srcB", 0), // 7-overlap: innocent
      (4L, s"$run a b c", "en", "srcC", 0)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  test("one shared 8-token span convicts; 7 tokens never do; first doc survives") {
    val rows = Dedup.qSpanDedup(tinyTables).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!rows.contains(1L), "the FIRST holder of a span is never convicted")
    assert(rows(2L)._2 == 1L, s"doc 2's earliest partner must be doc 1: ${rows.get(2L)}")
    assert(!rows.contains(3L), "a 7-token overlap must not convict at k=8")
    // doc 4 repeats doc 1 verbatim: every one of its spans convicts
    // ("$run a b c" = 11 tokens -> 4 distinct spans)
    assert(rows(4L) == ((4L, 1L)), s"full duplicate: ${rows.get(4L)}")
  }

  // a license-header-style mega-hot span: one 8-token run shared by
  // every one of 10⁴ docs, each otherwise unique
  private lazy val hotTables: Tables = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-spanhot").toString
    val run = "h1 h2 h3 h4 h5 h6 h7 h8"
    (0 until 10000).map(i => (i.toLong, s"$run u${i}a u${i}b", "en", "src", 0))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  test("hot-span routing: a 10⁴-owner span never reaches the window; result is cap-invariant") {
    import org.apache.spark.sql.functions._
    // with the cap at 100, the mega-span's postings route via the
    // broadcast owner sliver and every surviving window partition is
    // bounded by the cap
    val routed = Dedup.routedSpans(
      hotTables.documents.select("doc_id", "text"), 8, 100)
      .persist()
    try {
      val hotRows = routed.filter(col("hot_first").isNotNull)
      assert(hotRows.count() == 10000L, "every mega-span posting is routed hot")
      assert(hotRows.select("span").distinct().count() == 1L)
      assert(hotRows.filter(col("hot_first") =!= 0L).count() == 0L,
        "the sliver's owner is the global min doc_id")
      val maxWindowPartition = routed.filter(col("hot_first").isNull)
        .groupBy("span", "_salt").count()
        .agg(max("count")).head().getLong(0)
      assert(maxWindowPartition <= 100L,
        s"cold window partitions must be df-capped, got $maxWindowPartition")
    } finally { routed.unpersist(); () }
    // semantics are cap-invariant: the routed plan at cap 100 equals
    // the unrouted pure-window plan (cap = MaxValue → empty sliver)
    val capped = Dedup.qSpanDedup(hotTables, 8, hotCap = 100).collect().toSet
    val unrouted = Dedup.qSpanDedup(hotTables, 8, hotCap = Int.MaxValue).collect().toSet
    assert(capped == unrouted, "routing must not change results")
    // and both match the obvious expectation: every doc but the first
    // convicts on exactly the one shared span, partner = doc 0
    assert(capped.size == 9999)
    assert(capped.forall(r => r.getLong(1) == 1L && r.getLong(2) == 0L))
  }

  test("span index: oversized batch drops the broadcast but keeps the bucket prune and results") {
    import spark.implicits._
    import graft.operators.SpanIndex
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-spanidx-gate").toString + "/idx"
    val corpus = tables.documents.select("doc_id", "text")
    SpanIndex.build(corpus.filter(col("doc_id") < 250), dir)
    val doc5 = corpus.filter($"doc_id" === 5L).as[(Long, String)].collect().head
    val fresh = (1 to 40).map(i => s"gatefresh$i").mkString(" ")
    val batch = Seq((910000L, doc5._2), (910001L, fresh)).toDF("doc_id", "text")
    val viaBroadcast = SpanIndex.checkBatch(spark, dir, batch).collect().toSet
    // maxBroadcastRows = 0 forces the shuffle-join fallback
    val gated = SpanIndex.checkBatch(spark, dir, batch, maxBroadcastRows = 0L)
    assert(gated.collect().toSet == viaBroadcast,
      "the non-broadcast path must return identical convictions")
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("span_bucket"),
      "bucket pruning must not depend on the broadcast hint: " + plan.take(800))
  }

  test("containment grades overlap: full duplicates 1.0, partial overlap below the cut") {
    // doc 4 repeats doc 1 verbatim → containment 1.0 (all 4 spans
    // owned earlier); doc 2 shares exactly 1 of its 3 spans (run at
    // the tail of an 11-token doc) → 0.33, below the 0.5 cut; doc 1
    // owns everything it has → 0.0
    val rows = Dedup.qSpanContainment(tinyTables).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows.keySet == Set(4L), s"only the full duplicate passes 0.5: $rows")
    assert(rows(4L) == 1.0)
    val all = Dedup.qSpanContainment(tinyTables, threshold = 0.0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(all(1L)._2 == 0L, "the first owner shares nothing backward")
    assert(all(2L) == ((3L, 1L)), s"doc 2: 1 of 3 spans shared: ${all(2L)}")
  }

  test("cross-source matrix counts distinct shared spans per source pair") {
    val m = Dedup.qCrossSourceOverlap(tinyTables).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // srcA(doc1) vs srcB(doc2): exactly the one 8-token run
    assert(m(("srcA", "srcB")) == 1L, s"A-B: $m")
    // srcA(doc1) vs srcC(doc4): identical docs -> all 4 spans
    assert(m(("srcA", "srcC")) == 4L, s"A-C: $m")
    assert(m(("srcB", "srcC")) == 1L, s"B-C: $m")
    assert(m.size == 3, s"no other pair overlaps: $m")
  }

  test("span index: absorb makes docs discoverable; corpus side scans pruned, batch broadcasts") {
    import spark.implicits._
    import graft.operators.SpanIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-spanidx-spec").toString + "/idx"
    val corpus = tables.documents.select("doc_id", "text")
    SpanIndex.build(corpus.filter(org.apache.spark.sql.functions.col("doc_id") < 250), dir)
    // a verbatim copy of an UNINDEXED doc: clean until absorbed
    val doc300 = corpus.filter($"doc_id" === 300L).as[(Long, String)].collect().head
    val batch = Seq((900000L, doc300._2)).toDF("doc_id", "text")
    assert(SpanIndex.checkBatch(spark, dir, batch).count() == 0)
    SpanIndex.absorb(spark, dir, corpus.filter($"doc_id" === 300L))
    val after = SpanIndex.checkBatch(spark, dir, batch).collect()
    assert(after.length == 1 && after.head.getAs[Long]("first_partner") == 300L,
      after.mkString(","))
    // scale inversion: stored side scans with bucket PartitionFilters,
    // batch side broadcasts — the corpus never reshuffles per ingest
    val plan = SpanIndex.checkBatch(spark, dir, batch)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(plan.contains("PartitionFilters") && plan.contains("span_bucket"),
      plan.take(800))
  }

  test("span index: bucket compaction through the no-rename store keeps probes byte-identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.SpanIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-spanidx-cmp").toString + "/idx"
    val corpus = tables.documents.select("doc_id", "text")
    SpanIndex.build(corpus.filter(col("doc_id") < 200), dir)
    (200L until 260L by 20).foreach(lo =>
      SpanIndex.absorb(spark, dir, corpus.filter(col("doc_id").between(lo, lo + 19))))
    val spansRoot = java.nio.file.Paths.get(dir, "spans")
    def nFiles() = graft.util.FoldCommit.listDataFiles(spansRoot).size
    def nDirs() = graft.util.FoldCommit.listDataFiles(spansRoot)
      .map(_.getParent).distinct.size
    val doc42 = corpus.filter($"doc_id" === 42L).as[(Long, String)].collect().head
    val batch = Seq((910000L, doc42._2)).toDF("doc_id", "text")
    val before = SpanIndex.checkBatch(spark, dir, batch).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shared"),
        r.getAs[Long]("first_partner"))).toSet
    assert(before.nonEmpty)
    assert(nFiles() > nDirs(), s"absorbs should leave multi-file buckets (${nFiles()})")
    // the OPTIMIZE commits through the simulated object-store claim
    // (conditional PUT, no rename) — the deployment shape at 100 TB
    val rewritten = SpanIndex.compactBuckets(spark, dir,
      graft.sources.CommitStore.simulatedConditionalPut())
    assert(rewritten > 0)
    assert(nFiles() == nDirs(), s"compaction should leave 1 file/bucket, saw ${nFiles()}/${nDirs()}")
    assert(SpanIndex.compactBuckets(spark, dir) == 0L) // idempotent no-op
    val after = SpanIndex.checkBatch(spark, dir, batch).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shared"),
        r.getAs[Long]("first_partner"))).toSet
    assert(after == before, s"compaction changed probe results: ${after.diff(before)}")
  }

  test("span index streaming ingest: per micro-batch check, clean docs absorb") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.operators.SpanIndex
    val corpus = tables.documents.select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-spanidx-stream").toString + "/idx"
    SpanIndex.build(corpus.filter(col("doc_id") < 100), dir)
    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val hits = SpanIndex.checkBatch(spark, dir, batch)
          .select("doc_id", "first_partner").as[(Long, Long)].collect()
        flagged ++= hits
        val hitIds = hits.map(_._1)
        SpanIndex.absorb(spark, dir, batch.filter(!col("doc_id").isin(hitIds: _*)))
      }.start()
    try {
      val fresh = (1 to 40).map(i => s"spanstream$i").mkString(" ")
      val doc5 = corpus.filter(col("doc_id") === 5L).as[(Long, String)].collect().head._2
      // batch 1: a verbatim copy of indexed doc 5 (convicted, not
      // absorbed) and a fresh doc (clean, absorbed)
      input.addData((400001L, doc5), (400002L, fresh))
      q.processAllAvailable()
      assert(flagged.toSet == Set((400001L, 5L)), flagged)
      // batch 2: a copy of the absorbed fresh doc convicts against it
      input.addData((400003L, fresh))
      q.processAllAvailable()
      assert(flagged.toSet == Set((400001L, 5L), (400003L, 400002L)), flagged)
    } finally q.stop()
  }

  test("leakage-safe split keeps every near-dup cluster on one side") {
    // real-corpus form: totals conserve and every split id is legal
    val t = tables // the shared sf0.001 corpus
    val rows = Dedup.qLeakageSafeSplit(t).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet.subsetOf(Set("train", "val", "test")))
    val total = rows.values.map(_._1).sum
    assert(total == t.documents.count(), "every doc lands in exactly one split")
    // the invariant itself: split is a FUNCTION of cluster_id, so two
    // docs with one cluster can't diverge — assert on the assignment
    // path by reconstructing it
    import org.apache.spark.sql.functions._
    val labels = Dedup.corpusDupLabels(t)
    val perCluster = t.documents.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(col("cluster_id") % 10 < 8, "train")
          .when(col("cluster_id") % 10 === 8, "val").otherwise("test"))
      .groupBy("cluster_id").agg(countDistinct("split").as("n_splits"))
      .agg(max("n_splits")).head().getLong(0)
    assert(perCluster == 1L, "a cluster straddled a split boundary")
  }
}
