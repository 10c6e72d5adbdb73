package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IvfIndex, SemDedupIndex, Similarity}

class SemDedupIngestSpec extends SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-semdd-spec").toString + "/idx"

  private def buildIdx(dir: String, filter: org.apache.spark.sql.Column): Unit = {
    val idx = IvfIndex.build(
      tables.embeddings.select("vec_id", "embedding").filter(filter),
      cells = 8, iters = 2)
    idx.save(dir); idx.unpersist()
  }

  test("a planted exact copy is flagged against the indexed corpus; a far vector passes") {
    import spark.implicits._
    val dir = tmp()
    buildIdx(dir, col("vec_id") < 250)
    val src = tables.embeddings.filter(col("vec_id") === 7L)
      .select("embedding").as[Array[Float]].collect().head
    // batch: an exact copy of indexed vector 7 (cos = 1.0, same cell by
    // construction) and its negation (cos = -1.0 against 7; below the
    // threshold against everything in a 0.45-threshold corpus tail)
    val batch = Seq(
      (900001L, src),
      (900002L, src.map(x => -x))
    ).toDF("vec_id", "embedding")
    val hits = SemDedupIndex.checkBatch(spark, dir, batch).collect()
    assert(hits.exists(r => r.getAs[Long]("vec_id") == 900001L &&
      r.getAs[Long]("dup_of") == 7L && r.getAs[Double]("cos") == 1.0),
      hits.mkString(","))
    assert(!hits.exists(r => r.getAs[Long]("vec_id") == 900002L &&
      r.getAs[Double]("cos") > 0.99), hits.mkString(","))
  }

  test("absorb makes a batch discoverable; the corpus side scans cell-pruned, never shuffles") {
    import spark.implicits._
    val dir = tmp()
    buildIdx(dir, col("vec_id") < 250)
    val vec300 = tables.embeddings.filter(col("vec_id") === 300L)
      .select("vec_id", "embedding")
    val copy = Seq((900300L,
      vec300.select("embedding").as[Array[Float]].collect().head))
      .toDF("vec_id", "embedding")
    def exactHits() = SemDedupIndex.checkBatch(spark, dir, copy)
      .filter(col("cos") === 1.0).collect()
    // not indexed yet: no exact hit for a copy of vector 300
    assert(!exactHits().exists(_.getAs[Long]("dup_of") == 300L))
    SemDedupIndex.absorb(spark, dir, vec300)
    // after absorbing, the same copy is flagged against 300 exactly
    assert(exactHits().exists(_.getAs[Long]("dup_of") == 300L))
    // scale inversion in the plan: the batch broadcasts (no exchange on
    // the stored corpus's side of the join) and the stored scan carries
    // the cell PartitionFilters from the batch's touched cells
    val plan = SemDedupIndex.checkBatch(spark, dir, copy)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      plan.take(800))
  }

  test("streaming ingest: micro-batches check against the index, clean vectors absorb per epoch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = tmp()
    buildIdx(dir, col("vec_id") < 100)
    val vecOf = tables.embeddings.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epochId: Long) =>
        val dups = SemDedupIndex.checkBatch(spark, dir, batch)
          .filter(col("cos") === 1.0)
          .select("vec_id", "dup_of").as[(Long, Long)].collect()
        flagged ++= dups
        val dupIds = dups.map(_._1).distinct
        IvfIndex.appendEpoch(spark, dir,
          batch.filter(!col("vec_id").isin(dupIds: _*)), epochId)
        ()
      }.start()
    try {
      // batch 1: an exact copy of indexed vector 5 (flagged, NOT
      // absorbed) and a fresh out-of-index vector (clean, absorbed
      // into its epoch directory)
      input.addData((700001L, vecOf(5L)), (700002L, vecOf(401L)))
      q.processAllAvailable()
      assert(flagged.toSet == Set((700001L, 5L)), flagged)
      // batch 2: a copy of the absorbed fresh vector — now flagged
      // against 700002 THROUGH the epochs/ tree, proving checkBatch
      // unions streamed rows into the stored side
      input.addData((700003L, vecOf(401L)))
      q.processAllAvailable()
      assert(flagged.toSet == Set((700001L, 5L), (700003L, 700002L)), flagged)
    } finally q.stop()
  }

  test("epoch compaction folds streamed rows into the base file; interrupted folds roll forward") {
    import spark.implicits._
    val dir = tmp()
    buildIdx(dir, col("vec_id") < 100)
    val vecs = tables.embeddings.select("vec_id", "embedding")
    // two streamed epochs land under epochs/
    IvfIndex.appendEpoch(spark, dir, vecs.filter(col("vec_id").between(200, 219)), 1L)
    IvfIndex.appendEpoch(spark, dir, vecs.filter(col("vec_id").between(300, 319)), 2L)
    val before = IvfIndex.load(spark, dir).assigned
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir, "epochs")))
    // through the SIMULATED OBJECT STORE claim (no-rename conditional
    // PUT): the fold, the row-set identity, and the probe below all
    // hold on the 100 TB deployment's commit primitive
    val folded = IvfIndex.compactEpochs(spark, dir,
      graft.sources.CommitStore.simulatedConditionalPut())
    assert(folded == 40, s"expected 40 folded rows, got $folded")
    // epochs are gone, the visible row set is unchanged, probes work
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "epochs")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_fold_commit.txt")))
    val after = IvfIndex.load(spark, dir).assigned
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(after == before, s"compaction changed the row set: ${after.diff(before)}")
    val copy = Seq((900310L, tables.embeddings.filter(col("vec_id") === 310L)
      .select("embedding").as[Array[Float]].collect().head))
      .toDF("vec_id", "embedding")
    assert(SemDedupIndex.checkBatch(spark, dir, copy)
      .filter(col("cos") === 1.0).collect()
      .exists(_.getAs[Long]("dup_of") == 310L))
    // interrupted fold: stage + marker written (the commit point), but
    // no moves/deletes ran — load() must roll it forward to the same
    // end state a completed compaction reaches
    IvfIndex.appendEpoch(spark, dir, vecs.filter(col("vec_id").between(400, 409)), 3L)
    val savedRows = spark.read.parquet(s"$dir/epochs").drop("epoch")
      .withColumn("cell", col("cell").cast("long"))
    savedRows.select(spark.read.parquet(s"$dir/assigned")
        .withColumn("cell", col("cell").cast("long")).columns.map(col).toSeq: _*)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/_fold/deadbeef")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_fold_commit.txt"),
      "deadbeef\nassigned\nepochs/epoch=3"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val recovered = IvfIndex.load(spark, dir).assigned
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(recovered == (before ++ (400L to 409L)).sorted,
      "roll-forward must land epoch 3 exactly once")
    // reader-side recovery never deletes the epochs SHELL (that's the
    // writer's job — a reader's delete races the atomic epoch rename);
    // it must just hold no data files anymore
    val shell = java.nio.file.Paths.get(dir, "epochs")
    assert(!java.nio.file.Files.isDirectory(shell) ||
      graft.util.FoldCommit.listDataFiles(shell).isEmpty)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_fold")))
  }

  test("contract query finds every cross-half pair the batch SemDeDup blocks identically") {
    // the ingest path and the batch semDedupDrops use DIFFERENT
    // quantizers (even-half-trained vs full-corpus-trained), so their
    // cells differ — but an exact planted agreement exists where both
    // sides see the pair: every contract-query hit must be a genuine
    // cross-half cosine >= threshold pair (verified brute-force)
    val hits = SemDedupIndex.qSemDedupIngest(tables).collect()
    assert(hits.nonEmpty, "expected a non-trivial decision set at sf0.001")
    val e = tables.embeddings.select(col("vec_id"), col("embedding"))
    val brute = e.as("x").join(e.as("y"),
        col("x.vec_id") % 2 === 0 && col("y.vec_id") % 2 === 1)
      .withColumn("cos", graft.operators.Rnd.round(
        graft.functions.GraftFunctions.cosineSim(
          col("x.embedding"), col("y.embedding")), 2))
      .filter(col("cos") >= SemDedupIndex.Threshold)
      .select(col("y.vec_id").as("vec_id"), col("x.vec_id").as("dup_of"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val flagged = hits.map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("dup_of"))).toSet
    assert(flagged.subsetOf(brute), s"false positives: ${flagged -- brute}")
    // recall floor vs brute force: same-cell blocking misses cross-cell
    // pairs by design (the SemDeDup trade) but must catch a solid share
    assert(flagged.size * 2 >= brute.size,
      s"recall too low: ${flagged.size} of ${brute.size}")
  }
}
