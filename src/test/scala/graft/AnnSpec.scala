package graft

import graft.operators.{Dedup, Similarity}

class AnnSpec extends SparkSpecBase {

  private def deleteDir(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir))
  }

  test("LSH ANN recall >= 0.5 vs brute force on sf0.001 (8-bit buckets)") {
    val queries = Seq(1L, 2L, 3L, 10L, 20L)
    val bf = Similarity.qAnnBruteforce(tables, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val lsh = Similarity.qAnnLsh(tables, queries, k = 10, bits = 4).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val recalls = bf.map { case (q, truth) =>
      val got = lsh.getOrElse(q, Set.empty)
      got.intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // 4-bit hyperplane LSH on one probe: recall well above random
    // (bucket holds ~1/16 of vectors; random recall would be ~0.06)
    assert(mean >= 0.3, s"mean recall $mean")
  }

  test("hash-embedded text vectors feed the IVF index unchanged with useful recall") {
    import org.apache.spark.sql.functions._
    // the scale path claimed for q_text_ann: same vectors, same index
    val vecs = tables.documents
      .select(col("doc_id").as("vec_id"),
        graft.functions.GraftFunctions.hashEmbed(col("text"), 64).as("embedding"))
      .filter(graft.functions.GraftFunctions.normF(col("embedding")) > 0)
    val index = graft.operators.IvfIndex.build(vecs, cells = 8, iters = 2)
    try {
      val queries = Seq(1L, 2L, 3L, 10L, 20L)
      val q = vecs.filter(col("vec_id").isin(queries: _*))
      val ivf = graft.operators.Similarity.ivfProbe(index, q, k = 10, nprobe = 3)
        .collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (qi, rs) => qi -> rs.map(_.getAs[Long]("vec_id")).toSet }
      // brute-force truth over the same text vectors
      val bf = vecs.as("c").crossJoin(broadcast(
          q.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          graft.functions.GraftFunctions.cosineSim(col("embedding"), col("q_emb")).as("cos"))
        .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rk") <= 10).collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (qi, rs) => qi -> rs.map(_.getAs[Long]("vec_id")).toSet }
      val recalls = bf.map { case (qi, truth) =>
        ivf.getOrElse(qi, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      val mean = recalls.sum / recalls.size
      assert(mean >= 0.3, s"text-vector IVF recall $mean")
    } finally index.unpersist()
  }

  test("text ANN: a planted copy is its source's nearest neighbor at cosine 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = tables.documents.select("doc_id", "text")
    val copyOf1 = base.filter(col("doc_id") === 1L).as[(Long, String)]
      .collect().head._2
    val planted = base.unionByName(Seq((900001L, copyOf1)).toDF("doc_id", "text"))
    // the planted frame through the same plan shape as qTextAnn:
    val e = planted.select(col("doc_id"),
      graft.functions.GraftFunctions.hashEmbed(col("text"), 256).as("embedding"))
    val q = e.filter(col("doc_id") === 1L)
      .select(col("doc_id").as("query_id"), col("embedding").as("q_emb"))
    val top = e.crossJoin(broadcast(q))
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.cosineSim(col("embedding"), col("q_emb")).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(1).collect().head
    assert(top.getAs[Long]("doc_id") == 900001L)
    assert(math.abs(top.getAs[Double]("cos") - 1.0) < 1e-6)
    // and the contract query is well-formed: k rows per query, cos
    // non-increasing within each query
    val rows = graft.operators.Similarity.qTextAnn(tables).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rs =>
      val cs = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    assert(byQ.keySet == Set(1L, 2L, 3L))
  }

  test("IVF ANN recall beats random-cell scanning on sf0.001") {
    val queries = Seq(1L, 2L, 3L, 10L, 20L)
    val bf = Similarity.qAnnBruteforce(tables, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val ivf = Similarity.qAnnIvf(tables, queries, k = 10, cells = 16, nprobe = 3).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val recalls = bf.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // scanning 3/16 cells at random would recall ~0.19
    assert(mean >= 0.4, s"mean IVF recall $mean")
  }

  test("saved IVF index probes identically after load, with cell pruning") {
    import graft.operators.IvfIndex
    val queries = Seq(1L, 2L, 3L)
    val built = Similarity.corpusIndex(tables, cells = 16, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    var loaded: IvfIndex = null
    try {
      built.save(dir)
      loaded = IvfIndex.load(spark, dir)
      val q = tables.embeddings.filter(
        org.apache.spark.sql.functions.col("vec_id").isin(queries: _*))
      val fromBuilt = Similarity.ivfProbe(built, q).collect().map(_.toString).sorted
      val fromLoaded = Similarity.ivfProbe(loaded, q).collect().map(_.toString).sorted
      assert(fromLoaded.sameElements(fromBuilt),
        "probe against the loaded index diverges from the in-memory index")
      // the saved inverted file is partitioned by cell → the probe scan
      // must prune partitions, not read the whole corpus
      val plan = Similarity.ivfProbe(loaded, q).queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(cell"),
        s"expected cell partition pruning in:\n$plan")
    } finally {
      // `built` stays cached: it is corpusIndex's memoized instance,
      // released by the BoundedMemo evictor — but the LOADED handle is
      // ours to unpersist, or its blocks pin the shared session
      if (loaded != null) loaded.unpersist()
      deleteDir(dir)
    }
  }

  test("ann_search TVF: SQL vector search over a saved index equals the operator probe, cell-pruned") {
    import org.apache.spark.sql.functions.col
    import graft.operators.IvfIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-tvf").toString
    val handles = scala.collection.mutable.ArrayBuffer.empty[IvfIndex]
    def tracked(i: IvfIndex): IvfIndex = { handles += i; i }
    try {
      tracked(IvfIndex.build(tables.embeddings, cells = 16, iters = 2)).save(dir)
      val qVec = tables.embeddings.filter(col("vec_id") === 1L)
        .head().getAs[scala.collection.Seq[Float]]("embedding")
      val csv = qVec.mkString(",")
      val viaSql = spark.sql(
        s"SELECT vec_id, cos, rk FROM ann_search('$dir', '$csv', 5) ORDER BY rk")
        .collect().map(r => (r.getLong(0), r.getAs[Double]("cos"), r.getInt(2))).toSeq
      // operator-path twin: same saved index, a -1-tagged query row
      import spark.implicits._
      val q = Seq((-1L, qVec.toArray)).toDF("vec_id", "embedding")
      val viaOp = Similarity.ivfProbe(tracked(IvfIndex.load(spark, dir)), q, k = 5)
        .select("vec_id", "cos", "rk").orderBy("rk")
        .collect().map(r => (r.getLong(0), r.getAs[Double]("cos"), r.getInt(2))).toSeq
      assert(viaSql == viaOp, s"sql=$viaSql op=$viaOp")
      assert(viaSql.nonEmpty && viaSql.head._1 == 1L,
        "the query's own vector must rank first: " + viaSql.take(3))
      // the saved inverted file is cell-partitioned and the probe must
      // prune to the visited cells
      val plan = spark.sql(s"SELECT * FROM ann_search('$dir', '$csv', 5)")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"),
        "ann_search must keep cell pruning on the saved scan: " + plan.take(800))
    } finally {
      handles.foreach(_.unpersist())
      deleteDir(dir)
    }
  }

  test("batch ann_search TVF: a query-vector VIEW probes in one plan, row-for-row the operator") {
    import org.apache.spark.sql.functions.col
    import graft.operators.IvfIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-tvfb").toString
    val handles = scala.collection.mutable.ArrayBuffer.empty[IvfIndex]
    def tracked(i: IvfIndex): IvfIndex = { handles += i; i }
    try {
      tracked(IvfIndex.build(tables.embeddings, cells = 16, iters = 2)).save(dir)
      val qs = tables.embeddings.filter(col("vec_id").isin(1L, 2L, 3L))
      qs.createOrReplaceTempView("annb_queries")
      val viaSql = spark.sql(
        s"SELECT query_id, vec_id, cos, rk FROM ann_search('$dir', 'annb_queries', 5) " +
          "ORDER BY query_id, rk")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("cos"), r.getInt(3)))
        .toSeq
      val viaOp = Similarity.ivfProbe(tracked(IvfIndex.load(spark, dir)), qs, k = 5)
        .orderBy("query_id", "rk")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("cos"), r.getInt(3)))
        .toSeq
      assert(viaSql == viaOp, s"sql=${viaSql.take(5)} op=${viaOp.take(5)}")
      assert(viaSql.map(_._1).distinct.sorted == Seq(1L, 2L, 3L),
        "all three queries must answer in the one statement")
      // cell pruning must survive the batch form
      val plan = spark.sql(s"SELECT * FROM ann_search('$dir', 'annb_queries', 5)")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"),
        "batch ann_search must keep cell pruning on the saved scan: " + plan.take(800))
      // a view without the contract columns refuses with guidance
      spark.range(3).toDF("x").createOrReplaceTempView("annb_bad")
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM ann_search('$dir', 'annb_bad', 5)").collect()
      }
      assert(e.getMessage.contains("vec_id"), e.getMessage)
      // an identifier that is NO registered view must not die as an
      // opaque table-not-found or NumberFormatException: the usage
      // error names both accepted argument forms...
      val miss = intercept[Exception] {
        spark.sql(s"SELECT * FROM ann_search('$dir', 'no_such_view', 5)").collect()
      }
      assert(miss.getMessage.contains("registered view") &&
        miss.getMessage.contains("CSV"), miss.getMessage)
      // ...and 'NaN' — float-parseable yet identifier-shaped — reads
      // as the 1-d CSV vector it is, not as a phantom table probe:
      // whatever the outcome (a dim-mismatch error or an empty probe),
      // it must never be table-not-found
      scala.util.Try(spark.sql(s"SELECT * FROM ann_search('$dir', 'NaN', 5)")
        .collect()).failed.foreach(t =>
        assert(!String.valueOf(t.getMessage).toLowerCase
          .contains("table or view not found"), t.getMessage))
    } finally {
      handles.foreach(_.unpersist())
      deleteDir(dir)
    }
  }

  test("incremental append to a saved IVF index absorbs new vectors without retraining") {
    import org.apache.spark.sql.functions.col
    import graft.operators.IvfIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-inc").toString
    // track every index handle: their persisted frames must not stay
    // pinned in the shared session's block manager after the test
    val handles = scala.collection.mutable.ArrayBuffer.empty[IvfIndex]
    def tracked(i: IvfIndex): IvfIndex = { handles += i; i }
    try {
      // build + save on the even half only
      val half = tables.embeddings.filter(col("vec_id") % 2 === 0)
      tracked(IvfIndex.build(half, cells = 16, iters = 2)).save(dir)
      val before = tracked(IvfIndex.load(spark, dir)).assigned.count()
      // ingest batch: the odd half, assigned against the SAVED quantizer
      val appended = IvfIndex.appendToSaved(spark, dir,
        tables.embeddings.filter(col("vec_id") % 2 === 1))
      val idx = tracked(IvfIndex.load(spark, dir))
      assert(idx.assigned.count() == before + appended)
      // appended vectors are retrievable: probes (self-matches
      // excluded by design) must surface odd-id neighbors — the half
      // that only exists in the index via the incremental append
      val q = tables.embeddings.filter(col("vec_id").isin(2L, 4L, 6L))
      val hits = Similarity.ivfProbe(idx, q).collect()
      assert(hits.nonEmpty)
      assert(hits.exists(_.getAs[Long]("vec_id") % 2 == 1),
        s"no appended (odd) vector retrieved among ${hits.length} hits")
    } finally {
      handles.foreach(_.unpersist())
      deleteDir(dir)
    }
  }

  test("brute-force cosine scores are in [-1, 1] and ranked descending") {
    val rows = Similarity.qAnnBruteforce(tables).collect()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val cs = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cos"))
      assert(cs.forall(c => c >= -1.0001 && c <= 1.0001))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hard negatives stay inside the band and agree with brute-force scores") {
    val rows = Similarity.qHardNegatives(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(c >= 0.15 && c < 0.30, s"cos $c escaped the [0.15, 0.30) band")
      assert(r.getAs[Int]("rk") <= 10)
    }
    // the mined negatives are exactly the band slice of the full
    // ranking: no candidate above the cap may appear, and any
    // brute-force top-k hit inside the band must be mined first
    val brute = Similarity.qAnnBruteforce(tables, k = 500).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")) ->
        r.getAs[Double]("cos")).toMap
    rows.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))
      assert(brute.get(key).forall(_ == r.getAs[Double]("cos")))
    }
  }

  test("minhash LSH candidates include the exact-jaccard near-dups") {
    // q_ngram_jaccard(threshold 0.6) pairs should mostly surface in the
    // minhash-LSH candidate set at matching shingle size.
    val exact = Dedup.qNgramJaccard(tables, k = 5, dfCap = 50, threshold = 0.6)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val lsh = Dedup.qMinhashLsh(tables, numHashes = 64, bands = 16, shingleSize = 5,
      threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    if (exact.nonEmpty) {
      val hit = exact.intersect(lsh).size.toDouble / exact.size
      assert(hit >= 0.8, s"lsh caught $hit of exact near-dup pairs")
    }
  }

  test("label centroid energy positive for every label") {
    val rows = Similarity.qLabelCentroids(tables).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getAs[Double]("sum_sq") > 0))
  }

  test("PQ/ADC recall vs brute force; shape and determinism hold") {
    val queries = Seq(1L, 2L, 3L, 10L, 20L)
    val bf = Similarity.qAnnBruteforce(tables, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val pq = graft.operators.Pq.qAnnPq(tables, queries, k = 10).collect()
    val byQ = pq.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    // every query returns exactly k rows, never itself
    assert(byQ.forall(_._2.size == 10))
    assert(pq.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("vec_id")))
    val recalls = bf.map { case (q, truth) =>
      byQ.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // 8-byte codes over 64 float dims (32x compression): well above
    // the ~0.02 random baseline on a 500-vector corpus
    assert(mean >= 0.3, s"mean PQ recall $mean")
    // re-running the query must reproduce the exact ranking (memoized
    // model + deterministic tie-breaks)
    val again = graft.operators.Pq.qAnnPq(tables, queries, k = 10).collect()
    assert(pq.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("saved IVF-PQ index probes result-identical to the in-memory pipeline") {
    import org.apache.spark.sql.functions.col
    val queries = Seq(1L, 2L, 3L)
    val ivf = graft.operators.Similarity.corpusIndex(tables)
    val model = graft.operators.Pq.corpusPq(tables)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    try {
      graft.operators.Pq.saveIndex(dir, ivf, model)
      val qRows = tables.embeddings.filter(col("vec_id").isin(queries: _*))
      val onDisk = graft.operators.Pq.probeIndex(spark, dir, qRows).collect()
      val inMem = graft.operators.Pq.qAnnIvfPq(tables, queries).collect()
      assert(onDisk.map(_.toString).toSeq == inMem.map(_.toString).toSeq,
        s"on-disk probe diverged: ${onDisk.length} vs ${inMem.length} rows")
      // the probe's scan is partition-pruned to the visited cells
      val scan = graft.operators.Pq.probeIndex(spark, dir, qRows)
        .queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") && scan.contains("cell"),
        "probe scan should carry a cell partition filter")
    } finally deleteDir(dir)
  }

  test("IVF-PQ probe recall vs brute force (cells bound candidates, ADC ranks)") {
    val queries = Seq(1L, 2L, 3L, 10L, 20L)
    val bf = Similarity.qAnnBruteforce(tables, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val got = graft.operators.Pq.qAnnIvfPq(tables, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    // candidates are capped at nprobe/cells of the corpus AND ranked
    // from 8-byte codes; the exact re-rank repairs the shortlist, so
    // recall must still clear the IVF-alone floor's neighborhood
    val recalls = bf.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean IVF-PQ recall $mean")
  }
}
