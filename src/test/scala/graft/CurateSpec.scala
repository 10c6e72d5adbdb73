package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curate, Dedup, Similarity}

class CurateSpec extends SparkSpecBase {

  test("curation pipeline plans exactly two shuffles") {
    val plan = Curate.qCurate(tables).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }

  test("curated corpus has no duplicate content and respects the gates") {
    val c = Curate.curated(tables).cache()
    try {
      val n = c.count()
      assert(n > 0)
      assert(c.select(Dedup.contentHash).distinct().count() == n)
      assert(c.filter(col("n_tokens") < 20).count() == 0)
    } finally c.unpersist()
  }

  test("weighted sample is deterministic, weight-biased, and top-k planned") {
    import org.apache.spark.sql.functions._
    val s1 = graft.operators.Decontam.qWeightedSample(tables).collect()
    val s2 = graft.operators.Decontam.qWeightedSample(tables).collect()
    assert(s1.toSeq == s2.toSeq, "same key function → same sample, every run")
    assert(s1.length == 100)
    // priorities arrive sorted ascending with doc_id tie-break
    val prios = s1.map(r => (r.getDouble(2), r.getLong(0)))
    assert(prios.sameElements(prios.sorted), "bottom-k by (priority, doc_id)")
    // weight bias: priority = u/weight, so heavy (long) docs win more
    // often — the sample's mean length must exceed the corpus mean
    val sampleAvg = s1.map(_.getLong(1).toDouble).sum / s1.length
    val corpusAvg = tables.documents.filter(col("n_chars") > 0)
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleAvg > corpusAvg,
      s"weighted sample must skew heavy: sample $sampleAvg vs corpus $corpusAvg")
    // scale shape: top-k is TakeOrderedAndProject, never a global sort
    val plan = graft.operators.Decontam.qWeightedSample(tables)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }

  test("maxsim: self-containing documents score their own token 1.0; scores bounded") {
    import org.apache.spark.sql.functions._
    val res = graft.operators.Similarity.qMaxSim(tables).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val nLabels = tables.embeddings.select("label").distinct().count()
    assert(res.size == nLabels, "one score per multi-vector document")
    // each of the 4 query tokens contributes a max cosine in [-1, 1]
    assert(res.values.forall(v => v >= -4.0 && v <= 4.0 + 1e-9))
    // a document CONTAINING a query token matches it at cos 1.0, so
    // its score is at least 1 plus 3 lower-bounded maxes
    val qLabels = tables.embeddings.filter(col("vec_id") < 4)
      .select("label").distinct().collect().map(_.getInt(0))
    qLabels.foreach { l =>
      assert(res(l) >= 1.0 - 3.0, s"label $l holds a query token: ${res(l)}")
    }
    // and the exact self-pair property: per-token max within the
    // token's own label is 1.0
    val e = tables.embeddings
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
    val selfMax = e.join(q, e("label") === q("q_label"))
      .groupBy("q_id").agg(max(graft.functions.GraftFunctions
        .cosineSim(col("embedding"), col("q_emb"))).as("mx"))
      .collect()
    assert(selfMax.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-6),
      selfMax.mkString(","))
  }

  test("maxsim-ivf serve path: candidate scores exact, exhaustive top doc covered") {
    import graft.operators.Similarity
    val full = Similarity.qMaxSim(tables).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val ivf = Similarity.qMaxSimIvf(tables).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // the serving split's guarantee: generation prunes DOCUMENTS, but
    // every returned document scores exactly as the exhaustive pass
    ivf.foreach { case (l, s) =>
      assert(full(l) == s, s"label $l: ivf $s vs exhaustive ${full(l)}")
    }
    // coverage: the exhaustive winner survives candidate generation
    val top1 = full.maxBy { case (l, s) => (s, -l) }._1
    assert(ivf.contains(top1), s"top-1 label $top1 pruned away: ${ivf.keySet}")
    assert(ivf.nonEmpty && ivf.size <= full.size)
    // the synthetic corpus's labels are NOT vector-localized, so the
    // document prune may legitimately admit everything there — prove
    // the prune ENGAGES on a corpus where documents cluster (the case
    // it exists for): 4 labels at 4 well-separated corners, query
    // tokens from label 0, nprobe 1 → only label 0 can be a candidate
    import spark.implicits._
    val dim = 8
    val clustered = (0 until 4).flatMap { label =>
      (0 until 20).map { i =>
        val vid = label * 20L + i
        val v = Array.tabulate(dim)(d =>
          (if (d == label * 2) 1.0f else 0.0f) +
            0.01f * (((vid * 7 + d) % 5) - 2))
        (vid, label, v)
      }
    }.toDF("vec_id", "label", "embedding")
    val idx = graft.operators.IvfIndex.build(clustered, cells = 4, iters = 2,
      trainMod = 1)
    try {
      val pruned = Similarity.maxSimIvf(clustered, idx, numQuery = 2, nprobe = 1)
        .collect().map(r => r.getInt(1 - 1)).toSet
      val everything = Similarity.maxSim(clustered, 2)
        .collect().map(r => r.getInt(0)).toSet
      assert(everything.size == 4)
      assert(pruned == Set(0),
        s"localized corpus must prune to the query's own cluster: $pruned")
    } finally idx.unpersist()
  }

  test("stats roll up only curated documents") {
    val stats = Curate.qCurate(tables).agg(sum("n_docs")).head().getLong(0)
    assert(stats == Curate.curated(tables).count())
  }

  test("topic clustering: topics partition the corpus; dominant source is real") {
    val rows = Similarity.qClusterTopics(tables).collect()
    // every embedded document lands in exactly one topic
    assert(rows.map(_.getAs[Long]("n_docs")).sum == tables.embeddings.count())
    assert(rows.length <= 16 && rows.nonEmpty)
    val sources = tables.documents.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(sources.contains(r.getAs[String]("top_source")))
      assert(r.getAs[Double]("avg_chars") > 0)
      assert(r.getAs[Long]("n_langs") >= 1)
    }
    // the dominant source really is a modal source of its topic
    val byTopic = Similarity.qClusterTopics(tables).collect()
      .map(r => r.getAs[Long]("topic") -> r.getAs[String]("top_source")).toMap
    assert(byTopic.nonEmpty)
  }

  test("filter cascade: stages partition the corpus and attribute first-failure only") {
    val rows = Curate.qFilterCascade(tables).collect()
    // every doc lands in exactly one stage → counts sum to the corpus
    assert(rows.map(_.getAs[Long]("n_docs")).sum == tables.documents.count())
    // stage ids and rule names stay aligned (the literal-array lookup)
    val byStage = rows.map(r => r.getAs[Int]("stage") -> r.getAs[String]("rule")).toMap
    assert(byStage.get(1).forall(_ == "short") && byStage.get(5).forall(_ == "pass"))
    // first-match semantics: a short non-English doc counts as "short",
    // never "other_lang" — so other_lang must contain no doc under the
    // length floor. Checked against the raw corpus: every non-en doc
    // at >= 100 chars is exactly the other_lang bucket.
    val nonEnLong = tables.documents
      .filter(col("lang") =!= "en" && col("n_chars") >= 100).count()
    assert(byStage.contains(2) && rows.find(_.getAs[Int]("stage") == 2)
      .get.getAs[Long]("n_docs") == nonEnLong)
  }
}
