package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, SemDecontam, SemDedupIndex}

/** Semantic decontamination: the embedding-space path must catch the
  * PARAPHRASE case the shingle path structurally misses — that gap is
  * the operator's reason to exist.
  */
class SemDecontamSpec extends SparkSpecBase {

  test("a paraphrased benchmark item: zero shared shingles, caught semantically") {
    import spark.implicits._
    // the benchmark item and its paraphrase: same meaning, not one
    // shared 5-gram (every content word replaced) — the planted shape
    // of real benchmark leakage after light rewording
    val benchText = "the quick brown fox jumps over the lazy dog near the river bank"
    val paraText = "a speedy russet vulpine leaps across an idle canine beside this stream shore"
    // PROVABLY invisible to the shingle path: the k-gram sets are
    // disjoint, so no minHits >= 1 n-gram rule can ever flag the pair
    val sh = (s: String) => spark.createDataset(Seq((0L, s))).toDF("doc_id", "text")
      .select(explode(graft.functions.GraftFunctions
        .wordShingles(col("text"), 5)).as("s")).as[String].collect().toSet
    val shared = sh(benchText).intersect(sh(paraText))
    assert(shared.isEmpty, s"paraphrase shares shingles: $shared")

    // embeddings: the paraphrase sits next to its source (tiny noise),
    // the clean doc far away — the geometry a real encoder produces
    val d = 16
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val benchVec = unit(Array.tabulate(d)(i => if (i < 8) 1f else 0.1f))
    val paraVec = unit(Array.tabulate(d)(i =>
      (if (i < 8) 1f else 0.1f) + 0.02f * (if (i % 2 == 0) 1 else -1)))
    val cleanVec = unit(Array.tabulate(d)(i => if (i >= 8) 1f else -0.1f))
    val bench = Seq((100L, benchVec)).toDF("vec_id", "embedding")
    val corpus = Seq((201L, paraVec), (202L, cleanVec))
      .toDF("vec_id", "embedding")

    // benchmark-as-index, corpus-as-batch: exactly qDecontaminateSem's
    // shape, down at fixture scale
    val dir = java.nio.file.Files.createTempDirectory("graft-semdecon-spec").toString
    val idx = IvfIndex.build(bench, cells = 1, iters = 1)
    idx.save(dir); idx.unpersist()
    val hits = SemDedupIndex.checkBatch(spark, dir, corpus,
        threshold = SemDecontam.Threshold)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dup_of"))).toSet
    assert(hits == Set((201L, 100L)),
      s"semantic path must flag exactly the paraphrase: $hits")
  }

  test("contract query flags only corpus vectors, aggregated per doc, threshold-gated") {
    val rows = SemDecontam.qDecontaminateSem(tables).collect()
    assert(rows.nonEmpty, "stand-in split should contaminate at least one vector")
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id") % 10 != 0, "benchmark vectors are not corpus")
      assert(r.getAs[Long]("n_bench_hits") >= 1L)
      assert(r.getAs[Double]("max_cos") >= SemDecontam.Threshold)
    }
  }
}
