package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.{Dedup, IvfIndex}
import graft.sources.Tables

/** SemDeDup property gates (no SQL oracle — the k-means blocker isn't
  * SQL-expressible). The synthetic corpus has no true duplicates
  * (max pairwise cosine ≈ 0.48 at sf0.001), so the gates PLANT them:
  * exact copies must always be dropped (deterministic assignment puts
  * identical vectors in identical cells — blocking cannot lose them),
  * perturbed near-copies must be dropped with high recall, and every
  * drop must name a true near-dup keeper.
  */
class SemDedupSpec extends SparkSpecBase {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  /** Corpus + exact copies (vec_id + 10000 of every 10th vector) +
    * near-copies (vec_id + 20000, first component nudged by 1e-3).
    */
  private lazy val planted: DataFrame = {
    val base = t.embeddings.select(col("vec_id"), col("embedding"))
    val exact = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val near = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 20000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + 0.001f).otherwise(x)).as("embedding"))
    base.unionByName(exact).unionByName(near)
  }

  private lazy val drops: Map[Long, Long] = {
    val index = IvfIndex.build(planted, cells = 16, iters = 2)
    val m = Dedup.semDedupDrops(index.assigned, threshold = 0.97)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    index.unpersist()
    m
  }

  private lazy val plantedIds: Set[Long] =
    t.embeddings.filter(col("vec_id") % 10 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("exact planted copies are ALL dropped against their true source") {
    // identical vectors score identically against every centroid and the
    // tie-break is deterministic, so blocking can never separate them —
    // exact-dup recall is 1.0 by construction, asserted here
    plantedIds.foreach { id =>
      assert(drops.contains(id + 10000L), s"exact copy of $id survived")
      assert(drops(id + 10000L) == id,
        s"copy of $id kept by ${drops(id + 10000L)}, expected $id")
    }
  }

  test("perturbed near-copies are dropped with recall >= 0.9") {
    val caught = plantedIds.count(id => drops.contains(id + 20000L))
    val recall = caught.toDouble / plantedIds.size
    info(f"near-copy recall: $recall%.2f ($caught/${plantedIds.size})")
    assert(recall >= 0.9, f"cluster blocking lost near-copies: recall $recall%.2f")
  }

  test("every drop is a true near-dup of its keeper (precision 1.0)") {
    assert(drops.nonEmpty)
    import spark.implicits._
    val pairs = drops.toSeq.toDF("dropped", "keeper")
    val e = planted.select(col("vec_id"), col("embedding"))
    val verified = pairs
      .join(e.withColumnRenamed("vec_id", "dropped"), "dropped")
      .withColumnRenamed("embedding", "emb_a")
      .join(e.withColumnRenamed("vec_id", "keeper"), "keeper")
      .filter(GraftFunctions.cosineSim(col("emb_a"), col("embedding")) >= 0.97 &&
        col("keeper") < col("dropped"))
      .count()
    assert(verified == drops.size,
      s"only $verified of ${drops.size} drops verify against their keeper")
  }

  test("the contract query is deterministic and per-label counts reconcile") {
    val a = Dedup.qSemDedup(t).collect().map(_.toSeq).toSeq
    val b = Dedup.qSemDedup(t).collect().map(_.toSeq).toSeq
    assert(a == b)
    a.foreach { r =>
      assert(r(1).asInstanceOf[Long] ==
        r(2).asInstanceOf[Long] + r(3).asInstanceOf[Long])
    }
  }
}
