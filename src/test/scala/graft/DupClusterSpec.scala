package graft

import graft.operators.Dedup

class DupClusterSpec extends SparkSpecBase {

  test("label propagation finds connected components, incl. chains") {
    import spark.implicits._
    // components: {1,2,3,4} as a chain, {7,8}, {10,11,12} as a star
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L),
      (10L, 11L), (10L, 12L)).toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("pointer jumping resolves a 64-deep chain within default rounds") {
    import spark.implicits._
    // plain min-label would need 63 rounds (> maxIters=10) and return
    // split components; the doubling step converges in O(log n)
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 64)
    assert(got.values.toSet == Set(1L), "chain did not collapse to one component")
  }

  test("corpus dup clusters are consistent with the pair list") {
    val pairs = Dedup.qNgramJaccard(tables).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.qDupClusters(tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every paired doc belongs to a cluster, and both ends agree
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // cluster id is the component minimum
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
    }
  }

  test("keep-best picks the longest member per cluster and drops the rest") {
    val chars = tables.documents.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val members = Dedup.qDupClusters(tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val best = Dedup.qDedupKeepBest(tables).collect()
      .map(r => (r.getAs[Long]("dropped_id"), r.getAs[Long]("keeper_id"),
        r.getAs[Long]("keeper_chars")))
    assert(best.nonEmpty)
    val dropped = best.map(_._1).toSet
    best.foreach { case (d, k, kc) =>
      // the keeper is the deterministic argmax (n_chars desc, doc_id
      // asc) of the dropped doc's own cluster, and is never dropped
      val cluster = members.values.find(_.contains(d)).get
      assert(cluster.contains(k) && !dropped.contains(k))
      val expect = cluster.toSeq.map(id => (chars(id), id))
        .sortBy { case (c, id) => (-c, id) }.head._2
      assert(k == expect, s"cluster of $d kept $k, expected $expect")
      assert(kc == chars(k))
    }
    // every non-keeper cluster member is dropped exactly once
    assert(dropped.size == best.length)
    assert(members.values.map(_.size - 1).sum == best.length)
  }
}
