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
}
