package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** The q_pagerank oracle gates numeric exactness vs DuckDB; these pin
  * the ALGORITHM on graphs small enough to reason about by hand.
  */
class GraphSpec extends SparkSpecBase {

  private def edges(rows: (Int, Int, Long)*) = {
    import spark.implicits._
    val ed = rows.toDF("src", "dst", "w")
    val deg = ed.groupBy("src").agg(sum("w").as("deg"))
      .withColumnRenamed("src", "deg_src")
    ed.join(deg, col("src") === col("deg_src")).drop("deg_src")
  }

  test("two-node cycle: symmetry forces equal ranks at every iteration") {
    val r = Graph.pageRank(edges((1, 2, 1L), (2, 1, 1L)), iters = 5)
      .collect().map(x => x.getAs[Int]("node") -> x.getAs[Long]("rank_q")).toMap
    assert(r(1) == r(2))
    // the integer fixpoint of r = base + 85*r/100 from r0 = Q/2
    var rank = Graph.Q / 2
    val base = 15L * (Graph.Q / 2) / 100L
    (1 to 5).foreach(_ => rank = base + 85L * rank / 100L)
    assert(r(1) == rank)
  }

  test("star graph: the hub out-ranks the spokes it feeds") {
    // 2 and 3 each point at 1; 1 splits its rank between them
    val r = Graph.pageRank(
      edges((2, 1, 1L), (3, 1, 1L), (1, 2, 1L), (1, 3, 1L)), iters = 5)
      .collect().map(x => x.getAs[Int]("node") -> x.getAs[Long]("rank_q")).toMap
    assert(r(1) > r(2) && r(1) > r(3))
    assert(r(2) == r(3)) // symmetric spokes
  }

  test("dangling mass leaks but total rank stays bounded and positive") {
    // 3 is a sink: its rank leaves the system (the documented variant)
    val out = Graph.pageRank(edges((1, 2, 1L), (2, 3, 1L)), iters = 5).collect()
    val total = out.map(_.getAs[Long]("rank_q")).sum
    assert(total <= Graph.Q && total > 0)
    out.foreach(r => assert(r.getAs[Long]("rank_q") > 0))
    // the sink's out_deg is 0 in the report
    assert(out.find(_.getAs[Int]("node") == 3).get.getAs[Long]("out_deg") == 0L)
  }

  test("contract query is deterministic and covers every observed k node") {
    val a = Graph.qPageRank(tables).collect()
    val b = Graph.qPageRank(tables).collect()
    assert(a.toSeq == b.toSeq)
    val ks = tables.events
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k").isNotNull).distinct().count()
    // every k that appears in any transition is ranked; with >1 event
    // per user at sf0.001 effectively every observed k participates
    assert(a.length.toLong <= ks)
    assert(a.length > 10)
  }

  test("checkpointed variant is rank-identical with constant plan depth") {
    val edges = Graph.edgesFor(tables)
    val lazyRanks = Graph.pageRank(edges, 5).orderBy("node").collect()
    val ckptRanks = Graph.pageRankCheckpointed(edges, 5).orderBy("node").collect()
    // bit-identical: quanta arithmetic is integer and order-independent
    assert(ckptRanks.toSeq == lazyRanks.toSeq)
    // lineage truncation: the optimized plan after 5 iterations is no
    // deeper than after 1 — each round starts from a materialized RDD,
    // so plan size (and optimizer time) stays flat however many
    // iterations run; the lazy form grows linearly by construction
    def planSize(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case p => p }.size
    val d1 = planSize(Graph.pageRankCheckpointed(edges, 1))
    val d5 = planSize(Graph.pageRankCheckpointed(edges, 5))
    assert(d5 == d1, s"checkpointed plan grew with iterations: $d1 -> $d5")
    val l1 = planSize(Graph.pageRank(edges, 1))
    val l5 = planSize(Graph.pageRank(edges, 5))
    assert(l5 > l1, s"lazy-form growth assumption broken: $l1 -> $l5")
  }
}
