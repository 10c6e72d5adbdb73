package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curate, Dedup}

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

  test("stats roll up only curated documents") {
    val stats = Curate.qCurate(tables).agg(sum("n_docs")).head().getLong(0)
    assert(stats == Curate.curated(tables).count())
  }
}
