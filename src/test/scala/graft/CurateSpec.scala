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
