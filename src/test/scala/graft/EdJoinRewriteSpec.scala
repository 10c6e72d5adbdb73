package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** The Catalyst rewrite for naive `JOIN ON levenshtein(a,b) <= d`
  * (SURVEY §2.8): plan shape, exact result + multiplicity vs brute
  * force, residual conjuncts, and the d >= 2 leave-alone guard.
  */
class EdJoinRewriteSpec extends SparkSpecBase {
  import spark.implicits._

  private def naive(d: Int, extra: String = ""): org.apache.spark.sql.DataFrame =
    spark.sql(
      s"""SELECT a.id AS a_id, b.id AS b_id, levenshtein(a.s, b.s) AS dist
         |FROM edjr_a a JOIN edjr_b b ON levenshtein(a.s, b.s) <= $d $extra
         |ORDER BY a_id, b_id""".stripMargin)

  private def seed(): Unit = {
    Seq((1L, "alpha"), (2L, "alphb"), (3L, "beta"), (4L, "gamma"), (5L, ""))
      .toDF("id", "s").createOrReplaceTempView("edjr_a")
    Seq((11L, "alpha"), (12L, "bet"), (13L, "gamm"), (14L, "delta"), (15L, "a"))
      .toDF("id", "s").createOrReplaceTempView("edjr_b")
  }

  test("d=1: the naive join plans blocked (no nested loop) and matches brute force") {
    seed()
    val q = naive(1)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "the rewrite must remove the nested loop: " + plan.take(900))
    assert(plan.contains("Generate"), "variant explode missing: " + plan.take(900))
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val want = FuzzyJoin.edJoinBrute(
      spark.table("edjr_a"), spark.table("edjr_b"), 1)
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == want, s"got=$got want=$want")
  }

  test("join multiplicity: duplicate input rows stay duplicate matches; shared variants don't") {
    // 'ab' vs 'ab': the pair shares ALL THREE variants (self, "a",
    // "b") → must emit one row per pair, not three; the duplicated
    // left row is two genuine matches and must stay two
    Seq((1L, "ab"), (2L, "ab")).toDF("id", "s").createOrReplaceTempView("edjr_a")
    Seq((11L, "ab")).toDF("id", "s").createOrReplaceTempView("edjr_b")
    val rows = naive(1).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 11L), (2L, 11L)), rows.toString)
  }

  test("residual conjuncts survive the rewrite") {
    seed()
    val got = naive(1, "AND a.id < 3 AND b.id = 11")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 11L), (2L, 11L)), got.toString)
  }

  test("d=0 degenerates to hash-blocked exact match; d=2 is left alone") {
    seed()
    assert(naive(0).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 11L)))
    val p2 = naive(2).queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastNestedLoopJoin") || p2.contains("CartesianProduct"),
      "d>=2 must keep Spark's native plan (two-deletion sets blow up): " + p2.take(600))
    // and it still answers correctly through the native plan
    assert(naive(2).collect().nonEmpty)
  }

  test("runtime install() reaches a plain non-extension session") {
    val s2 = spark.newSession()
    graft.plans.EdJoinRewrite.install(s2)
    import s2.implicits._
    Seq((1L, "word")).toDF("id", "s").createOrReplaceTempView("edjr_p_a")
    Seq((11L, "ward")).toDF("id", "s").createOrReplaceTempView("edjr_p_b")
    val q = s2.sql("SELECT a.id, b.id FROM edjr_p_a a JOIN edjr_p_b b " +
      "ON levenshtein(a.s, b.s) <= 1")
    assert(!q.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    assert(q.count() == 1)
  }
}
