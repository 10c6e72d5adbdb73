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

  test("d=0 degenerates to hash-blocked exact match; past the conf cap the plan is left alone") {
    seed()
    assert(naive(0).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 11L)))
    val p5 = naive(5).queryExecution.executedPlan.toString
    assert(p5.contains("BroadcastNestedLoopJoin") || p5.contains("CartesianProduct"),
      "d above spark.graft.edJoin.maxRewriteDist (default 4) must keep " +
        "Spark's native plan: " + p5.take(600))
    assert(naive(5).collect().nonEmpty)
    // lowering the cap turns the d=2 rewrite off too
    val prior = spark.conf.getOption(graft.plans.EdJoinRewrite.MaxDistConf)
    try {
      spark.conf.set(graft.plans.EdJoinRewrite.MaxDistConf, "1")
      val p2 = naive(2).queryExecution.executedPlan.toString
      assert(p2.contains("BroadcastNestedLoopJoin") || p2.contains("CartesianProduct"),
        "capped d=2 must keep the native plan: " + p2.take(600))
    } finally prior match {
      case Some(v) => spark.conf.set(graft.plans.EdJoinRewrite.MaxDistConf, v)
      case None => spark.conf.unset(graft.plans.EdJoinRewrite.MaxDistConf)
    }
  }

  test("d=2: the naive join plans gram-blocked (no nested loop) and matches brute force") {
    seed()
    val q = naive(2)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "the d=2 gram rewrite must remove the nested loop: " + plan.take(900))
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val want = FuzzyJoin.edJoinBrute(
      spark.table("edjr_a"), spark.table("edjr_b"), 2)
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == want, s"got=$got want=$want")
  }

  test("d=2: lossless across the pick-floor boundary — zero-shared-gram multi-edit pairs ride the band branch") {
    // len in [q, q*(d+1)) with every 3-gram destroyed by 2 edits: the
    // gram branch cannot see these, the band branch must
    Seq((1L, "abcdefgh"), (2L, "abcdefghijkl"), (3L, "ab"), (4L, "abcde"))
      .toDF("id", "s").createOrReplaceTempView("edjr_a")
    Seq((11L, "abXdeYgh"), (12L, "abcdeZghijkW"), (13L, "aXbY"), (14L, "aXcYe"),
      (15L, "zzzzzzzz")).toDF("id", "s").createOrReplaceTempView("edjr_b")
    val got = naive(2).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val want = FuzzyJoin.edJoinBrute(
      spark.table("edjr_a"), spark.table("edjr_b"), 2)
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == want, s"got=$got want=$want")
    assert(want.contains((1L, 11L, 2)), "the zero-shared-gram pair must be present")
  }

  test("d=2 multiplicity: duplicate rows stay duplicate matches; multi-gram collisions collapse to one") {
    // both strings are long enough for the gram branch and share many
    // (gram, bucket) keys → many candidate copies per pair, one output
    Seq((1L, "abcdefghijkl"), (2L, "abcdefghijkl")).toDF("id", "s")
      .createOrReplaceTempView("edjr_a")
    Seq((11L, "abcdefghijkl"), (12L, "abcdefghiXkl")).toDF("id", "s")
      .createOrReplaceTempView("edjr_b")
    val rows = naive(2).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 11L), (1L, 12L), (2L, 11L), (2L, 12L)), rows.toString)
  }

  test("d=2 residual conjuncts survive the gram rewrite") {
    seed()
    val got = naive(2, "AND a.id = 1 AND b.id <= 12")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 11L)), got.toString)
  }

  test("d=2 with raised gramSize conf: lengths in [DeletionMaxLen, 3q) stay covered") {
    // spark.graft.edJoin.gramSize = 12 pushes the pick floor 3q = 36
    // past DeletionMaxLen = 32; the split must widen to 36 so a
    // 33-char left string whose 2-edit partner shares ZERO 12-grams
    // (edits at positions 12 and 23 touch every gram) still pairs via
    // the deletion branch — pre-fix it fell in neither branch
    val s33 = "abcdefghijklmnopqrstuvwxyz0123456"
    val s33m = s33.updated(11, 'X').updated(22, 'Y')
    val s40 = "abcdefghijklmnopqrstuvwxyz01234567890123"
    Seq((1L, s33), (2L, s40)).toDF("id", "s").createOrReplaceTempView("edjr_a")
    Seq((11L, s33m), (12L, s40.dropRight(2) + "XY"), (13L, "unrelated"))
      .toDF("id", "s").createOrReplaceTempView("edjr_b")
    val prior = spark.conf.getOption(graft.plans.EdJoinRewrite.GramSizeConf)
    try {
      spark.conf.set(graft.plans.EdJoinRewrite.GramSizeConf, "12")
      val q = naive(2)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        plan.take(600))
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      val want = FuzzyJoin.edJoinBrute(
        spark.table("edjr_a"), spark.table("edjr_b"), 2)
        .orderBy("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      assert(got == want, s"got=$got want=$want")
      assert(want.contains((1L, 11L, 2)) && want.contains((2L, 12L, 2)))
    } finally prior match {
      case Some(v) => spark.conf.set(graft.plans.EdJoinRewrite.GramSizeConf, v)
      case None => spark.conf.unset(graft.plans.EdJoinRewrite.GramSizeConf)
    }
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
