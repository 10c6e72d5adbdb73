package graft

import org.apache.spark.sql.functions._

/** The Catalyst rewrite for naive range joins (SURVEY §2.8): binned
  * plan shape, exact result + multiplicity vs the nested-loop answer,
  * conf gating, and the both-bounds/one-side scope guards.
  */
class RangeJoinRewriteSpec extends SparkSpecBase {
  import spark.implicits._

  private val Conf = graft.plans.RangeJoinRewrite.BinSizeConf

  private def withBin[T](size: String)(body: => T): T = {
    spark.conf.set(Conf, size)
    try body finally spark.conf.unset(Conf)
  }

  private def seed(): Unit = {
    (1 to 200).map(i => (i.toLong, i.toDouble)).toDF("pid", "x")
      .createOrReplaceTempView("rjr_points")
    Seq((101L, 10.0, 25.0), (102L, 20.0, 22.5), (103L, 190.5, 300.0),
      (104L, -5.0, 3.0), (105L, 50.0, 50.0))
      .toDF("iid", "lo", "hi").createOrReplaceTempView("rjr_iv")
  }

  private val Naive =
    """SELECT i.iid, count(*) AS n, cast(sum(p.pid) AS BIGINT) AS s
      |FROM rjr_points p JOIN rjr_iv i ON p.x BETWEEN i.lo AND i.hi
      |GROUP BY i.iid ORDER BY i.iid""".stripMargin

  test("with a bin size set, the naive BETWEEN join plans binned and matches the nested loop") {
    seed()
    val want = spark.sql(Naive).collect().toSeq // no conf: native NLJ answer
    val (got, plan) = withBin("16.0") {
      val q = spark.sql(Naive)
      (q.collect().toSeq, q.queryExecution.executedPlan.toString)
    }
    assert(got == want, s"binned answer diverged:\n got=$got\n want=$want")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "binning must remove the nested loop: " + plan.take(900))
    assert(plan.contains("Generate"), "interval bin explode missing")
  }

  test("multiplicity: an interval spanning many bins still matches each point once") {
    (1 to 50).map(i => (i.toLong, i.toDouble)).toDF("pid", "x")
      .createOrReplaceTempView("rjr_points")
    Seq((201L, 0.0, 100.0)).toDF("iid", "lo", "hi") // spans ~50 bins at w=2
      .createOrReplaceTempView("rjr_iv")
    val rows = withBin("2.0") {
      spark.sql("SELECT p.pid, i.iid FROM rjr_points p JOIN rjr_iv i " +
        "ON p.x >= i.lo AND p.x <= i.hi").collect()
    }
    assert(rows.length == 50, s"each point exactly once, got ${rows.length}")
  }

  test("unset or non-positive conf leaves the plan alone") {
    seed()
    val p1 = spark.sql(Naive).queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastNestedLoopJoin") || p1.contains("CartesianProduct"))
    val p2 = withBin("0") {
      spark.sql(Naive).queryExecution.executedPlan.toString
    }
    assert(p2.contains("BroadcastNestedLoopJoin") || p2.contains("CartesianProduct"))
  }

  test("guards: one-sided bounds and cross-side points do not rewrite; strict bounds and null bounds stay exact") {
    seed()
    withBin("16.0") {
      // only a lower bound — no interval to bin
      val one = spark.sql("SELECT count(*) FROM rjr_points p JOIN rjr_iv i " +
        "ON p.x >= i.lo")
      assert(one.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      // strict bounds verify exactly (50.0 excluded both ways on iid 105)
      val strict = spark.sql("SELECT i.iid, p.pid FROM rjr_points p JOIN rjr_iv i " +
        "ON p.x > i.lo AND p.x < i.hi AND i.iid = 105").collect()
      assert(strict.isEmpty, strict.mkString(","))
      // null bounds match nothing, same as the native plan
      Seq((301L, Option.empty[Double], Option(5.0))).toDF("iid", "lo", "hi")
        .createOrReplaceTempView("rjr_iv_null")
      assert(spark.sql("SELECT count(*) AS n FROM rjr_points p JOIN rjr_iv_null i " +
        "ON p.x >= i.lo AND p.x <= i.hi").head().getLong(0) == 0L)
    }
  }

  test("an extra equi-key composes: the bin key joins beside it, answer unchanged") {
    Seq((1L, "u1", 10.0), (2L, "u1", 30.0), (3L, "u2", 10.0))
      .toDF("pid", "uid", "x").createOrReplaceTempView("rjr_kp")
    Seq((11L, "u1", 5.0, 15.0), (12L, "u2", 5.0, 15.0))
      .toDF("iid", "uid", "lo", "hi").createOrReplaceTempView("rjr_ki")
    val sql = "SELECT p.pid, i.iid FROM rjr_kp p JOIN rjr_ki i " +
      "ON p.uid = i.uid AND p.x BETWEEN i.lo AND i.hi ORDER BY p.pid"
    val want = spark.sql(sql).collect().toSeq
    val got = withBin("8.0")(spark.sql(sql).collect().toSeq)
    assert(got == want && got.length == 2)
  }
}
