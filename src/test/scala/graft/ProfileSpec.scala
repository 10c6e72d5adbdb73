package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

class ProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("profile reports nulls, distincts, and string min/max per column") {
    val df = Seq(
      (Some(1L), Some("a"), Some(1.5)),
      (Some(2L), None, Some(2.5)),
      (Some(2L), Some("b"), None)
    ).toDF("k", "s", "v")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("k").getLong(1) == 3 && p("k").getLong(2) == 0 &&
      p("k").getLong(3) == 2)
    assert(p("s").getLong(2) == 1 && p("s").getString(4) == "a" &&
      p("s").getString(5) == "b")
    assert(p("v").getLong(2) == 1 && p("v").getString(4) == "1.5")
  }

  test("approx profile plans WITHOUT Expand — a true single pass") {
    val exact = Profile.profile(tables.orders)
      .queryExecution.executedPlan.toString
    val approx = Profile.profile(tables.orders, approx = true)
      .queryExecution.executedPlan.toString
    // the exact multi-column distinct needs Expand (rows ×N); the
    // sketch form must not — that's the whole point of the scale path
    assert(exact.contains("Expand"), s"exact plan lost its Expand:\n$exact")
    assert(!approx.contains("Expand"), s"approx plan still Expands:\n$approx")
  }

  test("approx profile ndv lands within 10% of exact") {
    val exact = Profile.profile(tables.orders).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    Profile.profile(tables.orders, approx = true).collect().foreach { r =>
      val (c, est) = (r.getString(0), r.getLong(3))
      assert(math.abs(est - exact(c)).toDouble <= math.max(1.0, exact(c) * 0.10),
        s"$c: approx $est vs exact ${exact(c)}")
    }
  }

  test("constraints catch planted violations and pass clean data") {
    val df = Seq((1L, 0.5), (2L, 1.5), (3L, -0.1)).toDF("id", "disc")
    val out = Profile.checkConstraints(df, Seq(
      Profile.Check("id_not_null", col("id").isNull),
      Profile.Check("disc_in_range", !col("disc").between(0.0, 1.0))))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("id_not_null").getLong(2) == 0 && out("id_not_null").getBoolean(3))
    assert(out("disc_in_range").getLong(2) == 2 && !out("disc_in_range").getBoolean(3))
  }

  test("uniqueness and referential checks count real violations") {
    val dup = Seq(1L, 2L, 2L, 3L, 3L).toDF("k")
    assert(Profile.uniquenessViolations(dup, "k").head().getLong(0) == 2)
    val child = Seq(Some(1L), Some(5L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    // the null fk is excluded here (not-null is its own check)
    assert(Profile.orphanCount(child, "fk", parent, "pk").head().getLong(0) == 1)
  }
}
