package graft

import org.apache.spark.sql.functions.{col, lit}

import graft.operators.{Decontam, Dedup, Rnd, Similarity}

/** SURVEY.md §5 rounding convention: every oracled floating aggregate
  * rounds via `Rnd.round` (the floor form `floor(x*10^s + 0.5)/10^s`)
  * because Spark's builtin `round` (BigDecimal HALF_UP on the double's
  * shortest decimal repr) disagrees with it on .xx5-boundary doubles,
  * while DuckDB oracles spell the floor form textually.
  *
  * Round-10 review flagged qSpanContainment / qMaxSim / qWeightedSample
  * as using the builtin. They do not: those files import
  * `graft.operators.Rnd.round`, and a binding made by an explicit
  * import has higher precedence than one made by a wildcard import
  * (`functions._`) in Scala 2. This spec pins that resolution so a
  * future import reshuffle cannot silently flip it: the analyzed plans
  * must contain FLOOR and no builtin round() call.
  */
class RndConventionSpec extends SparkSpecBase {

  /** The two conventions genuinely differ here: 1.005 * 100 is
    * 100.49999999999999 in IEEE double, so the floor form gives 1.00
    * while Spark's builtin round — which goes through the double's
    * shortest decimal repr "1.005" and HALF_UPs — gives 1.01. DuckDB's
    * textual floor form agrees with Rnd.round, which is the whole
    * point of the convention.
    */
  test("Rnd.round is the floor form at the .xx5 boundary") {
    import spark.implicits._
    val got = Seq(1.005).toDF("x")
      .select(Rnd.round(col("x"), 2).as("r"))
      .head().getDouble(0)
    assert(got == 1.00, s"floor form must give 1.00, got $got")
    val builtin = Seq(1.005).toDF("x")
      .select(org.apache.spark.sql.functions.round(col("x"), 2).as("r"))
      .head().getDouble(0)
    assert(builtin == 1.01, "premise check: builtin HALF_UP differs")
  }

  private def assertFloorForm(name: String,
                              df: org.apache.spark.sql.DataFrame): Unit = {
    val plan = df.queryExecution.analyzed.toString
    assert(plan.toUpperCase.contains("FLOOR("),
      s"$name: rounded columns must plan as FLOOR (Rnd.round)")
    assert(!plan.contains("round("),
      s"$name: builtin round() must not appear in the plan:\n$plan")
  }

  test("the round-10 operators plan their rounding as FLOOR") {
    assertFloorForm("qSpanContainment", Dedup.qSpanContainment(tables))
    assertFloorForm("qMaxSim", Similarity.qMaxSim(tables))
    assertFloorForm("qWeightedSample", Decontam.qWeightedSample(tables))
  }
}
