package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, Skew}

class AsofSkewSpec extends SparkSpecBase {

  test("asof join picks the latest prior-or-equal right row per key") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 4L, "c"), (2L, 15L, "d"))
      .toDF("k", "t", "v")
    val right = Seq((1L, 5L, 100.0), (1L, 18L, 200.0), (1L, 20L, 250.0), (2L, 16L, 300.0))
      .toDF("k", "t", "p")
    val out = AsofJoin.asofJoin(left, right, "k", "t", Seq("p"))
      .select("k", "t", "v", "asof_p").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(out == Set(
      (1L, 10L, "a", Some(100.0)),
      (1L, 20L, "b", Some(250.0)), // equal timestamp: right row matches (inclusive)
      (1L, 4L, "c", None),         // nothing precedes
      (2L, 15L, "d", None)))       // right is later
  }

  test("asof join does not skip right rows with null payload fields") {
    import spark.implicits._
    val left = Seq((1L, 30L)).toDF("k", "t")
    val right = Seq((1L, 10L, Some(7.0)), (1L, 20L, Option.empty[Double]))
      .toDF("k", "t", "p")
    val out = AsofJoin.asofJoin(left, right, "k", "t", Seq("p")).collect()
    // latest right row (t=20) has null p: ASOF matches that row, not t=10
    assert(out.head.getAs[Long]("asof_time") == 20L)
    assert(out.head.isNullAt(out.head.fieldIndex("asof_p")))
  }

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong % 7 + 2, i)))
      .toDF("k", "x")
    val right = (1 to 9).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = left.join(right, "k").select("k", "x", "name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(left, right, "k", salts = 8)
      .select("k", "x", "name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("two-phase count matches plain groupBy count") {
    import spark.implicits._
    val df = ((1 to 500).map(_ => "hot") ++ Seq("a", "b", "b")).toDF("k")
    val plain = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val two = Skew.twoPhaseCount(df, "k", salts = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(two == plain)
  }
}
