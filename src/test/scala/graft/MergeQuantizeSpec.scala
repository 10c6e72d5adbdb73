package graft

import org.apache.spark.sql.functions._

import graft.operators.{Merge, Quantize}

class MergeQuantizeSpec extends SparkSpecBase {

  test("upsert updates matched keys, inserts new, keeps the rest") {
    import spark.implicits._
    val snapshot = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val updates = Seq((2L, "b2", 21.0), (9L, "new", 99.0)).toDF("id", "name", "v")
    val out = Merge.upsert(snapshot, updates, "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0), (9L, "new", 99.0)))
  }

  test("scd2 closes changed rows, keeps identical and history, opens new keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val dim = Seq(
      // key 1: history row + current row (history must pass through)
      (1L, "bronze", Some(t("1990-01-01")), Some(t("1995-01-01")), false),
      (1L, "silver", Some(t("1995-01-01")), Option.empty[java.sql.Timestamp], true),
      (2L, "gold", Some(t("1995-01-01")), Option.empty[java.sql.Timestamp], true),
      (3L, "gold", Some(t("1995-01-01")), Option.empty[java.sql.Timestamp], true)
    ).toDF("id", "tier", "valid_from", "valid_to", "is_current")
    val changes = Seq(
      (1L, "platinum"), // differs → close + open
      (2L, "gold"),     // identical → untouched
      (9L, "new")       // brand-new key → first open row
    ).toDF("id", "tier")
    val out = Merge.scd2(dim, changes, "id", "2000-01-01")
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.getTimestamp(2)).map(_.toString.take(10)),
      Option(r.getTimestamp(3)).map(_.toString.take(10)), r.getBoolean(4))).toSet
    assert(rows == Set(
      (1L, "bronze", Some("1990-01-01"), Some("1995-01-01"), false),
      (1L, "silver", Some("1995-01-01"), Some("2000-01-01"), false),
      (1L, "platinum", Some("2000-01-01"), None, true),
      (2L, "gold", Some("1995-01-01"), None, true),
      (3L, "gold", Some("1995-01-01"), None, true),
      (9L, "new", Some("2000-01-01"), None, true)), rows.mkString("\n"))
    // exactly one current row per live key
    assert(out.filter(col("is_current")).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 9L))
  }

  test("scd2 compares tracked columns null-safely") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val dim = Seq(
      (1L, Option.empty[String], Some(ts("1995-01-01")),
        Option.empty[java.sql.Timestamp], true),
      (2L, Some("x"), Some(ts("1995-01-01")),
        Option.empty[java.sql.Timestamp], true)
    ).toDF("id", "tier", "valid_from", "valid_to", "is_current")
    // null→null is NOT a change; x→null is
    val changes = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "tier")
    val out = Merge.scd2(dim, changes, "id", "2000-01-01").collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(3)).isDefined, r.getBoolean(4)))
    assert(out.count(_._1 == 1L) == 1, "null→null wrongly versioned")
    assert(out.count(_._1 == 2L) == 2, "x→null change missed")
  }

  test("scd2 raises on duplicate or null change keys") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val dim = Seq((1L, "a", Some(ts("1995-01-01")),
      Option.empty[java.sql.Timestamp], true))
      .toDF("id", "tier", "valid_from", "valid_to", "is_current")
    val dup = Seq((1L, "b"), (1L, "c")).toDF("id", "tier")
    intercept[Exception] { Merge.scd2(dim, dup, "id", "2000-01-01").collect() }
    val nul = Seq((Option.empty[Long], "b")).toDF("id", "tier")
    intercept[Exception] { Merge.scd2(dim, nul, "id", "2000-01-01").collect() }
  }

  test("upsert takes the whole update row even when it carries NULLs") {
    import spark.implicits._
    val snapshot = Seq((1L, Some("old"))).toDF("id", "name")
    val updates = Seq((1L, Option.empty[String])).toDF("id", "name")
    val out = Merge.upsert(snapshot, updates, "id").collect()
    assert(out.length == 1 && out.head.isNullAt(1),
      "NULL in the update row must win over the stale snapshot value")
  }

  test("upsert raises on multiple update rows for one key (MERGE semantics)") {
    import spark.implicits._
    val snapshot = Seq((1L, "a")).toDF("id", "name")
    val updates = Seq((1L, "x"), (1L, "y")).toDF("id", "name")
    val e = intercept[Exception] {
      Merge.upsert(snapshot, updates, "id").collect()
    }
    def causes(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: causes(x.getCause))
    assert(causes(e).exists(m => m != null && m.contains("multiple update rows")), e.getMessage)
  }

  test("upsert raises on a null merge key (no silent dual-retention)") {
    import spark.implicits._
    val snapshot = Seq((Option(1L), "a"), (Option.empty[Long], "b")).toDF("id", "name")
    val updates = Seq((Option.empty[Long], "b2")).toDF("id", "name")
    val e = intercept[Exception] {
      Merge.upsert(snapshot, updates, "id").collect()
    }
    def causes(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: causes(x.getCause))
    assert(causes(e).exists(m => m != null && m.contains("null id")), e.getMessage)
  }

  test("int8 quantization keeps cosine fidelity above 0.999 on real embeddings") {
    val report = Quantize.qQuantizeError(tables).collect()
    assert(report.length == tables.embeddings.count())
    val minFid = report.map(_.getAs[Double]("cos_fidelity")).min
    assert(minFid >= 0.999, s"worst cosine fidelity $minFid")
  }

  test("quantized values are genuine bytes with per-vector scale") {
    val q = Quantize.quantize(tables.embeddings).limit(5).collect()
    q.foreach { r =>
      val vec = r.getAs[scala.collection.Seq[Byte]]("q_vec")
      assert(vec.forall(b => b >= -127 && b <= 127))
      assert(r.getAs[Float]("q_scale") >= 0.0f)
    }
  }
}
