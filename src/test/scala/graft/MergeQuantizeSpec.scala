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
