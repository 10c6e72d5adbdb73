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
