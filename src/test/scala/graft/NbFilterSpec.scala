package graft

import graft.operators.NbFilter

/** The oracle proves train+score are reproduced exactly; these prove
  * the MODEL means something: held-out agreement with the distilled
  * signal and recovery of the signal tokens.
  */
class NbFilterSpec extends SparkSpecBase {

  test("holdout agreement with the distilled label beats 0.75") {
    val cm = NbFilter.qNbFilter(tables).collect()
      .map(r => (r.getAs[Int]("actual"), r.getAs[Int]("pred")) -> r.getAs[Long]("n"))
      .toMap
    val total = cm.values.sum
    val right = cm.getOrElse((0, 0), 0L) + cm.getOrElse((1, 1), 0L)
    assert(total > 0)
    val acc = right.toDouble / total
    assert(acc >= 0.75, s"holdout agreement $acc (cm=$cm)")
    // both classes actually occur in the holdout — the threshold
    // label is not degenerate
    assert(cm.keys.map(_._1).toSet == Set(0, 1))
  }

  test("streaming gate scores a document stream exactly like the batch expression") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val m = NbFilter.trainModel(tables)
    // batch truth over a holdout slice
    val docs = tables.documents.select("doc_id", "text")
      .filter(col("doc_id") % 2 === 1).limit(40)
      .as[(Long, String)].collect().toSeq
    val batch = NbFilter.nbGate(docs.toDF("doc_id", "text"), m)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    val input = MemoryStream[(Long, String)]
    val q = NbFilter.nbGate(input.toDF().toDF("doc_id", "text"), m)
      .writeStream.format("memory").queryName("nb_gate_test")
      .outputMode("append").start() // stateless: append works
    try {
      input.addData(docs.take(20): _*)
      q.processAllAvailable()
      input.addData(docs.drop(20): _*)
      q.processAllAvailable()
      val streamed = spark.table("nb_gate_test")
        .select("doc_id", "score").as[(Long, Long)].collect().toMap
      assert(streamed == batch)
      // the gate actually separates: both verdicts occur
      val keeps = spark.table("nb_gate_test").select("keep")
        .as[Int].collect().toSet
      assert(keeps == Set(0, 1), s"gate verdicts: $keeps")
    } finally q.stop()
  }

  test("the learned weights recover the signal tokens") {
    val top = NbFilter.tokenWeights(tables)
      .orderBy(org.apache.spark.sql.functions.col("w").desc)
      .limit(2).collect().map(_.getAs[String]("tok")).toSet
    assert(top == Set("the", "a"), s"top weights went to $top")
  }
}
