package graft

import graft.operators.Drift

class DriftSpec extends SparkSpecBase {

  test("PSI is non-negative, finite, and computed over both windows") {
    val rows = Drift.qDrift(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // each PSI term (p-q)·ln(p/q) is >= 0, so the sum must be; the
      // quantization can push an exact zero to at most -1e-8 per bin
      val psi = r.getAs[Double]("psi")
      assert(psi >= -1e-7 && psi < 5.0, s"${r.get(0)}: psi $psi")
      assert(r.getAs[Long]("n_ref") > 0 && r.getAs[Long]("n_cur") > 0)
    }
    // the synthetic generator is time-stationary: day-parity windows
    // draw from the same distribution, so PSI must read "stable"
    assert(rows.map(_.getAs[Double]("psi")).max < 0.25,
      "stationary corpus must not read as drifted")
  }

  test("streaming gate: a shifted micro-batch alarms, a stationary one stays quiet") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val refBins = tables.events
      .select(col("event_type"), Drift.binCol(50.0, 10))
      .select("event_type", "bin").persist()
    refBins.count()
    val psis = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
    val input = MemoryStream[(String, Double)]
    val q = input.toDF().toDF("event_type", "value").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val cur = batch.select(col("event_type"), Drift.binCol(50.0, 10))
          .select("event_type", "bin")
        psis ++= Drift.psiOf(refBins, cur).collect()
          .map(r => (id, r.getAs[String]("event_type"), r.getAs[Double]("psi")))
        ()
      }.start()
    try {
      // batch 0: resample the reference's own values → stable
      val sample = tables.events.select("event_type", "value")
        .as[(String, Double)].collect()
      input.addData(sample.take(400).toSeq: _*)
      q.processAllAvailable()
      // batch 1: same types, values shifted out of their bins → drift
      input.addData(sample.take(400).map { case (t, v) => (t, v + 250.0) }.toSeq: _*)
      q.processAllAvailable()
      val byBatch = psis.groupBy(_._1).view.mapValues(_.map(_._3)).toMap
      assert(byBatch(0L).max < 0.25, s"stationary batch alarmed: ${byBatch(0L)}")
      assert(byBatch(1L).min > 0.25, s"shifted batch silent: ${byBatch(1L)}")
    } finally { q.stop(); refBins.unpersist(); () }
  }
}
