package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class StreamingSpec extends SparkSpecBase {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("windowed hourly agg over a memory stream matches hand counts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(10), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 3.0),
      Event(4, ts(130), 1, "click", 4.0))
    val q = EventStreams.hourlyCounts(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("hourly_test").collect()
      val byKey = rows.map(r => (r.getAs[Timestamp]("window_start").getTime / 60000,
        r.getAs[String]("event_type")) -> r.getAs[Long]("cnt")).toMap
      assert(byKey((0L, "click")) == 2)
      assert(byKey((60L, "view")) == 1)
      assert(byKey((120L, "click")) == 1)
    } finally q.stop()
  }

  test("windowed KLL quantiles track per-window exact percentiles across batches") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.hourlyQuantiles(input.toDS().toDF(), watermark = "10 hours")
      .writeStream.format("memory").queryName("kll_win_test")
      .outputMode("complete").start()
    try {
      // hour 0: values 1..100 over two batches (sketch state must
      // merge across micro-batches); hour 1: constant 5.0
      input.addData((1 to 50).map(i => Event(i.toLong, ts(i % 50), 1, "c", i.toDouble)): _*)
      q.processAllAvailable()
      input.addData((51 to 100).map(i => Event(i.toLong, ts(i % 50), 1, "c", i.toDouble)): _*)
      input.addData(Event(200, ts(70), 2, "c", 5.0), Event(201, ts(71), 2, "c", 5.0))
      q.processAllAvailable()
      val rows = spark.table("kll_win_test").collect()
        .map(r => r.getAs[java.sql.Timestamp]("window_start").getTime / 3600000 ->
          (r.getAs[Double]("p50"), r.getAs[Double]("p95"), r.getAs[Long]("n_events"))).toMap
      val (p50, p95, n) = rows(0L)
      assert(n == 100)
      // k=200 sketch on 100 values is EXACT: p50 = 50th value, p95 = 95th
      assert(p50 >= 49.0 && p50 <= 51.0, s"hour-0 p50 $p50")
      assert(p95 >= 94.0 && p95 <= 96.0, s"hour-0 p95 $p95")
      val (c50, c95, cn) = rows(1L)
      assert(cn == 2 && c50 == 5.0 && c95 == 5.0)
    } finally q.stop()
  }

  test("windowed theta sketches: stored bytes answer cross-window overlap/churn") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.functions.GraftFunctions.{thetaANotB, thetaEstimate, thetaIntersectAgg, thetaUnionAgg}
    val input = MemoryStream[Event]
    val q = EventStreams.hourlyKeySketches(input.toDS().toDF(), watermark = "10 hours")
      .writeStream.format("memory").queryName("theta_win_test")
      .outputMode("complete").start()
    try {
      // hour 0: users 1..60 over TWO batches (sketch state must merge
      // across micro-batches); hour 1: users 41..100 → overlap 20,
      // churn (in h0, gone in h1) 40, reach 100 — all exact at lgK=12
      input.addData((1 to 30).map(u => Event(u.toLong, ts(u % 50), u.toLong, "c", 1.0)): _*)
      q.processAllAvailable()
      input.addData((31 to 60).map(u => Event(u.toLong, ts(u % 50), u.toLong, "c", 1.0)): _*)
      input.addData((41 to 100).map(u =>
        Event(1000 + u.toLong, ts(60 + u % 50), u.toLong, "c", 1.0)): _*)
      q.processAllAvailable()
      val rows = spark.table("theta_win_test").collect()
        .map(r => r.getAs[Timestamp]("window_start").getTime / 3600000 ->
          (r.getAs[Array[Byte]]("sk"), r.getAs[Long]("approx_users"))).toMap
      assert(rows(0L)._2 == 60L, s"hour-0 distincts ${rows(0L)._2}")
      assert(rows(1L)._2 == 60L, s"hour-1 distincts ${rows(1L)._2}")
      // downstream re-aggregation from the STORED bytes alone: the
      // whole point of emitting sketches instead of counts
      val stored = Seq(rows(0L)._1, rows(1L)._1).toDF("sk")
      val re = stored.agg(
        thetaEstimate(thetaIntersectAgg(col("sk"))).cast("long").as("overlap"),
        thetaEstimate(thetaUnionAgg(col("sk"), 12)).cast("long").as("reach")).head()
      assert(re.getLong(0) == 20L, s"overlap ${re.getLong(0)} vs exact 20")
      assert(re.getLong(1) == 100L, s"reach ${re.getLong(1)} vs exact 100")
      val churn = spark.range(1).select(
        thetaEstimate(thetaANotB(lit(rows(0L)._1), lit(rows(1L)._1)))
          .cast("long")).head().getLong(0)
      assert(churn == 40L, s"churn $churn vs exact 40")
    } finally q.stop()
  }

  test("token-bucket rate limiter: burst, refill, per-key isolation, cross-batch state") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    // 1 token/sec refill, burst of 2
    val q = EventStreams.rateLimit(input.toDS(), ratePerSec = 1.0, burst = 2.0)
      .writeStream.format("memory").queryName("ratelimit_test")
      .outputMode("append").start()
    def decisions() = spark.table("ratelimit_test")
      .as[EventStreams.RateDecision].collect()
      .map(d => d.event_id -> d.admitted).toMap
    try {
      def at(ms: Long) = new Timestamp(ms)
      // burst: 3 events in the same second → 2 admitted, 1 throttled;
      // another key is untouched by the first key's empty bucket
      input.addData(
        Event(1, at(1000), 7, "c", 0), Event(2, at(1000), 7, "c", 0),
        Event(3, at(1000), 7, "c", 0), Event(4, at(1000), 8, "c", 0))
      q.processAllAvailable()
      val d1 = decisions()
      assert(d1(1L) && d1(2L) && !d1(3L), s"burst decisions: $d1")
      assert(d1(4L), "key 8 must not share key 7's bucket")
      // cross-batch state: 2 seconds later the bucket refilled 2 → both admit
      input.addData(Event(5, at(3000), 7, "c", 0), Event(6, at(3000), 7, "c", 0))
      q.processAllAvailable()
      val d2 = decisions()
      assert(d2(5L) && d2(6L), s"refill decisions: $d2")
      // and a third in the same second is throttled again
      input.addData(Event(7, at(3000), 7, "c", 0))
      q.processAllAvailable()
      assert(!decisions()(7L), "bucket must be dry after the refill spent")
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions across batches") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapSec = 600, idleFlushMs = -1)
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("append").start()
    try {
      // batch 1: two events 5 min apart (one session forming)
      input.addData(Event(1, ts(0), 7, "click", 0), Event(2, ts(5), 7, "click", 0))
      q.processAllAvailable()
      assert(spark.table("sessions_test").count() == 0) // still open
      // batch 2: an event 2h later closes the first session
      input.addData(Event(3, ts(125), 7, "click", 0))
      q.processAllAvailable()
      val closed = spark.table("sessions_test").as[EventStreams.SessionOut].collect()
      assert(closed.length == 1)
      assert(closed.head.n_events == 2 && closed.head.dur_sec == 300)
    } finally q.stop()
  }

  test("a late cross-batch event merges without moving the session window backward") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapSec = 600, idleFlushMs = -1)
      .writeStream.format("memory").queryName("sessions_late_test")
      .outputMode("append").start()
    try {
      // batch 1: session edge at t=10min
      input.addData(Event(1, ts(10), 9, "click", 0))
      q.processAllAvailable()
      // batch 2: a LATE event at t=5min (inside the gap) merges; the
      // window must stay [5,10], not rewind its right edge to 5
      input.addData(Event(2, ts(5), 9, "click", 0))
      q.processAllAvailable()
      // batch 3: t=18min is within 600s of the TRUE edge (10min) —
      // with a rewound edge (5min) the gap would be 780s and this
      // would wrongly close the session
      input.addData(Event(3, ts(18), 9, "click", 0))
      q.processAllAvailable()
      assert(spark.table("sessions_late_test").count() == 0, "session wrongly split")
      // 2h later: flush — duration spans the late left edge to 18min
      input.addData(Event(4, ts(150), 9, "click", 0))
      q.processAllAvailable()
      val closed = spark.table("sessions_late_test").as[EventStreams.SessionOut].collect()
      assert(closed.length == 1)
      assert(closed.head.n_events == 3 && closed.head.dur_sec == 780,
        closed.mkString(","))
    } finally q.stop()
  }

  test("stream-static enrichment joins a dimension without watermarks or state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "trial")).toDF("user_id", "segment")
    val q = EventStreams.enrich(input.toDF(), dim)
      .select("event_id", "user_id", "segment")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      // user 3 has no dimension row: left join must pass it through
      input.addData(Event(1, ts(0), 1, "click", 0), Event(2, ts(1), 3, "view", 0))
      q.processAllAvailable()
      input.addData(Event(3, ts(2), 2, "click", 0))
      q.processAllAvailable()
      val got = spark.table("enrich_test").collect()
        .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
      assert(got == Map(1L -> Some("gold"), 2L -> None, 3L -> Some("trial")), got)
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to prior clicks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(10), 1, "click", 0),
      Event(2, ts(12), 1, "purchase", 9.99), // 2 min after click 1 → attributed
      Event(3, ts(30), 1, "purchase", 5.0),  // 20 min after → outside window
      Event(4, ts(11), 2, "purchase", 7.0))  // other user, no click
    val q = EventStreams.clickPurchaseAttribution(input.toDF(), windowSec = 300)
      .writeStream.format("memory").queryName("attrib_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("attrib_test").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("click_id") == 1 &&
        rows.head.getAs[Long]("purchase_id") == 2 &&
        rows.head.getAs[Double]("value") == 9.99)
    } finally q.stop()
  }

  test("windowed approx-distinct users tracks the exact count within rsd bounds") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    // window [0:00, 1:00): users 1..40, some repeating; [1:00, 2:00): users 1..10
    val batch1 = (1 to 40).map(u => Event(u.toLong, ts(u % 50), u.toLong % 40 + 1, "click", 0)) ++
      (1 to 20).map(u => Event(100 + u.toLong, ts(3), u.toLong % 40 + 1, "view", 0))
    val batch2 = (1 to 10).map(u => Event(200 + u.toLong, ts(70), u.toLong, "click", 0))
    input.addData(batch1 ++ batch2: _*)
    val q = EventStreams.hourlyUniqueUsers(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("uniq_users")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // close both windows: push the watermark past 2:10
      input.addData(Event(999, ts(200), 99, "view", 0))
      q.processAllAvailable()
      input.addData(Event(1000, ts(201), 99, "view", 0))
      q.processAllAvailable()
      val rows = spark.table("uniq_users").collect()
        .map(r => r.getAs[java.sql.Timestamp]("window_start").getTime / 60000 ->
          r.getAs[Long]("approx_users")).toMap
      // HLL at 5% rsd on n=40 / n=10: generous ±30% envelope — the
      // point is bounded-state cardinality, not exactness
      assert(rows.contains(0) && rows(0) >= 28 && rows(0) <= 52,
        s"window 0 approx ${rows.get(0)} vs exact 40")
      assert(rows.contains(60) && rows(60) >= 7 && rows(60) <= 13,
        s"window 60 approx ${rows.get(60)} vs exact 10")
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched clicks once the watermark proves them") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(10), 1, "click", 0),       // purchased 2 min later → matched
      Event(2, ts(12), 1, "purchase", 9.99),
      Event(3, ts(11), 2, "click", 0))       // never purchases → null row
    val q = EventStreams.clickPurchaseAttributionOuter(input.toDF(), windowSec = 300)
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // advance BOTH sides' watermarks far past click 3's window end so
      // the engine can prove no purchase can still arrive (outer rows
      // are watermark-delayed by design; events must pass the
      // click/purchase filters to reach the watermark nodes — a
      // filtered-out event advances nothing; different users and a
      // >window gap keep the advancing events from matching anything)
      input.addData(Event(99, ts(120), 8, "click", 0),
        Event(100, ts(130), 9, "purchase", 1.0))
      q.processAllAvailable()
      input.addData(Event(101, ts(131), 7, "click", 0),
        Event(102, ts(141), 6, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("attrib_outer").collect()
      val matched = rows.filter(r => !r.isNullAt(r.fieldIndex("purchase_id")))
      val unmatched = rows.filter(r => r.isNullAt(r.fieldIndex("purchase_id")))
      assert(matched.length == 1 &&
        matched.head.getAs[Long]("click_id") == 1 &&
        matched.head.getAs[Long]("purchase_id") == 2)
      assert(unmatched.length == 1 &&
        unmatched.head.getAs[Long]("click_id") == 3 &&
        unmatched.head.isNullAt(unmatched.head.fieldIndex("value")))
    } finally q.stop()
  }

  test("full-outer interval join emits both orphan cohorts once watermarks prove them") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(10), 1, "click", 0),       // matched pair
      Event(2, ts(12), 1, "purchase", 9.99),
      Event(3, ts(11), 2, "click", 0),       // never purchases → null purchase
      Event(4, ts(11), 3, "purchase", 4.0))  // no prior click → null click
    val q = EventStreams.clickPurchaseAttributionFull(input.toDF(), windowSec = 300)
      .writeStream.format("memory").queryName("attrib_full")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // push both watermarks far past every open window (distinct
      // users, >window gaps — the advancing events match nothing)
      input.addData(Event(99, ts(120), 8, "click", 0),
        Event(100, ts(130), 9, "purchase", 1.0))
      q.processAllAvailable()
      input.addData(Event(101, ts(131), 7, "click", 0),
        Event(102, ts(141), 6, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("attrib_full").collect()
        .filter(r => r.getAs[Long]("user_id") <= 3)
      val matched = rows.filter(r =>
        !r.isNullAt(r.fieldIndex("click_id")) &&
          !r.isNullAt(r.fieldIndex("purchase_id")))
      assert(matched.length == 1 && matched.head.getAs[Long]("click_id") == 1)
      val orphanClicks = rows.filter(r => r.isNullAt(r.fieldIndex("purchase_id")))
      assert(orphanClicks.map(_.getAs[Long]("click_id")).toSet == Set(3L),
        rows.mkString(","))
      val orphanPurchases = rows.filter(r => r.isNullAt(r.fieldIndex("click_id")))
      assert(orphanPurchases.map(_.getAs[Long]("purchase_id")).toSet == Set(4L),
        rows.mkString(","))
    } finally q.stop()
  }

  test("idle-flush timeout emits and evicts a silent user's open session") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapSec = 600, idleFlushMs = 500)
      .writeStream.format("memory").queryName("sessions_flush")
      .outputMode("append").start()
    try {
      input.addData(Event(1, ts(0), 9, "click", 0), Event(2, ts(3), 9, "click", 0))
      // cannot processAllAvailable here (pending timers block quiescence);
      // poll until the timeout fires and the open session is flushed
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        n = spark.table("sessions_flush").count()
      }
      val out = spark.table("sessions_flush").as[EventStreams.SessionOut].collect()
      assert(out.length == 1, "timeout did not flush the open session")
      assert(out.head.n_events == 2 && out.head.dur_sec == 180)
    } finally q.stop()
  }

  test("file-source stream: parquet drop-in directory aggregates incrementally") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val chk = java.nio.file.Files.createTempDirectory("graft-chk").toString
    Seq(Event(1, ts(5), 1, "click", 1.0), Event(2, ts(15), 2, "view", 2.0))
      .toDS().write.mode("append").parquet(dir)
    // same pipeline, source supplied through the provider trait
    val stream = graft.streaming
      .FileStreamSource("parquet", dir, Seq.empty[Event].toDS().schema)
      .readStream(spark)
    val q = EventStreams.hourlyCounts(stream, watermark = "1 minute")
      .writeStream.format("memory").queryName("file_hourly")
      .option("checkpointLocation", chk)
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("file_hourly").count() == 2)
      // a new file arriving is picked up incrementally
      Seq(Event(3, ts(20), 3, "click", 5.0)).toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      val cnt = spark.table("file_hourly")
        .where($"event_type" === "click").select("cnt").collect().map(_.getLong(0)).sum
      assert(cnt == 2)
    } finally q.stop()
  }

  test("checkpointed file sink survives restart exactly-once") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-src").toString
    val sink = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/out"
    val chk = java.nio.file.Files.createTempDirectory("graft-chk2").toString
    // source AND sink supplied through the provider traits
    def start() = graft.streaming.FileStreamSink("parquet", sink, chk).start(
      graft.streaming.FileStreamSource("parquet", src, Seq.empty[Event].toDS().schema)
        .readStream(spark)
        .filter($"value" >= 0))
    Seq(Event(1, ts(1), 1, "click", 1.0), Event(2, ts(2), 1, "view", 2.0))
      .toDS().write.mode("append").parquet(src)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // new data arrives while the query is down
    Seq(Event(3, ts(3), 2, "click", 3.0)).toDS().write.mode("append").parquet(src)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val out = spark.read.parquet(sink)
      // exactly-once across the restart: 3 rows, no dupes, no loss
      assert(out.count() == 3)
      assert(out.select("event_id").collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L, 3L)))
    } finally q2.stop()
  }

  test("AvailableNow backfill drains the pile in bounded batches, then resumes incrementally") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-bfsrc").toString
    val sink = java.nio.file.Files.createTempDirectory("graft-bfsink").toString + "/out"
    val chk = java.nio.file.Files.createTempDirectory("graft-bfchk").toString
    // a "historical pile": three separately-landed files
    (1 to 3).foreach { i =>
      Seq(Event(i.toLong, ts(i), i.toLong, "click", i.toDouble))
        .toDS().write.mode("append").parquet(src)
    }
    // maxFilesPerTrigger=1 forces the drain through MULTIPLE bounded
    // micro-batches — the rate-limited backfill, not one giant batch
    def start() = graft.streaming.FileStreamSink("parquet", sink, chk,
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow())).start(
      graft.streaming.FileStreamSource("parquet", src,
        Seq.empty[Event].toDS().schema, Map("maxFilesPerTrigger" -> "1"))
        .readStream(spark))
    val q1 = start()
    q1.awaitTermination(60000) // AvailableNow self-terminates when drained
    assert(!q1.isActive)
    assert(q1.recentProgress.count(_.numInputRows > 0) >= 3,
      q1.recentProgress.map(_.numInputRows).mkString(","))
    assert(spark.read.parquet(sink).count() == 3)
    // the same checkpoint resumes incrementally: only the new file
    Seq(Event(4, ts(4), 4, "view", 4.0)).toDS().write.mode("append").parquet(src)
    val q2 = start()
    q2.awaitTermination(60000)
    val out = spark.read.parquet(sink)
    assert(out.count() == 4) // exactly-once: no backfill re-read
    assert(out.select("event_id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L, 3L, 4L)))
  }

  test("vtable stream sink lands batches exactly-once across a restart") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-vsrc").toString
    val tableDir = java.nio.file.Files.createTempDirectory("graft-vsink").toString + "/t"
    val chk = java.nio.file.Files.createTempDirectory("graft-vchk").toString
    def start() = graft.streaming.VTableStreamSink(tableDir, chk).start(
      graft.streaming.FileStreamSource("parquet", src, Seq.empty[Event].toDS().schema)
        .readStream(spark))
    Seq(Event(1, ts(1), 1, "click", 1.0), Event(2, ts(2), 1, "view", 2.0))
      .toDS().write.mode("append").parquet(src)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // new data arrives while the query is down
    Seq(Event(3, ts(3), 2, "click", 3.0)).toDS().write.mode("append").parquet(src)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val t = graft.sources.VersionedTable(spark, tableDir)
      val out = t.read()
      // exactly-once into the ACID table: 3 rows, no dupes, no loss
      assert(out.count() == 3)
      assert(out.select("event_id").collect().map(_.getLong(0)).sorted
        .sameElements(Array(1L, 2L, 3L)))
      // commits carry their epoch, so a crash-replay of the last batch
      // would be recognized and skipped
      assert(t.lastCommittedEpoch.nonEmpty)
      // the streamed table is a full vtable: MERGE and time travel apply
      t.merge(Seq(Event(3, ts(3), 2, "click", 99.0)).toDS().toDF(), "event_id")
      assert(t.read().where($"event_id" === 3).head().getAs[Double]("value") == 99.0)
    } finally q2.stop()
  }

  test("CHECK constraints gate the streaming sink: violating batches fail, nothing half-lands") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-vcksrc").toString
    val tableDir = java.nio.file.Files.createTempDirectory("graft-vcktbl").toString + "/t"
    val chk = java.nio.file.Files.createTempDirectory("graft-vckchk").toString
    def start() = graft.streaming.VTableStreamSink(tableDir, chk).start(
      graft.streaming.FileStreamSource("parquet", src, Seq.empty[Event].toDS().schema)
        .readStream(spark))
    // first conforming batch creates the table; then constrain it
    Seq(Event(1, ts(1), 1, "click", 1.0)).toDS().write.mode("append").parquet(src)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    val t = graft.sources.VersionedTable(spark, tableDir)
    t.addConstraint("value_pos", "value > 0")
    // conforming batches keep landing through commitData's validation
    Seq(Event(2, ts(2), 1, "view", 2.0)).toDS().write.mode("append").parquet(src)
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    assert(t.read().count() == 2)
    // a violating batch fails the stream BEFORE any manifest claim:
    // the table is untouched and the refused files reclaimed — the
    // constraint is the same gate batch writes go through
    Seq(Event(3, ts(3), 1, "bad", -5.0)).toDS().write.mode("append").parquet(src)
    val q3 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
    }
    q3.stop()
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(c => String.valueOf(c.getMessage).contains("value_pos")), e.getMessage)
    assert(t.read().count() == 2, "the violating batch must not half-land")
    // lifting the constraint lets the SAME unconsumed batch through on
    // restart — the checkpoint never advanced past the refused epoch
    assert(t.dropConstraint("value_pos"))
    val q4 = start()
    try {
      q4.processAllAvailable()
      assert(t.read().count() == 3)
    } finally q4.stop()
  }

  test("UNIQUE gates the streaming sink: the epoch refuses loudly, remediation + replay lands exactly-once") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-vuqsrc").toString
    val tableDir = java.nio.file.Files.createTempDirectory("graft-vuqtbl").toString + "/t"
    val chk = java.nio.file.Files.createTempDirectory("graft-vuqchk").toString
    def start() = graft.streaming.VTableStreamSink(tableDir, chk).start(
      graft.streaming.FileStreamSource("parquet", src, Seq.empty[Event].toDS().schema)
        .readStream(spark))
    Seq(Event(1, ts(1), 1, "click", 1.0), Event(2, ts(2), 1, "view", 2.0),
      Event(3, ts(3), 2, "click", 3.0))
      .toDS().write.mode("append").parquet(src)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    val t = graft.sources.VersionedTable(spark, tableDir)
    t.addUniqueConstraint("eid_uq", Seq("event_id"))
    val vBefore = t.currentVersion
    // a batch duplicating a CARRIED key: the epoch must refuse, the
    // stream must FAIL (not wedge), and nothing may half-land
    Seq(Event(3, ts(4), 9, "dup", 99.0)).toDS().write.mode("append").parquet(src)
    val q2 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(c => String.valueOf(c.getMessage).contains("eid_uq")), e.getMessage)
    assert(t.currentVersion == vBefore && t.read().count() == 3,
      "the refused epoch must not half-land")
    // remediation: the operator deletes the conflicting table row, then
    // RESTARTS from the same checkpoint — the refused epoch never
    // advanced, so it replays whole and lands exactly-once
    t.deleteWhere($"event_id" === 3L)
    val q3 = start()
    try {
      q3.processAllAvailable()
      val out = t.read()
      assert(out.count() == 3)
      assert(out.where($"event_id" === 3L).head().getAs[Double]("value") == 99.0,
        "the replayed epoch's row must serve, exactly once")
    } finally q3.stop()
    // a batch violating WITHIN ITSELF refuses through the same gate
    Seq(Event(7, ts(5), 1, "a", 1.0), Event(7, ts(6), 1, "b", 2.0))
      .toDS().write.mode("append").parquet(src)
    val q4 = start()
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q4.processAllAvailable()
    }
    q4.stop()
    assert(Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(c => String.valueOf(c.getMessage).contains("eid_uq")), e2.getMessage)
    assert(t.read().count() == 3)
  }

  test("UNIQUE gates the CDC merge sink: a non-key duplicate refuses; fix + replay converges") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-muqsrc").toString
    val tableDir = java.nio.file.Files.createTempDirectory("graft-muqtbl").toString + "/t"
    val chk = java.nio.file.Files.createTempDirectory("graft-muqchk").toString
    val t = graft.sources.VersionedTable(spark, tableDir)
    t.append(Seq((1L, "a@x"), (2L, "b@x")).toDF("k", "email"))
    // the merge key keeps k unique by construction; the constraint
    // guards a NON-key column the upsert could still collide
    t.addUniqueConstraint("email_uq", Seq("email"))
    val schema = Seq.empty[(Long, String)].toDF("k", "email").schema
    def start() = graft.streaming.VTableMergeSink(tableDir, "k", chk).start(
      graft.streaming.FileStreamSource("parquet", src, schema).readStream(spark))
    // an insert duplicating k=1's email: the merge epoch must refuse
    Seq((4L, "a@x")).toDF("k", "email").write.mode("append").parquet(src)
    val q1 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(c => String.valueOf(c.getMessage).contains("email_uq")), e.getMessage)
    assert(t.read().count() == 2, "the refused merge epoch must not half-land")
    // fix the collision in the table, restart from the same checkpoint:
    // the refused epoch replays whole and lands exactly-once
    t.updateWhere($"k" === 1L, Map("email" -> org.apache.spark.sql.functions.lit("a2@x")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val out = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == Map(1L -> "a2@x", 2L -> "b@x", 4L -> "a@x"))
    } finally q2.stop()
  }

  test("vtable merge sink applies a CDC stream exactly-once, last change wins") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-cdcsrc").toString
    val tableDir = java.nio.file.Files.createTempDirectory("graft-cdct").toString + "/t"
    val chk = java.nio.file.Files.createTempDirectory("graft-cdcchk").toString
    val t = graft.sources.VersionedTable(spark, tableDir)
    // initial snapshot the change stream applies onto
    t.append(Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L)).toDF("k", "v", "seq"))
    val schema = Seq.empty[(Long, String, Long)].toDF("k", "v", "seq").schema
    def start() = graft.streaming.VTableMergeSink(tableDir, "k", chk,
      orderBy = Some("seq")).start(
      graft.streaming.FileStreamSource("parquet", src, schema).readStream(spark))
    // batch 1: update k=1, insert k=4
    Seq((1L, "a1", 1L), (4L, "d1", 1L)).toDF("k", "v", "seq")
      .write.mode("append").parquet(src)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // while the query is down: a batch with TWO changes to k=2 — the
    // in-batch window must keep only the later one — plus an insert
    Seq((2L, "b2", 2L), (2L, "b3", 3L), (5L, "e1", 2L)).toDF("k", "v", "seq")
      .write.mode("append").parquet(src)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val out = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == Map(1L -> "a1", 2L -> "b3", 3L -> "c", 4L -> "d1", 5L -> "e1"))
      assert(t.read().count() == 5) // key-unique: upsert, never append
      assert(t.lastCommittedEpoch.nonEmpty)
      // the applied table is a full vtable: time travel sees the
      // pre-stream snapshot
      assert(t.read(1).count() == 3)
      // a crash-replay of the last epoch is skipped WHOLE — the
      // foreachBatch at-least-once contract made exactly-once
      val e = t.lastCommittedEpoch.get
      assert(t.mergeEpoch(Seq((1L, "ZZZ", 9L)).toDF("k", "v", "seq"), "k", e).isEmpty)
      assert(t.read().where($"k" === 1).head().getString(1) == "a1")
    } finally q2.stop()
  }

  test("quality-gated sink routes violating rows to quarantine with check names") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-gate").toString
    val input = MemoryStream[Event]
    val checks = Seq(
      graft.operators.Profile.Check("value_positive", $"value" <= 0),
      graft.operators.Profile.Check("kind_known",
        !$"event_type".isInCollection(Seq("click", "view"))))
    val q = graft.streaming.QualityGatedVTableSink(
      s"$base/main", s"$base/quarantine", s"$base/chk", checks)
      .start(input.toDS().toDF())
    try {
      input.addData(
        Event(1, ts(1), 1, "click", 1.0),   // clean
        Event(2, ts(2), 1, "view", -2.0),   // value_positive
        Event(3, ts(3), 2, "zzz", 3.0),     // kind_known
        Event(4, ts(4), 2, "zzz", -4.0))    // both
      q.processAllAvailable()
      val main = graft.sources.VersionedTable(spark, s"$base/main").read()
      val quar = graft.sources.VersionedTable(spark, s"$base/quarantine").read()
      assert(main.select("event_id").as[Long].collect().toSeq == Seq(1L))
      val flagged = quar.select("event_id", "violated").as[(Long, String)]
        .collect().toMap
      assert(flagged == Map(2L -> "value_positive", 3L -> "kind_known",
        4L -> "value_positive,kind_known"))

      // a replayed epoch is a no-op on BOTH tables (exactly-once each)
      val mainT = graft.sources.VersionedTable(spark, s"$base/main")
      assert(mainT.appendEpoch(main.limit(1), 0L).isEmpty)
      val quarT = graft.sources.VersionedTable(spark, s"$base/quarantine")
      assert(quarT.appendEpoch(quar.limit(1), 0L).isEmpty)

      // triage path: fix quarantined rows and MERGE back into main —
      // the gate's schema (violated column dropped) matches again
      val fixed = quar.drop("violated")
        .withColumn("value", abs($"value"))
        .withColumn("event_type", lit("click"))
      mainT.merge(fixed, "event_id")
      assert(mainT.read().count() == 4)
      assert(mainT.read().where($"value" <= 0).count() == 0)
    } finally q.stop()
  }

  test("vtable sink auto-compacts on its epoch cadence without losing rows") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-vcsrc").toString
    val tableDir = java.nio.file.Files.createTempDirectory("graft-vcsink").toString + "/t"
    val chk = java.nio.file.Files.createTempDirectory("graft-vcchk").toString
    val sink = graft.streaming.VTableStreamSink(tableDir, chk,
      compactEvery = 2, compactTargetBytes = 10L << 20)
    // 4 separate drops → 4 epochs → compactions after epochs 1 and 3
    val q = sink.start(
      graft.streaming.FileStreamSource("parquet", src, Seq.empty[Event].toDS().schema)
        .readStream(spark))
    try {
      (1 to 4).foreach { i =>
        Seq(Event(i.toLong, ts(i), 1, "click", i.toDouble))
          .toDS().coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
      }
      val t = graft.sources.VersionedTable(spark, tableDir)
      // all four epochs landed exactly once, and the maintenance
      // commits kept the live file count bounded (4 appends -> 1 file)
      val out = t.read()
      assert(out.count() == 4)
      assert(out.select("event_id").collect().map(_.getLong(0)).sorted
        .sameElements(Array(1L, 2L, 3L, 4L)))
      assert(t.fileList(t.currentVersion).size < 4,
        s"no compaction happened: ${t.fileList(t.currentVersion)}")
      // the epoch high-water mark survived the interleaved compactions
      assert(t.lastCommittedEpoch.contains(3L))
    } finally q.stop()
  }

  test("clustered sink: inline compaction leaves a stream-fed table point-prunable") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-zcsrc").toString
    val tableDir = java.nio.file.Files.createTempDirectory("graft-zcsink").toString + "/t"
    val chk = java.nio.file.Files.createTempDirectory("graft-zcchk").toString
    // cluster on user_id; keep targetBytes tiny so the pack yields
    // multiple RANGE-disjoint files instead of one
    val sink = graft.streaming.VTableStreamSink(tableDir, chk,
      compactEvery = 4, compactTargetBytes = 3000L, clusterBy = Seq("user_id"))
    val q = sink.start(
      graft.streaming.FileStreamSource("parquet", src, Seq.empty[Event].toDS().schema)
        .readStream(spark))
    try {
      // 4 epochs, each spanning the FULL user range — before the
      // clustered compaction every file admits every user
      (1 to 4).foreach { i =>
        (0 until 64).map(u =>
            Event(i.toLong * 100 + u, ts(i), u.toLong, "click", 1.0))
          .toDS().coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
      }
      val t = graft.sources.VersionedTable(spark, tableDir)
      assert(t.read().count() == 256)
      val files = t.fileList(t.currentVersion)
      assert(files.size > 1, s"need several files to observe pruning: $files")
      val rd = t.readWhere(col("user_id") === 63L)
      assert(rd.count() == 4)
      assert(rd.inputFiles.length < files.size,
        s"clustered sink pruned nothing: ${rd.inputFiles.length} of ${files.size}")
    } finally q.stop()
  }

  test("streaming materialized view: per-epoch incremental refresh tracks the sink") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = java.nio.file.Files.createTempDirectory("graft-mvsrc").toString
    val parent = java.nio.file.Files.createTempDirectory("graft-mvsink").toString
    val tableDir = parent + "/t"
    val chk = java.nio.file.Files.createTempDirectory("graft-mvchk").toString
    val mv = graft.sources.MaterializedView(spark, parent + "/view", tableDir,
      Seq("event_type"),
      Seq(graft.sources.MvAgg.Count("n"), graft.sources.MvAgg.Sum("value", "total")))
    val q = graft.streaming.VTableStreamSink(tableDir, chk, refreshView = Some(mv))
      .start(graft.streaming.FileStreamSource(
        "parquet", src, Seq.empty[Event].toDS().schema).readStream(spark))
    try {
      (1 to 3).foreach { i =>
        Seq(Event(i.toLong, ts(i), 1, if (i % 2 == 0) "view" else "click", i.toDouble))
          .toDS().coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
      }
      val t = graft.sources.VersionedTable(spark, tableDir)
      // the view covers exactly the table's committed version and one
      // refresh landed per epoch (incremental, not one big recompute)
      assert(mv.coveredSourceVersion == t.currentVersion)
      assert(mv.stateVersion == 3)
      val got = mv.read().collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == Map("click" -> 2L, "view" -> 1L))
      val totals = mv.read().select(sum("total")).head().getDouble(0)
      assert(totals == 6.0)
    } finally q.stop()
  }

  test("trending terms: bounded Misra-Gries state per window, exact under capacity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(10), 1, "click", 0), Event(2, ts(20), 1, "click", 0),
      Event(3, ts(30), 2, "view", 0),
      Event(4, ts(70), 1, "view", 0), Event(5, ts(80), 2, "view", 0))
    val q = EventStreams.trendingTerms(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("trending_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("trending_test").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime / 60000,
          r.getString(1)) -> r.getLong(2)).toMap
      // vocabulary (2) << capacity (64): the sketch is exact
      assert(got == Map((0L, "click") -> 2L, (0L, "view") -> 1L, (60L, "view") -> 2L), got)
    } finally q.stop()
  }

  test("streaming dedup drops replayed events within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    // sink supplied through the provider trait
    val q = graft.streaming.MemoryStreamSink("dedup_test")
      .start(EventStreams.dedupStream(input.toDF(), watermark = "1 hour"))
    try {
      input.addData(
        Event(1, ts(10), 1, "click", 1.0),
        Event(2, ts(11), 1, "view", 2.0),
        Event(1, ts(10), 1, "click", 1.0)) // duplicate delivery in-batch
      q.processAllAvailable()
      // replayed across a later batch: still within the horizon → dropped
      input.addData(Event(2, ts(12), 1, "view", 2.0), Event(3, ts(13), 2, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)), ids.mkString(","))
    } finally q.stop()
  }

  test("memory-source provider drives the same pipeline as raw MemoryStream") {
    import spark.implicits._
    val src = new graft.streaming.MemoryStreamSource[Event](spark)
    src.add(Event(1, ts(10), 1, "click", 1.0), Event(2, ts(70), 2, "view", 2.0))
    val q = EventStreams.hourlyCounts(src.readStream(spark), watermark = "10 minutes")
      .writeStream.format("memory").queryName("provider_hourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("provider_hourly").collect()
      assert(rows.map(_.getAs[Long]("cnt")).sum == 2)
    } finally q.stop()
  }

  test("kafka-shaped source pins the production reader signature (env-blocked)") {
    // no kafka connector jar in this environment: construction must
    // fail at data-source lookup, NOT at option/plan assembly
    val e = intercept[Throwable] {
      graft.streaming.KafkaStreamSource("broker:9092", "events").readStream(spark)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.toLowerCase.contains("kafka")), e.toString)
  }

  test("batch q_events_hourly mirrors the streaming aggregation shape") {
    val batch = graft.operators.Relational.qEventsHourly(tables)
    assert(batch.columns.toSet == Set("event_type", "hr", "cnt", "total_value"))
    assert(batch.count() > 0)
  }

  test("native session_window stream emits closed sessions after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.sessionCounts(input.toDF(), gapSec = 600,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("swin_test")
      .outputMode("append").start()
    try {
      // one user: two events 5 min apart (one session), then silence
      input.addData(Event(1, ts(0), 7, "click", 0), Event(2, ts(5), 7, "click", 0))
      q.processAllAvailable()
      // advance the watermark far past the session's close
      input.addData(Event(3, ts(120), 8, "view", 0))
      q.processAllAvailable()
      val rows = spark.table("swin_test").collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_events")).toMap
      assert(rows == Map(7L -> 2L), rows.toString)
    } finally q.stop()
  }

  test("ivf stream sink: epochs land exactly-once; probes retrieve streamed vectors") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{IvfIndex, Similarity}
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfstream").toString
    // index built over the even half; the odd half arrives as a stream
    val built = IvfIndex.build(
      tables.embeddings.filter(col("vec_id") % 2 === 0), cells = 16, iters = 2)
    built.save(dir)
    built.unpersist()
    val base = IvfIndex.load(spark, dir).assigned.count()
    val odd = tables.embeddings.filter(col("vec_id") % 2 === 1)
      .collect().map(r => StreamingSpec.Vec(r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).toArray, r.getAs[Int]("label")))
    val input = MemoryStream[StreamingSpec.Vec]
    val q = graft.streaming.IvfStreamSink(dir, s"$dir/_ckpt").start(input.toDF())
    try {
      input.addData(odd.take(100).toIndexedSeq)
      q.processAllAvailable()
      input.addData(odd.drop(100).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val idx = IvfIndex.load(spark, dir)
    assert(idx.assigned.count() == base + odd.length,
      s"${idx.assigned.count()} != $base + ${odd.length}")
    // a replayed epoch (same id, same rows — foreachBatch redelivery)
    // must overwrite in place, not double-append
    IvfIndex.appendEpoch(spark, dir,
      odd.drop(100).toIndexedSeq.toDF("vec_id", "embedding", "label"), 1L)
    val replayed = IvfIndex.load(spark, dir)
    assert(replayed.assigned.count() == base + odd.length, "replay double-appended")
    // streamed (odd) vectors are retrievable through cell-pruned probes
    val hits = Similarity.ivfProbe(replayed,
      tables.embeddings.filter(col("vec_id").isin(2L, 4L, 6L))).collect()
    assert(hits.exists(_.getAs[Long]("vec_id") % 2 == 1),
      s"no streamed vector among ${hits.length} probe hits")
    idx.centroids.unpersist(); replayed.centroids.unpersist()
    ()
  }

  test("ivf stream sink auto-compacts on the cadence; folded epochs replay as no-ops") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{IvfIndex, Similarity}
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfcomp").toString
    val built = IvfIndex.build(
      tables.embeddings.filter(col("vec_id") % 2 === 0), cells = 16, iters = 2)
    built.save(dir)
    built.unpersist()
    val base = IvfIndex.load(spark, dir).assigned.count()
    val odd = tables.embeddings.filter(col("vec_id") % 2 === 1)
      .collect().map(r => StreamingSpec.Vec(r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).toArray, r.getAs[Int]("label")))
    val input = MemoryStream[StreamingSpec.Vec]
    // cadence 2: the second landed epoch (id 1) triggers the inline fold
    val q = graft.streaming.IvfStreamSink(dir, s"$dir/_ckpt", compactEvery = 2)
      .start(input.toDF())
    try {
      input.addData(odd.take(100).toIndexedSeq)
      q.processAllAvailable()
      input.addData(odd.drop(100).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    // both epochs folded into the base file: no epochs tree, all rows
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "epochs")),
      "cadence boundary should have folded the epoch trees")
    val idx = IvfIndex.load(spark, dir)
    assert(idx.assigned.count() == base + odd.length)
    // a foreachBatch redelivery of a FOLDED epoch (restart after the
    // fold, before the offset commit) must skip whole — its directory
    // is gone, so the overwrite idempotence can't apply, and a
    // re-append would double every row it carried
    assert(IvfIndex.maxFoldedEpoch(dir) == 1L)
    val skipped = IvfIndex.appendEpoch(spark, dir,
      odd.drop(100).toIndexedSeq.toDF("vec_id", "embedding", "label"), 1L)
    assert(skipped == 0L, "folded-epoch replay must be a no-op")
    assert(IvfIndex.load(spark, dir).assigned.count() == base + odd.length,
      "folded-epoch replay double-appended")
    // streamed vectors stay probe-retrievable through the folded file
    val hits = Similarity.ivfProbe(idx,
      tables.embeddings.filter(col("vec_id").isin(2L, 4L, 6L))).collect()
    assert(hits.exists(_.getAs[Long]("vec_id") % 2 == 1),
      s"no streamed vector among ${hits.length} probe hits")
    idx.centroids.unpersist()
    ()
  }
}

object StreamingSpec {
  final case class Vec(vec_id: Long, embedding: Array[Float], label: Int)
}
