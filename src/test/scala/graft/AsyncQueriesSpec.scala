package graft

import graft.service.{AsyncQueries, QueryService}

class AsyncQueriesSpec extends SparkSpecBase {

  private lazy val service = new QueryService(spark)
  private val slowSql = "SELECT max(id) AS s FROM range(2000000000000)"

  private def awaitStatus(aq: AsyncQueries, id: String, want: String,
      timeoutMs: Long = 60000): String = {
    val deadline = System.currentTimeMillis + timeoutMs
    var st = aq.status(id)._1
    while (st != want && System.currentTimeMillis < deadline) {
      Thread.sleep(50)
      st = aq.status(id)._1
    }
    st
  }

  test("cancel before start: a queued job never runs and lands as failed") {
    val aq = new AsyncQueries(service, maxConcurrent = 1)
    try {
      val running = aq.start(slowSql)
      val queued = aq.start("SELECT 1 AS one") // behind the slow job, not started
      // the queued job has no Spark jobs yet — cancel must still take
      aq.cancel(queued)
      aq.cancel(running)
      assert(awaitStatus(aq, queued, "failed") == "failed")
      val (_, _, err) = aq.status(queued)
      assert(err.exists(_.contains("cancelled")), err.toString)
      assert(awaitStatus(aq, running, "failed") == "failed")
    } finally aq.shutdown()
  }

  test("admission bound sheds; finished jobs free slots; results page") {
    val aq = new AsyncQueries(service, maxConcurrent = 1)
    try {
      // bound = maxConcurrent * 4 = 4 unfinished jobs
      val ids = (1 to 4).map(_ => aq.start(slowSql))
      intercept[AsyncQueries.TooManyJobsException] { aq.start("SELECT 1 AS one") }
      ids.foreach(aq.cancel)
      ids.foreach(id => assert(awaitStatus(aq, id, "failed") == "failed"))
      // slots freed: a small query now runs to done and pages correctly
      val ok = aq.start("SELECT id FROM range(10) ORDER BY id")
      assert(awaitStatus(aq, ok, "done") == "done")
      assert(aq.result(ok, offset = 8, limit = 5).get.size == 2)
      intercept[IllegalArgumentException] { aq.result(ok, offset = -1) }
    } finally aq.shutdown()
  }

  test("onComplete fires exactly once per job — on done, failed, and cancelled") {
    val aq = new AsyncQueries(service, maxConcurrent = 1)
    try {
      val fired = new java.util.concurrent.atomic.AtomicInteger(0)
      val done = aq.start("SELECT 1 AS one", onComplete = () => { fired.incrementAndGet(); () })
      assert(awaitStatus(aq, done, "done") == "done")
      // the hook may run a hair after the state flips; wait for it
      val deadline = System.currentTimeMillis + 10000
      while (fired.get < 1 && System.currentTimeMillis < deadline) Thread.sleep(20)
      assert(fired.get == 1, s"done job must fire onComplete once, got ${fired.get}")
      val bad = aq.start("SELECT FROM definitely_not_a_table !!!",
        onComplete = () => { fired.incrementAndGet(); () })
      assert(awaitStatus(aq, bad, "failed") == "failed")
      val d2 = System.currentTimeMillis + 10000
      while (fired.get < 2 && System.currentTimeMillis < d2) Thread.sleep(20)
      assert(fired.get == 2, s"failed job must fire onComplete once, got ${fired.get}")
      val slow = aq.start(slowSql, onComplete = () => { fired.incrementAndGet(); () })
      aq.cancel(slow)
      assert(awaitStatus(aq, slow, "failed") == "failed")
      val d3 = System.currentTimeMillis + 10000
      while (fired.get < 3 && System.currentTimeMillis < d3) Thread.sleep(20)
      assert(fired.get == 3, s"cancelled job must fire onComplete once, got ${fired.get}")
    } finally aq.shutdown()
  }
}
