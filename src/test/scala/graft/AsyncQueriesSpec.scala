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
}
