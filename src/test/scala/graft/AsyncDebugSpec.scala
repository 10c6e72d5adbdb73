package graft

import graft.service.{AsyncQueries, QueryService}

class AsyncDebugSpec extends SparkSpecBase {
  test("debug admission flow") {
    val service = new QueryService(spark)
    val aq = new AsyncQueries(service, maxConcurrent = 1)
    val slowSql = "SELECT max(id) AS s FROM range(2000000000000)"
    try {
      val ids = (1 to 4).map(_ => aq.start(slowSql))
      Thread.sleep(100)
      ids.foreach(aq.cancel)
      ids.foreach { id =>
        val dl = System.currentTimeMillis + 60000
        while (aq.status(id)._1 != "failed" && System.currentTimeMillis < dl) Thread.sleep(50)
      }
      val ok = aq.start("SELECT id FROM range(10) ORDER BY id")
      (1 to 12).foreach { i =>
        Thread.sleep(500)
        if (i % 4 == 0) {
          println(s"DBG t+${i*500}ms ok=${aq.status(ok)._1} active=${spark.sparkContext.statusTracker.getActiveJobIds.mkString(",")}")
          if (i == 8) {
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
              if (t.getName.contains("pool") && st.nonEmpty && !st.exists(_.toString.contains("getTask")))
                println(s"DBG THREAD ${t.getName}: ${st.take(12).mkString(" <- ")}")
            }
          }
        }
      }
    } finally aq.shutdown()
  }
}
