package graft.tools

import graft.engine.GraftSession

/** Repeat-timer for individual contract queries — separates genuine
  * plan cost from machine noise when tuning:
  * `runMain graft.tools.TimeQ <sfDir> <reps> <query...>`.
  * Rep 1 pays the cold per-corpus cost the bench measures; later reps
  * show the memoized steady state. `SPARK_GRAFT_CPUS` sizes the local
  * master; `SPARK_GRAFT_WARM_DIR` overrides the warmup corpus.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.builder(
      master = s"local[$cpus]", appName = "graft-timeq", shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warmup at the smallest SF (codegen compile), like Bench
      try { fn(spark, warmDir).count() } catch { case scala.util.control.NonFatal(_) => () }
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeq] $name%-20s ${times.map(t => f"$t%.2f").mkString(" ")}  min=${times.min}%.2f")
    }
    spark.stop()
  }
}
