package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeat-timer for individual contract queries — separates genuine
  * plan cost from machine noise when tuning:
  * `runMain graft.tools.TimeQ <sfDir> <reps> <query...>`.
  * Rep 1 pays the cold per-corpus cost the bench measures; later reps
  * show the memoized steady state.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warmup at the smallest SF (codegen compile), like Bench
      try { fn(spark, "/root/testdata/sf0.001").count() } catch { case _: Throwable => () }
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
