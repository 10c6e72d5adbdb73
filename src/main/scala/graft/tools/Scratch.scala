package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** Ad-hoc plan/profiling entry (not part of the driver contract).
  * `SPARK_GRAFT_EXPLAIN=q_name,q_name` prints executed plans;
  * otherwise times each named query.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val names = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN", "").split(",")
      .map(_.trim).filter(_.nonEmpty)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(s"=== $name (final plan) ===")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
