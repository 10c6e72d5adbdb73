package graft
import org.apache.spark.sql.SparkSession
/** Driver-run benchmark: every SparkEntry query timed at the given SF,
  * one JSON line out. A small untimed warmup absorbs session startup
  * and the first janino codegen compile so per-query numbers measure
  * the queries, not JVM warmup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count() }
    catch { case _: Throwable => () }
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // a failed query must not masquerade as a fast one
    val qs = results.map { case (k, v) =>
      s"\"" + k + "\":" + (if (failed.contains(k)) "-1" else v.toString)
    }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !failed.contains(k) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failed.length}}""")
    spark.stop()
  }
}
