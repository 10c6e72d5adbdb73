package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Ad-hoc profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val t = Tables(spark, sfDir)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warmup
    t.lineitem.count()

    val k = 5
    val docs = t.documents.repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= k)
    val shingled = docs.select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(1), size(col("w")) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(col("w"), i + j)): _*)
      ))).as("shingle"))
    time("shingle explode count")(println(shingled.count()))
    val hot = shingled.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > 50).select("shingle")
    time("hot count")(println(hot.count()))
    val capped = shingled.join(broadcast(hot), Seq("shingle"), "left_anti")
    time("capped count")(println(capped.count()))
    val pairs = capped.as("x").join(capped.as("y"),
      col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    time("pairs count")(println(pairs.count()))
    time("full query")(println(graft.operators.Dedup.qNgramJaccard(t).count()))
    time("full query again")(println(graft.operators.Dedup.qNgramJaccard(t).count()))
    spark.stop()
  }
}
