package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.operators.{Curate, Decontam, Dedup, Quantize}
import graft.sources.Tables

/** Executable end-to-end user story: the full training-data run a
  * user of this library executes — curate (dedup + quality gates) →
  * drop benchmark-contaminated docs → drop near-dup cluster
  * non-canonicals → attach int8-quantized embeddings → write the
  * curated corpus + a data card. Every stage is the same operator the
  * driver contract tests; this main just composes them.
  *
  *   sbt "runMain graft.tools.PipelineDemo [sfDir] [outDir]"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft_pipeline_out")
    val spark = GraftSession.getOrCreate()
    val t = Tables(spark, sfDir)

    // 1. curate: exact dedup keep-first + quality gates
    val curated = Curate.curated(t)

    // 2. decontaminate: drop docs overlapping the benchmark set — AND
    //    the benchmark docs themselves (the scan's corpus side excludes
    //    them from its REPORT, but a training corpus that still
    //    contains the eval set is the contamination this stage exists
    //    to remove)
    val contaminated = Decontam.qDecontaminate(t).select("doc_id")
    val clean = curated.join(contaminated, Seq("doc_id"), "left_anti")
      .filter(!Decontam.isBench)

    // 3. near-dup clusters: keep ONE representative per cluster among
    //    the docs that survived steps 1-2 (picking the cluster's
    //    global canonical would drop the whole cluster whenever the
    //    canonical itself was curated away)
    val clusters = Dedup.qDupClusters(t)
    val withCluster = clean.join(clusters, Seq("doc_id"), "left_outer")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val canonical = withCluster
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id").orderBy("doc_id")))
      .filter(col("_rn") === 1).drop("_rn", "cluster_id")

    // 4. attach int8-quantized embeddings by id (doc_id ↔ vec_id)
    val emb = Quantize.quantize(t.embeddings)
      .select(col("vec_id").as("doc_id"), col("q_vec"), col("q_scale"))
    val corpus = canonical.join(emb, Seq("doc_id"), "left_outer")
      .select("doc_id", "lang", "source", "n_tokens", "text", "q_vec", "q_scale")

    // one execution of the DAG; card/count read the written files back
    corpus.write.mode("overwrite").partitionBy("lang").parquet(s"$outDir/corpus")
    val written = spark.read.parquet(s"$outDir/corpus")
    val card = written.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        count(col("q_vec")).as("n_with_embedding"))
      .orderBy("lang")
    card.write.mode("overwrite").parquet(s"$outDir/data_card")
    println("=== data card ===")
    spark.read.parquet(s"$outDir/data_card").orderBy("lang").collect()
      .foreach(r => println(r.mkString("\t")))
    println(s"curated corpus written to $outDir/corpus (${written.count()} docs)")
    spark.stop()
  }
}
