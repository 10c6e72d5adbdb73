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

    // 2. decontaminate: drop docs overlapping the benchmark set
    val contaminated = Decontam.qDecontaminate(t).select("doc_id")
    val clean = curated.join(contaminated, Seq("doc_id"), "left_anti")

    // 3. near-dup clusters: keep only each cluster's canonical doc
    val clusters = Dedup.qDupClusters(t)
    val nonCanonical = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    val canonical = clean.join(nonCanonical, Seq("doc_id"), "left_anti")

    // 4. attach int8-quantized embeddings by id (doc_id ↔ vec_id)
    val emb = Quantize.quantize(t.embeddings)
      .select(col("vec_id").as("doc_id"), col("q_vec"), col("q_scale"))
    val corpus = canonical.join(emb, Seq("doc_id"), "left_outer")
      .select("doc_id", "lang", "source", "n_tokens", "text", "q_vec", "q_scale")

    corpus.write.mode("overwrite").partitionBy("lang").parquet(s"$outDir/corpus")

    // 5. data card
    val card = corpus.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        count(col("q_vec")).as("n_with_embedding"))
      .orderBy("lang")
    card.write.mode("overwrite").parquet(s"$outDir/data_card")
    val rows = card.collect()
    println("=== data card ===")
    rows.foreach(r => println(r.mkString("\t")))
    println(s"curated corpus written to $outDir/corpus (${corpus.count()} docs)")
    spark.stop()
  }
}
