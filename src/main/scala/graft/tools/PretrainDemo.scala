package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.operators.{NbFilter, Pretrain}
import graft.sources.Tables

/** Executable batch-prep user story: the steps between a curated
  * corpus and a training run, composed from the contract operators —
  * model-based quality gate (batch-trained NB) → domain-mixture
  * rebalance → deterministic shuffle order → sequence packing — and a
  * run manifest recording what each stage kept. PipelineDemo is the
  * CURATION story; this is the BATCH-PREP story downstream of it.
  *
  *   sbt "runMain graft.tools.PretrainDemo [sfDir] [outDir]"
  */
object PretrainDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft_pretrain_out")
    val spark = GraftSession.getOrCreate()
    val t = Tables(spark, sfDir)

    // 1. model-based quality gate: train once, score as a projection
    val model = NbFilter.trainModel(t)
    val gated = NbFilter.nbGate(t.documents.select("doc_id", "text", "lang"), model)
      .filter(col("keep") === 1)

    // 2. mixture rebalance over the GATED SURVIVORS: the gates derive
    //    from the population they're applied to — rates computed on
    //    the raw corpus would miss whatever the model gate removed
    //    unevenly across languages, and the achieved mixture would
    //    drift from the targets
    gated.persist()
    val nGated = gated.count()
    val counts = gated.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      .withColumn("n_total",
        sum("n_lang").over(org.apache.spark.sql.expressions.Window.partitionBy()))
    // same formula as the contract query, by construction
    val gates = Pretrain.mixGates(counts).select("lang", "gate")
    val mixed = gated
      .withColumn("hv", Pretrain.portableHash(col("doc_id")))
      .join(broadcast(gates), "lang")
      .filter(pmod(col("hv"), lit(10000L)) < col("gate"))
      .persist()

    // 3. deterministic training order + fixed-budget packing over the
    //    FINAL roster (gated ∩ mixed — a doc the filters dropped must
    //    not appear in a pack) — budgeted by the REAL tokenizer
    //    (corpus-trained BPE), not whitespace counts
    graft.functions.Bpe.register("demo-bpe", graft.functions.Bpe.trainOn(t.documents))
    val packs = Pretrain.packSequences(
      mixed.select(col("doc_id"),
        graft.functions.Bpe.tokenCount("demo-bpe", col("text")).cast("long").as("tokens")),
      budget = 512L)
    // training order: total-order sort by the portable hash — range
    // partitioning gives globally sorted output files, the practical
    // form of the contract query's explicit rank assignment
    val order = mixed.select(col("doc_id"), col("hv"))
      .repartitionByRange(col("hv"), col("doc_id"))
      .sortWithinPartitions("hv", "doc_id")

    mixed.select("doc_id", "lang").write.mode("overwrite")
      .parquet(s"$outDir/roster")
    packs.write.mode("overwrite").parquet(s"$outDir/packs")
    order.write.mode("overwrite").parquet(s"$outDir/order")

    val nDocs = t.documents.count()
    val nMixed = spark.read.parquet(s"$outDir/roster").count()
    val nPacks = spark.read.parquet(s"$outDir/packs").count()
    gated.unpersist()
    mixed.unpersist()
    val corpusJson = sfDir.replace("\\", "\\\\").replace("\"", "\\\"")
    val manifest =
      s"""{"corpus":"$corpusJson","n_docs":$nDocs,"kept_by_model":$nGated,
         |"kept_by_mixture":$nMixed,"n_packs":$nPacks,"pack_budget":512}"""
        .stripMargin.replaceAll("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(outDir, "manifest.json"),
      manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"=== pretrain batch prep ===")
    println(manifest)
    spark.stop()
  }
}
