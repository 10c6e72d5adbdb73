package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Rnd.round

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Scalar int8 quantization of embedding vectors — the storage/IO
  * lever at 100 TB: 4 bytes/dim → 1 byte/dim + one float scale per
  * vector, with bounded cosine error (symmetric absmax scheme, as
  * used by public int8 inference/storage stacks). Quantize and
  * dequantize are pure column expressions (transform/aggregate), so
  * they run inside codegen with no UDF.
  */
object Quantize {

  /** Per-vector absmax scale: max |x| / 127. */
  def scaleCol(vec: Column): Column =
    aggregate(vec, lit(0.0f), (acc, x) => greatest(acc, abs(x))) / 127.0f

  /** Quantized int8 representation (as array<tinyint>) + scale. */
  def quantize(df: DataFrame, vec: String = "embedding"): DataFrame = {
    val s = scaleCol(col(vec))
    df.withColumn("q_scale", s.cast("float"))
      .withColumn("q_vec",
        transform(col(vec), x =>
          when(col("q_scale") === 0.0f, lit(0))
            .otherwise(org.apache.spark.sql.functions.round(x / col("q_scale")))
            .cast("byte")))
  }

  /** Dequantized float vector from (q_vec, q_scale). */
  def dequantize(df: DataFrame): DataFrame =
    df.withColumn("dq_vec",
      transform(col("q_vec"), x => (x.cast("float") * col("q_scale"))))

  /** Reconstruction quality report (rows-only; QuantizeSpec bounds
    * the error): cosine between original and dequantized vectors.
    */
  def qQuantizeError(t: Tables): DataFrame = {
    val q = dequantize(quantize(t.embeddings))
    q.select(col("vec_id"),
        round(GraftFunctions.cosineSim(col("embedding"), col("dq_vec")), 4).as("cos_fidelity"))
      .orderBy("vec_id")
  }
}
