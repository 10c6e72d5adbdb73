package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Vector math kernels shared by interpreted eval and generated code.
  *
  * Scala object methods compile to static forwarders, so whole-stage
  * codegen can call `graft.functions.VecImpl.dot(a, b)` directly from
  * generated Java — the expression stays inside the codegen span.
  *
  * All accumulation is in Double (floats promoted exactly), matching
  * DuckDB's list_cosine_similarity over DOUBLE[] for oracle parity.
  */
object VecImpl {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }
}
