package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Engine-portable rounding for oracle-compared outputs.
  *
  * `functions.round` (BigDecimal HALF_UP on the binary double) and
  * DuckDB's `round` (scale-then-round) disagree on .xx5-boundary
  * doubles, which breaks hash comparison on ~1% of rows. This formula
  * — floor(x·10^s + 0.5)/10^s — is computed on identical doubles in
  * both engines, so results are bit-identical. Oracles use the same
  * textual formula. (floor() yields LONG: safe while |x|·10^s < 2^63,
  * i.e. every oracle-scale aggregate; not for unbounded magnitudes.)
  *
  * Importing `Rnd.round` shadows the wildcard `functions._` import.
  */
object Rnd {
  def round(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * p + lit(0.5)) / p
  }
}
