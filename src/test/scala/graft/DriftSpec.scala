package graft

import graft.operators.Drift

class DriftSpec extends SparkSpecBase {

  test("PSI is non-negative, finite, and computed over both windows") {
    val rows = Drift.qDrift(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // each PSI term (p-q)·ln(p/q) is >= 0, so the sum must be; the
      // quantization can push an exact zero to at most -1e-8 per bin
      val psi = r.getAs[Double]("psi")
      assert(psi >= -1e-7 && psi < 5.0, s"${r.get(0)}: psi $psi")
      assert(r.getAs[Long]("n_ref") > 0 && r.getAs[Long]("n_cur") > 0)
    }
    // the synthetic generator is time-stationary: day-parity windows
    // draw from the same distribution, so PSI must read "stable"
    assert(rows.map(_.getAs[Double]("psi")).max < 0.25,
      "stationary corpus must not read as drifted")
  }
}
