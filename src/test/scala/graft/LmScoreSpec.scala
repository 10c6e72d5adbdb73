package graft

import graft.operators.LmScore

/** The oracle proves train+score exactly; these pin what the scores
  * MEAN for a perplexity gate.
  */
class LmScoreSpec extends SparkSpecBase {

  test("holdout scores are sane log-probs and split is respected") {
    val rows = LmScore.qLmScore(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 2 == 1, "holdout must be odd ids")
      assert(r.getAs[Long]("n_bigrams") >= 1)
      val lp = r.getAs[Double]("avg_lp")
      // avg log-prob of a smoothed bigram model: strictly negative,
      // bounded below by the uniform floor ln(1/V) and far above -20
      assert(lp < 0 && lp > -20, s"doc ${r.get(0)}: $lp")
    }
  }

  test("in-distribution text outscores out-of-vocabulary text") {
    // the corpus vocabulary is shared: an average holdout doc must
    // beat the uniform floor that pure-OOV text would receive
    val rows = LmScore.qLmScore(tables).collect()
    val mean = rows.map(_.getAs[Double]("avg_lp")).sum / rows.length
    // uniform floor = ln(1/V); corpus vocab is ~100 words → ~ -4.6
    assert(mean > -4.6, s"mean avg_lp $mean not above the uniform floor")
  }
}
