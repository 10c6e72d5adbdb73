package graft

import graft.operators.NbFilter

/** The oracle proves train+score are reproduced exactly; these prove
  * the MODEL means something: held-out agreement with the distilled
  * signal and recovery of the signal tokens.
  */
class NbFilterSpec extends SparkSpecBase {

  test("holdout agreement with the distilled label beats 0.75") {
    val cm = NbFilter.qNbFilter(tables).collect()
      .map(r => (r.getAs[Int]("actual"), r.getAs[Int]("pred")) -> r.getAs[Long]("n"))
      .toMap
    val total = cm.values.sum
    val right = cm.getOrElse((0, 0), 0L) + cm.getOrElse((1, 1), 0L)
    assert(total > 0)
    val acc = right.toDouble / total
    assert(acc >= 0.75, s"holdout agreement $acc (cm=$cm)")
    // both classes actually occur in the holdout — the threshold
    // label is not degenerate
    assert(cm.keys.map(_._1).toSet == Set(0, 1))
  }

  test("the learned weights recover the signal tokens") {
    val top = NbFilter.tokenWeights(tables)
      .orderBy(org.apache.spark.sql.functions.col("w").desc)
      .limit(2).collect().map(_.getAs[String]("tok")).toSet
    assert(top == Set("the", "a"), s"top weights went to $top")
  }
}
