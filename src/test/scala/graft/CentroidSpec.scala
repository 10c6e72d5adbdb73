package graft

import graft.functions.CentroidAgg

class CentroidSpec extends SparkSpecBase {

  test("typed centroid aggregator averages element-wise per group") {
    import spark.implicits._
    val data = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 4.0f)),
      (1, Array(10.0f, 0.0f))).toDS()
    val centroid = new CentroidAgg(2).toColumn
    val out = data.groupByKey(_._1).mapValues(_._2).agg(centroid).collect().toMap
    assert(out(0).sameElements(Array(2.0, 3.0)))
    assert(out(1).sameElements(Array(10.0, 0.0)))
  }

  test("merge is associative: distributed result equals single-partition") {
    import spark.implicits._
    val vecs = (1 to 100).map(i => (i % 3, Array.fill(4)(i.toFloat)))
    val centroid = new CentroidAgg(4).toColumn
    def run(parts: Int) =
      vecs.toDS().repartition(parts).groupByKey(_._1).mapValues(_._2)
        .agg(centroid).collect().toMap.view.mapValues(_.toSeq).toMap
    assert(run(1) == run(7))
  }
}
