package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg

/** Misra-Gries guarantees, checked directly on the Aggregator kernel
  * (no Spark needed for the algebra) plus one end-to-end Spark gate.
  */
class TopKAggSpec extends AnyFunSuite {

  private def run(agg: TopKAgg, items: Seq[String]): Map[String, Long] =
    agg.finish(items.foldLeft(agg.zero)(agg.reduce))

  private def runPartitioned(agg: TopKAgg, parts: Seq[Seq[String]]): Map[String, Long] =
    agg.finish(parts.map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge))

  test("exact counts while the vocabulary fits the capacity") {
    val items = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(5)("c")
    val exact = items.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    assert(run(new TopKAgg(8), items) == exact)
    // same through an arbitrary partitioning (merge path)
    assert(runPartitioned(new TopKAgg(8), items.grouped(4).toSeq) == exact)
  }

  test("deficit bound: every counter undercounts by at most N/(capacity+1)") {
    // adversarial: 40 distinct rare terms churning a capacity-4 sketch
    // around two genuine heavy hitters
    val rare = (0 until 40).flatMap(i => Seq.fill(2)(s"r$i"))
    val items = new scala.util.Random(7).shuffle(
      (Seq.fill(50)("hot") ++ Seq.fill(30)("warm") ++ rare).toList)
    val exact = items.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val cap = 4
    val bound = items.size.toDouble / (cap + 1)
    for (parts <- Seq(Seq(items), items.grouped(13).toSeq)) {
      val est = runPartitioned(new TopKAgg(cap), parts)
      assert(est.size <= cap)
      est.foreach { case (t, c) =>
        assert(c <= exact(t), s"$t overcounted: $c > ${exact(t)}")
        assert(exact(t) - c <= bound, s"$t deficit ${exact(t) - c} > $bound")
      }
      // anything above the threshold frequency is guaranteed present
      exact.collect { case (t, n) if n > bound => t }.foreach { t =>
        assert(est.contains(t), s"guaranteed heavy hitter $t missing")
      }
    }
  }

  test("merge never grows the state past capacity and stays conservative") {
    val a = (0 until 30).flatMap(i => Seq.fill(i + 1)(s"t$i"))
    val agg = new TopKAgg(5)
    val merged = runPartitioned(agg, a.grouped(7).toSeq)
    assert(merged.size <= 5)
    val exact = a.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    merged.foreach { case (t, c) => assert(c <= exact(t)) }
  }
}
