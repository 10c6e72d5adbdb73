package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed Aggregator — the
  * bounded-memory answer to "top terms over a stream too wide to
  * count exactly". State is AT MOST `capacity` counters regardless of
  * input cardinality; merge follows the mergeable-summaries recipe
  * (Agarwal et al., PODS 2012): sum counters, then subtract the
  * (capacity+1)-th largest value and drop non-positive counters, which
  * preserves the sketch's deficit bound across partials.
  *
  * Guarantees (N = stream length): every counter undercounts its term
  * by at most N/(capacity+1); any term with true frequency >
  * N/(capacity+1) is GUARANTEED present. When the observed vocabulary
  * never exceeds `capacity` no decrement ever fires and every count is
  * EXACT — which is what lets the contract query hold a DuckDB oracle
  * on the synthetic corpus while the same code degrades gracefully to
  * a sketch at web-scale vocabularies.
  *
  * This is deliberately an object-hash (typed) aggregate, not codegen:
  * its value is the O(capacity) state bound where an exact
  * groupBy(term) would shuffle the full vocabulary; per-group partials
  * still combine map-side before the shuffle.
  */
final class TopKAgg(capacity: Int)
    extends Aggregator[String, TopKAgg.Buf, Map[String, Long]] {

  require(capacity >= 1, "capacity must be at least 1")

  override def zero: TopKAgg.Buf = TopKAgg.Buf(Map.empty)

  override def reduce(b: TopKAgg.Buf, term: String): TopKAgg.Buf = {
    val m = b.m
    m.get(term) match {
      case Some(c) => TopKAgg.Buf(m.updated(term, c + 1L))
      case None if m.size < capacity => TopKAgg.Buf(m.updated(term, 1L))
      case None =>
        // classic MG step: a full sketch meeting a new term decrements
        // every counter (amortized O(1) per increment — each decrement
        // cancels capacity+1 prior arrivals)
        TopKAgg.Buf(m.collect { case (t, c) if c > 1L => t -> (c - 1L) })
    }
  }

  override def merge(a: TopKAgg.Buf, b: TopKAgg.Buf): TopKAgg.Buf = {
    if (a.m.isEmpty) return b
    if (b.m.isEmpty) return a
    val summed = (a.m.keySet ++ b.m.keySet).iterator
      .map(t => t -> (a.m.getOrElse(t, 0L) + b.m.getOrElse(t, 0L))).toMap
    if (summed.size <= capacity) TopKAgg.Buf(summed)
    else {
      // subtract the (capacity+1)-th largest count from everything;
      // exactly the decrement-all step applied in bulk
      val cut = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      TopKAgg.Buf(summed.collect { case (t, c) if c > cut => t -> (c - cut) })
    }
  }

  override def finish(b: TopKAgg.Buf): Map[String, Long] = b.m

  override def bufferEncoder: Encoder[TopKAgg.Buf] = Encoders.product[TopKAgg.Buf]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object TopKAgg {
  final case class Buf(m: Map[String, Long])
}
