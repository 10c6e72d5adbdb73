package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate: element-wise mean of float vectors
  * (embedding centroid). The buffer is a fixed (dim+count) array, so
  * partial aggregation applies — 100 TB of vectors reduce map-side to
  * one buffer per partition per group, and `merge` is associative
  * across partitions. Usage:
  *
  * {{{
  * val centroid = new CentroidAgg(64).toColumn
  * ds.groupByKey(_.label).agg(centroid)
  * }}}
  */
final class CentroidAgg(dim: Int)
    extends Aggregator[Array[Float], CentroidAgg.Buf, Array[Double]] {

  override def zero: CentroidAgg.Buf = CentroidAgg.Buf(new Array[Double](dim), 0L)

  override def reduce(b: CentroidAgg.Buf, v: Array[Float]): CentroidAgg.Buf = {
    // a short vector would silently zero-pad its tail while still
    // counting in the denominator, shrinking the centroid toward 0
    // with nothing ever surfacing the schema drift — reject it
    require(v.length == dim,
      s"CentroidAgg($dim) got a ${v.length}-dim vector; mixed dimensions bias the mean")
    var i = 0
    while (i < dim) { b.sums(i) += v(i); i += 1 }
    CentroidAgg.Buf(b.sums, b.n + 1)
  }

  override def merge(a: CentroidAgg.Buf, b: CentroidAgg.Buf): CentroidAgg.Buf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    CentroidAgg.Buf(a.sums, a.n + b.n)
  }

  override def finish(b: CentroidAgg.Buf): Array[Double] =
    if (b.n == 0) new Array[Double](dim) else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[CentroidAgg.Buf] = Encoders.product[CentroidAgg.Buf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object CentroidAgg {
  final case class Buf(sums: Array[Double], n: Long)
}
