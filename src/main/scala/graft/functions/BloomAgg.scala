package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bloom filter built as a typed Aggregator — the mergeable-sketch
  * form of "does this set contain x" for sets too large to broadcast
  * raw. Each partition fills its own bit array from 64-bit item
  * hashes; partials combine by bitwise OR (set union is exact for
  * Bloom filters), so the build is one distributed aggregation with
  * map-side combine and a single `numBits/8`-byte result at the
  * driver — never the underlying strings.
  *
  * Sizing follows the standard formulas (Bloom '70):
  * m = -n·ln p / (ln 2)², k = (m/n)·ln 2 — callers state expected
  * items `n` and target false-positive rate `p`. False NEGATIVES are
  * impossible, which is what makes the filter safe as a PRE-filter:
  * downstream exact verification sees every true match, and the fp
  * rate only sizes the verification workload.
  *
  * Output layout: [int32 numHashes][bit bytes], probed by the
  * codegen'd `bloom_contains` expression via
  * [[HashImpl.bloomContains]] — set and probe share the
  * Kirsch-Mitzenmaier two-hash bit positions (g_i = h1 + i·h2), so a
  * filter built here is readable by any executor without this class.
  */
final class BloomAgg(expectedItems: Long, fpp: Double)
    extends Aggregator[Long, BloomAgg.Buf, Array[Byte]] {

  require(expectedItems >= 1, "expectedItems must be at least 1")
  require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")

  private val ln2 = math.log(2)
  private val numBytes: Int = {
    val m = math.ceil(-expectedItems.toDouble * math.log(fpp) / (ln2 * ln2))
    // whole bytes, at least one
    math.max(1, math.ceil(m / 8.0).toLong).min(Int.MaxValue.toLong / 8).toInt
  }
  private val numHashes: Int =
    math.max(1, math.round(numBytes.toDouble * 8 / expectedItems * ln2).toInt)

  override def zero: BloomAgg.Buf = BloomAgg.Buf(new Array[Byte](numBytes))

  override def reduce(b: BloomAgg.Buf, h: Long): BloomAgg.Buf = {
    val bits = b.bits
    val numBits = bits.length.toLong * 8L
    val h2 = HashImpl.mix64(h)
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h + i.toLong * h2, numBits)
      val idx = (bit >>> 3).toInt
      bits(idx) = (bits(idx) | (1 << (bit & 7L).toInt)).toByte
      i += 1
    }
    b
  }

  override def merge(a: BloomAgg.Buf, b: BloomAgg.Buf): BloomAgg.Buf = {
    val out = a.bits
    val in = b.bits
    var i = 0
    while (i < out.length) { out(i) = (out(i) | in(i)).toByte; i += 1 }
    a
  }

  override def finish(b: BloomAgg.Buf): Array[Byte] = {
    val out = new Array[Byte](4 + b.bits.length)
    out(0) = (numHashes >>> 24).toByte
    out(1) = (numHashes >>> 16).toByte
    out(2) = (numHashes >>> 8).toByte
    out(3) = numHashes.toByte
    System.arraycopy(b.bits, 0, out, 4, b.bits.length)
    out
  }

  override def bufferEncoder: Encoder[BloomAgg.Buf] = Encoders.product[BloomAgg.Buf]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAgg {
  final case class Buf(bits: Array[Byte])
}
