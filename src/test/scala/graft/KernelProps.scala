package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HashImpl
import graft.multimodal.Media

/** Property-based checks of the pure kernels (no SparkSession):
  * ScalaCheck drives arbitrary inputs through the same static methods
  * whole-stage codegen calls.
  */
object KernelProps extends Properties("graft.kernels") {

  private val wsChars = Gen.oneOf(' ', '\t', '\n', '\r')
  private val tokenGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val messyText: Gen[String] = for {
    toks <- Gen.listOf(tokenGen)
    seps <- Gen.listOfN(toks.length + 1, Gen.nonEmptyListOf(wsChars).map(_.mkString))
  } yield seps.zipAll(toks, "", "").flatMap { case (s, t) => Seq(s, t) }.mkString

  property("tokenCount == reference split semantics on arbitrary whitespace") =
    forAll(messyText) { s =>
      val expected = s.trim.split("\\s+").count(_.nonEmpty)
      HashImpl.tokenCount(UTF8String.fromString(s)) == expected
    }

  property("hamming64 is a metric-ish: symmetric, zero iff equal, <= 64") =
    forAll { (a: Long, b: Long) =>
      val d = HashImpl.hamming64(a, b)
      d == HashImpl.hamming64(b, a) && (d == 0) == (a == b) && d >= 0 && d <= 64
    }

  property("identical text gives identical minhash; disjoint text never collides on all slots") =
    forAll(Gen.nonEmptyListOf(tokenGen), Gen.nonEmptyListOf(tokenGen)) { (as, bs) =>
      val a = as.mkString(" ")
      // '#' never appears in alphanumeric tokens → guaranteed-disjoint space
      val b = bs.map("#" + _).mkString(" ")
      val sa = HashImpl.minhash(UTF8String.fromString(a), 16, 1).toLongArray()
      val sa2 = HashImpl.minhash(UTF8String.fromString(a), 16, 1).toLongArray()
      val sb = HashImpl.minhash(UTF8String.fromString(b), 16, 1).toLongArray()
      sa.sameElements(sa2) && !sa.sameElements(sb)
    }

  property("shingle sets are order-insensitive for k=1 and order-sensitive for k=2") =
    forAll(Gen.listOfN(6, tokenGen).suchThat(l => l.distinct.length == l.length)) { toks =>
      val fwd = toks.mkString(" ")
      val rev = toks.reverse.mkString(" ")
      val uni = HashImpl.shingleHashes(fwd, 1).toSet == HashImpl.shingleHashes(rev, 1).toSet
      val bi = toks.length < 2 ||
        HashImpl.shingleHashes(fwd, 2).toSet != HashImpl.shingleHashes(rev, 2).toSet
      uni && bi
    }

  property("hashEmbed is deterministic, unit-norm (or zero), and dim-sized") =
    forAll(messyText, Gen.choose(4, 512)) { (text, dim) =>
      val a = HashImpl.hashEmbed(
        UTF8String.fromString(text), dim)
      val b = HashImpl.hashEmbed(
        UTF8String.fromString(text), dim)
      val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
      val hasTok = text.trim.nonEmpty
      // exact opposite-sign collisions can cancel a nonempty text to
      // the zero vector; empty text is ALWAYS the zero vector
      a.sameElements(b) && a.length == dim &&
        (norm == 0.0 || math.abs(norm - 1.0) < 1e-4) &&
        (hasTok || norm == 0.0)
    }

  property("pcm s16le decode exactly inverts 16-bit little-endian encode") =
    forAll(Gen.listOf(Gen.chooseNum(Short.MinValue, Short.MaxValue))) { shorts =>
      val bytes = shorts.flatMap(s =>
        Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
      val xs = Media.decodePcmS16le(bytes)
      xs.length == shorts.length &&
        shorts.zip(xs).forall { case (s, x) => x == s / 32768.0 }
    }

  property("resize output has target size and every pixel comes from the source") =
    forAll(Gen.choose(1, 12), Gen.choose(1, 12), Gen.choose(1, 12), Gen.choose(1, 12)) {
      (w, h, w2, h2) =>
        val px = Array.tabulate(w * h)(i => (i % 251).toByte)
        val out = Media.FakeDecoder.resize(px, w, h, w2, h2)
        out.length == w2 * h2 && out.forall(px.contains)
    }

  property("cosine is symmetric, bounded, and 1.0 on self for nonzero vectors") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-100, 100))) { xs =>
      val a = xs.map(_.toFloat).toArray
      val b = xs.reverse.map(v => (v / 2).toFloat).toArray
      val ad = toArrayData(a); val bd = toArrayData(b)
      val cab = graft.functions.VecImpl.cosine(ad, bd)
      val cba = graft.functions.VecImpl.cosine(bd, ad)
      val self = graft.functions.VecImpl.cosine(ad, ad)
      val zero = a.forall(_ == 0.0f)
      cab == cba && cab >= -1.0000001 && cab <= 1.0000001 &&
        (if (zero) self == 0.0 else math.abs(self - 1.0) < 1e-9)
    }

  property("dot against a zero vector is zero; norm is nonnegative") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-50, 50))) { xs =>
      val a = toArrayData(xs.map(_.toFloat).toArray)
      val z = toArrayData(Array.fill(xs.length)(0.0f))
      graft.functions.VecImpl.dot(a, z) == 0.0 &&
        graft.functions.VecImpl.norm(a) >= 0.0
    }

  private def toArrayData(a: Array[Float]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(a)

  property("rolling fingerprint changes under any single-char edit (sampled)") =
    forAll(Gen.alphaStr.suchThat(_.nonEmpty)) { s =>
      val mutated = "#" + s.drop(1)
      s == mutated || HashImpl.rollingFingerprint(UTF8String.fromString(s)) !=
        HashImpl.rollingFingerprint(UTF8String.fromString(mutated))
    }

  property("zvalue interleaves bits exactly (vs naive bit loop)") =
    forAll(Gen.choose(0L, 0xFFFFFFFFL), Gen.choose(0L, 0xFFFFFFFFL)) { (a, b) =>
      def naive(x: Long, y: Long): Long = {
        var z = 0L
        var i = 0
        while (i < 32) {
          z |= ((x >> i) & 1L) << (2 * i)
          z |= ((y >> i) & 1L) << (2 * i + 1)
          i += 1
        }
        z
      }
      HashImpl.zvalue(a, b) == naive(a, b)
    }

  property("zvalueN de-interleaves back to its inputs (3 and 4 dims)") =
    forAll(Gen.choose(2, 4), Gen.listOfN(4, Gen.choose(0L, Long.MaxValue))) {
      (d, raw) =>
        val bitsPer = 63 / d
        val mask = (1L << bitsPer) - 1
        val ids = raw.take(d).map(_ & mask).toArray
        val z = HashImpl.zvalueN(ids)
        // bit b of dim i must sit at z position b*d + i — recover all
        val back = Array.tabulate(d) { i =>
          (0 until bitsPer).foldLeft(0L)((acc, b) =>
            acc | (((z >>> (b * d + i)) & 1L) << b))
        }
        back.sameElements(ids)
    }

  property("zvalueN top interleaved bits come from every dim's top bit") =
    forAll(Gen.listOfN(3, Gen.choose(0L, (1L << 21) - 1))) { raw =>
      val ids = raw.toArray // 3 dims → 21 bits each
      val z = HashImpl.zvalueN(ids)
      (0 until 3).forall(i =>
        ((z >>> (20 * 3 + i)) & 1L) == ((ids(i) >>> 20) & 1L))
    }

  property("zvalue clusters quadrants: high bits come from high halves") =
    forAll(Gen.choose(0L, 0xFFFFFFFFL), Gen.choose(0L, 0xFFFFFFFFL)) { (a, b) =>
      // the top interleaved bit pair is (b's bit 31, a's bit 31): points
      // agreeing on both halves share the z-range's top quarter
      val z = HashImpl.zvalue(a, b)
      ((z >>> 63) & 1L) == ((b >>> 31) & 1L) && ((z >>> 62) & 1L) == ((a >>> 31) & 1L)
    }

  property("bloom filter never false-negatives, whatever the sizing") =
    forAll(Gen.nonEmptyListOf(Gen.long), Gen.choose(1, 16),
        Gen.choose(0.001, 0.3)) { (items, sizeDiv, fpp) =>
      // deliberately UNDER-size some filters (expected/sizeDiv): a full
      // filter answers true for everything — degraded, never wrong
      val agg = new graft.functions.BloomAgg(
        math.max(1, items.size / sizeDiv).toLong, fpp)
      // driver-side fold through the same reduce/merge the executors
      // run, split into two partials merged out of order
      val (l, r) = items.splitAt(items.size / 2)
      val merged = agg.merge(
        r.foldLeft(agg.zero)(agg.reduce),
        l.foldLeft(agg.zero)(agg.reduce))
      val bloom = agg.finish(merged)
      items.forall(h => HashImpl.bloomContains(bloom, h))
    }
}
