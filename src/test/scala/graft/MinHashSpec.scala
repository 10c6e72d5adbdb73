package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HashImpl

class MinHashSpec extends SparkSpecBase {

  private def exactJaccard(a: String, b: String, k: Int): Double = {
    val sa = HashImpl.shingleHashes(a, k).toSet
    val sb = HashImpl.shingleHashes(b, k).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  private def estJaccard(a: String, b: String, n: Int, k: Int): Double = {
    val sa = HashImpl.minhash(UTF8String.fromString(a), n, k).toLongArray()
    val sb = HashImpl.minhash(UTF8String.fromString(b), n, k).toLongArray()
    sa.zip(sb).count { case (x, y) => x == y }.toDouble / n
  }

  private val words = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  private def doc(seed: Int, len: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" ")
  }

  test("minhash estimate tracks exact jaccard within 0.15 at n=128") {
    val base = doc(1, 200)
    for (mut <- Seq(0, 20, 60, 120)) {
      val rnd = new scala.util.Random(42 + mut)
      val toks = base.split(" ").toArray
      for (_ <- 0 until mut) toks(rnd.nextInt(toks.length)) = words(rnd.nextInt(words.size))
      val other = toks.mkString(" ")
      val exact = exactJaccard(base, other, 3)
      val est = estJaccard(base, other, 128, 3)
      assert(math.abs(exact - est) < 0.15, s"mut=$mut exact=$exact est=$est")
    }
  }

  test("identical docs have identical signatures; empty doc never matches") {
    assert(estJaccard("a b c d e f", "a b c d e f", 64, 3) == 1.0)
    assert(estJaccard("a b c d e f", "", 64, 3) == 0.0)
  }

  test("simhash hamming distance grows with edit volume") {
    val base = doc(7, 300)
    def ham(mut: Int): Int = {
      val rnd = new scala.util.Random(mut)
      val toks = base.split(" ").toArray
      for (_ <- 0 until mut) toks(rnd.nextInt(toks.length)) = words(rnd.nextInt(words.size))
      HashImpl.hamming64(
        HashImpl.simhash64(UTF8String.fromString(base), 3),
        HashImpl.simhash64(UTF8String.fromString(toks.mkString(" ")), 3))
    }
    assert(ham(0) == 0)
    val small = ham(5)
    val large = ham(150)
    assert(small < large, s"small=$small large=$large")
    assert(small <= 16)
  }

  test("rolling fingerprint is order-sensitive, token hashes are not") {
    val a = "one two three four five six"
    val b = "six five four three two one"
    assert(HashImpl.rollingFingerprint(UTF8String.fromString(a)) !=
      HashImpl.rollingFingerprint(UTF8String.fromString(b)))
    assert(HashImpl.shingleHashes(a, 1).toSet == HashImpl.shingleHashes(b, 1).toSet)
  }

  test("token_count matches whitespace-run semantics") {
    assert(HashImpl.tokenCount(UTF8String.fromString("a b  c\t d")) == 4)
    assert(HashImpl.tokenCount(UTF8String.fromString("")) == 0)
    assert(HashImpl.tokenCount(UTF8String.fromString("   ")) == 0)
    assert(HashImpl.tokenCount(UTF8String.fromString(" x ")) == 1)
  }
}
