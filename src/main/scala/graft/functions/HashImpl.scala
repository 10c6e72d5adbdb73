package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Text-hashing kernels (minhash, simhash, rolling fingerprint, token
  * count) shared by interpreted eval and generated code. Static
  * forwarders keep these callable from whole-stage codegen.
  *
  * Hash family: one 64-bit mix of each shingle (`mix64`) plus the
  * standard two-hash construction g_i(x) = h1 + i*h2, giving n
  * pairwise-independent-ish minhash functions from two base hashes —
  * O(shingles) per row instead of O(shingles * n).
  */
object HashImpl {

  /** splitmix64 finalizer — fast, well-mixed 64-bit hash step. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit hash of a string region via rolling splitmix over chars. */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h = mix64(h ^ s.charAt(i).toLong); i += 1 }
    h
  }

  private def tokens(text: String): Array[String] = {
    val t = text.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Hashes of word `k`-shingles (distinct). k<=0 → unigram tokens. */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val toks = tokens(text)
    val kk = math.max(k, 1)
    if (toks.length < kk) return Array.empty
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](toks.length)
    var i = 0
    while (i + kk <= toks.length) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < kk) { h = mix64(h ^ hash64(toks(i + j))); j += 1 }
      if (seen.add(h)) out += h
      i += 1
    }
    out.toArray
  }

  /** MinHash signature: n minimum values of g_i(shingle) = h1 + i*h2.
    * Empty/short text → signature of Long.MaxValue slots (never
    * matches a non-empty doc's slots by accident).
    */
  def minhash(text: UTF8String, numHashes: Int, shingleSize: Int): ArrayData = {
    val hs = shingleHashes(text.toString, shingleSize)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < hs.length) {
      val h1 = hs(s)
      val h2 = mix64(h1) | 1L // odd → full-period stride
      var i = 0
      var g = h1
      while (i < numHashes) {
        if (g < sig(i)) sig(i) = g
        g += h2
        i += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over word shingles: per-bit vote by shingle hash. */
  def simhash64(text: UTF8String, shingleSize: Int): Long = {
    val hs = shingleHashes(text.toString, shingleSize)
    val votes = new Array[Int](64)
    var s = 0
    while (s < hs.length) {
      val h = hs(s)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      s += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Polynomial rolling-hash fingerprint of the whole string (order-
    * sensitive, unlike the shingle-set hashes above).
    */
  def rollingFingerprint(text: UTF8String): Long = {
    val s = text.toString
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31L * h + s.charAt(i); i += 1 }
    mix64(h)
  }

  /** One definition of "whitespace token" for every substring-needing
    * consumer (hashEmbed, BPE counting) — a token-boundary change must
    * not silently diverge between them. [[tokenCount]] keeps its own
    * substring-free loop (same boundaries, hot path, zero allocation).
    */
  def foreachToken(s: String)(f: String => Unit): Unit = {
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) f(s.substring(start, i))
    }
  }

  /** Number of whitespace-separated tokens (runs of non-whitespace). */
  def tokenCount(text: UTF8String): Int = {
    val s = text.toString
    var count = 0
    var inTok = false
    var i = 0
    while (i < s.length) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !inTok) { count += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    count
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Feature-hashed document vector (Weinberger '09 hashing trick,
    * signed): each whitespace token lands in bucket `hash mod dim`
    * with a hash-derived ±1 sign (kills accumulation bias), then L2
    * normalize — a text→unit-vector embedding with NO trained state,
    * computable inside codegen in one pass. All-whitespace text →
    * zero vector (callers filter on norm, never divide by it).
    */
  def hashEmbed(text: UTF8String, dim: Int): Array[Float] = {
    // validated HERE so codegen (which calls this directly, skipping
    // the expression's eval path) raises the same clean error
    require(dim > 0, s"hash_embed dim must be positive, got $dim")
    val s = text.toString
    val v = new Array[Float](dim)
    foreachToken(s) { tok =>
      val h = hash64(tok)
      val idx = (((h % dim) + dim) % dim).toInt
      v(idx) += (if (((h >>> 62) & 1L) == 1L) 1f else -1f)
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += v(j).toDouble * v(j); j += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      j = 0
      while (j < dim) { v(j) *= inv; j += 1 }
    }
    v
  }

  /** Z-order (Morton) value: interleave the low 32 bits of `a` (even
    * bit positions) and `b` (odd positions) into one long whose sort
    * order clusters 2-D neighborhoods — range-partitioning on it keeps
    * BOTH dimensions' per-file min/max tight, where lexicographic
    * (a, b) ordering only bounds the leading column. Bit spreading by
    * binary magic numbers (the public-domain Stanford Bit Twiddling
    * Hacks recipe).
    */
  def zvalue(a: Long, b: Long): Long = spread32(a) | (spread32(b) << 1)

  /** Generic Morton interleave for 3+ dimensions: bit b of dimension
    * i lands at position b·d + i, so the top interleaved bits cycle
    * through every dimension's top bits — the equal-weight property
    * z-ordering needs. Each id must fit 63/d bits (the compact path
    * scales its range ids to exactly that); d=2 stays on the
    * magic-constant [[zvalue]] fast path.
    */
  def zvalueN(ids: Array[Long]): Long = {
    val d = ids.length
    val bitsPer = 63 / d
    var out = 0L
    var b = 0
    while (b < bitsPer) {
      var i = 0
      while (i < d) {
        out |= ((ids(i) >>> b) & 1L) << (b * d + i)
        i += 1
      }
      b += 1
    }
    out
  }

  private def spread32(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Probe a [[BloomAgg]]-serialized Bloom filter (layout:
    * [int32 numHashes][int64 words...], big-endian) for a 64-bit item
    * hash. Bit positions use the same two-hash construction as minhash
    * (g_i = h1 + i*h2, Kirsch-Mitzenmaier '06) so set and probe sides
    * agree by sharing this file's kernels. Allocation-free — reads the
    * filter words straight out of the byte array — so the expression
    * stays cheap inside whole-stage codegen.
    */
  def bloomContains(bloom: Array[Byte], h: Long): Boolean = {
    // SQL-reachable: a truncated/corrupt blob must fail with a clear
    // argument error, not an index/zero-division crash inside codegen
    require(bloom.length > 4,
      s"bloom filter blob too short (${bloom.length} bytes; needs 4-byte header + bits)")
    val k = ((bloom(0) & 0xff) << 24) | ((bloom(1) & 0xff) << 16) |
      ((bloom(2) & 0xff) << 8) | (bloom(3) & 0xff)
    val numBits = (bloom.length - 4).toLong * 8L
    val h1 = h
    val h2 = mix64(h)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
      val byteIdx = 4 + (bit >>> 3).toInt
      val mask = 1 << (bit & 7L).toInt
      if ((bloom(byteIdx) & mask) == 0) return false
      i += 1
    }
    true
  }

  /** canonical_url kernel: normalize an http(s) URL to its dedup
    * identity — the FIRST pass of every crawl pipeline (URL-level
    * dedup before any content hashing touches bytes):
    *   - scheme + host lowercase; leading `www.` stripped
    *   - default ports stripped (`:80` for http, `:443` for https)
    *   - fragment dropped
    *   - tracking params dropped (`utm_*`, `fbclid`, `gclid`, `msclkid`),
    *     remaining params SORTED (param order is not identity)
    *   - trailing path slash normalized away (root stays bare)
    * Scheme is preserved (http vs https are different resources until
    * a fetch proves otherwise). Non-http(s) strings pass through
    * trimmed — canonicalization is defined for web URLs only, and
    * guessing at mailto:/ftp: would corrupt, not normalize.
    */
  def canonicalUrl(u: UTF8String): UTF8String = {
    val raw = u.toString.trim
    val lower = raw.toLowerCase(java.util.Locale.ROOT)
    val scheme =
      if (lower.startsWith("https://")) "https"
      else if (lower.startsWith("http://")) "http"
      else return UTF8String.fromString(raw)
    val rest0 = raw.substring(scheme.length + 3)
    // fragment first: everything after '#' is client-side
    val rest = rest0.indexOf('#') match {
      case -1 => rest0
      case i  => rest0.substring(0, i)
    }
    val pathStart = {
      val slash = rest.indexOf('/')
      val q = rest.indexOf('?')
      if (slash == -1 && q == -1) rest.length
      else if (slash == -1) q
      else if (q == -1) slash
      else math.min(slash, q)
    }
    var host = rest.substring(0, pathStart).toLowerCase(java.util.Locale.ROOT)
    if (host.startsWith("www.")) host = host.substring(4)
    val defPort = if (scheme == "https") ":443" else ":80"
    if (host.endsWith(defPort)) host = host.dropRight(defPort.length)
    val tail = rest.substring(pathStart)
    val (path0, query0) = tail.indexOf('?') match {
      case -1 => (tail, "")
      case i  => (tail.substring(0, i), tail.substring(i + 1))
    }
    var path = path0
    while (path.endsWith("/")) path = path.dropRight(1)
    val kept = query0.split("&").iterator.filter(_.nonEmpty).filterNot { p =>
      val k = p.indexOf('=') match { case -1 => p; case i => p.substring(0, i) }
      val kl = k.toLowerCase(java.util.Locale.ROOT)
      kl.startsWith("utm_") || kl == "fbclid" || kl == "gclid" || kl == "msclkid"
    }.toArray.sorted
    val q = if (kept.isEmpty) "" else kept.mkString("?", "&", "")
    UTF8String.fromString(s"$scheme://$host$path$q")
  }
}
