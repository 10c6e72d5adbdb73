package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding, split the way a 100 TB tokenizer train
  * actually splits: the CLUSTER computes the word-frequency
  * dictionary (one explode + hash agg over the corpus — the only
  * corpus-scale pass), and the driver learns merges on that bounded
  * dictionary — the standard BPE trainer (Sennrich '16) operates on
  * word frequencies, never on raw text, so "train BPE on 100 TB" is
  * exactly "aggregate word counts, then iterate on ~10^4 entries".
  * Scoring goes back to the cluster as a codegen'd expression with
  * the merge table embedded in the plan (`addReferenceObj` — riding
  * plan serialization to executors, no lookup service needed).
  *
  * Determinism everywhere: dictionary truncation orders by
  * (freq desc, word), merge selection by (count desc, pair), so two
  * trains of the same corpus produce identical vocabularies.
  */
object Bpe {

  /** A word's base symbols: Unicode CODEPOINTS, not UTF-16 code units
    * — a supplementary-plane character (emoji, rare CJK) is one
    * symbol, never an unpaired surrogate pair. This is also what the
    * oracle's character-indexed replay (`word[i]` in DuckDB) splits
    * to, so the two engines segment identically beyond the BMP.
    */
  private[functions] def codepoints(w: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** `alphabet` is the sorted base-character inventory of the training
    * dictionary; together with the merges it defines the VOCABULARY:
    * ids 0..A-1 are the alphabet in order, each merge's concatenated
    * symbol takes the next id on first appearance (two merge paths can
    * produce the same string — the first keeps the id, exactly one id
    * per distinct symbol). The id past the last is reserved for
    * symbols outside the vocabulary (characters never seen in
    * training), so `unkId == vocabSize` and every emitted id is
    * `<= vocabSize`.
    */
  final case class Model(merges: IndexedSeq[(String, String)],
      alphabet: IndexedSeq[String]) extends Serializable {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    @transient lazy val vocab: Map[String, Int] = {
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      alphabet.foreach(s => if (!m.contains(s)) m.update(s, m.size))
      merges.foreach { case (a, b) =>
        val s = a + b
        if (!m.contains(s)) m.update(s, m.size)
      }
      m.toMap
    }
    def vocabSize: Int = vocab.size
    def unkId: Int = vocabSize
    // id → symbol, the decode direction. U+FFFD for the unk id (and
    // anything out of range): decode is total, and the replacement
    // char makes a broken round-trip VISIBLE instead of silently
    // dropping ids.
    @transient private lazy val invVocab: Array[String] = {
      val arr = new Array[String](vocabSize)
      vocab.foreach { case (sym, i) => arr(i) = sym }
      arr
    }
    def decodeIds(ids: Array[Int]): String = {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < ids.length) {
        val id = ids(i)
        sb.append(if (id >= 0 && id < vocabSize) invVocab(id) else "\ufffd")
        i += 1
      }
      sb.toString
    }
    // per-word encode caches: corpora repeat words massively and eval
    // is per-row; bounded by wipe-on-overflow (executor-local, a pure
    // memo — losing it costs recompute only)
    @transient private lazy val memo = new ConcurrentHashMap[String, java.lang.Integer]()
    @transient private lazy val memoIds = new ConcurrentHashMap[String, Array[Int]]()

    /** Greedy lowest-rank merge loop — the standard BPE apply. */
    private def mergeWord(word: String): scala.collection.mutable.Buffer[String] = {
      var symbols = Bpe.codepoints(word).toBuffer
      var done = false
      while (!done && symbols.length > 1) {
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var i = 0
        while (i < symbols.length - 1) {
          val r = ranks.getOrElse((symbols(i), symbols(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestIdx = i }
          i += 1
        }
        if (bestIdx < 0) done = true
        else {
          symbols(bestIdx) = symbols(bestIdx) + symbols(bestIdx + 1)
          symbols.remove(bestIdx + 1)
          ()
        }
      }
      symbols
    }

    private def encodeWord(word: String): Int = mergeWord(word).length

    private def encodeWordIds(word: String): Array[Int] =
      mergeWord(word).map(s => vocab.getOrElse(s, unkId)).toArray

    /** BPE token count of a whitespace-tokenized text. */
    def countTokens(text: String): Int = {
      var total = 0
      HashImpl.foreachToken(text) { w =>
        // get-first keeps the hot (hit) path lock- and size()-free;
        // the bound check runs only on misses and OUTSIDE the map's
        // mapping function (CHM forbids mutating the map from inside
        // computeIfAbsent — a clear() there can deadlock two bins)
        val cached = memo.get(w)
        total += (if (cached != null) cached.intValue()
          else {
            if (memo.size > 65536) memo.clear()
            val v = encodeWord(w)
            memo.put(w, Int.box(v))
            v
          })
      }
      total
    }

    /** Token IDS of a whitespace-tokenized text, words concatenated in
      * order — the form a training batch actually consumes. Same
      * wipe-on-overflow memo discipline as `countTokens`.
      */
    def encodeIds(text: String): Array[Int] = {
      val out = new scala.collection.mutable.ArrayBuffer[Int]()
      HashImpl.foreachToken(text) { w =>
        val cached = memoIds.get(w)
        val ids = if (cached != null) cached
          else {
            if (memoIds.size > 65536) memoIds.clear()
            val v = encodeWordIds(w)
            memoIds.put(w, v)
            v
          }
        out ++= ids
      }
      out.toArray
    }
  }

  /** Learn `numMerges` merges from a (word, freq) dictionary —
    * driver-side by design (the dictionary is bounded; see object
    * doc). Stops early when no pair occurs twice.
    */
  def train(dict: Seq[(String, Long)], numMerges: Int): Model = {
    // Base-character inventory, sorted — with the deterministic merge
    // order below this makes the whole VOCABULARY (symbol → id)
    // reproducible across trains of the same dictionary.
    val alphabet = dict.iterator.flatMap(w => codepoints(w._1)).toSeq
      .distinct.sorted.toIndexedSeq
    val words = dict.map { case (w, f) => (codepoints(w).toBuffer, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (pair, cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < 2) exhausted = true
        else {
          merges += pair
          words.foreach { case (syms, _) =>
            var i = 0
            while (i < syms.length - 1) {
              if (syms(i) == pair._1 && syms(i + 1) == pair._2) {
                syms(i) = syms(i) + syms(i + 1)
                syms.remove(i + 1)
                ()
              } else i += 1
            }
          }
        }
      }
      iter += 1
    }
    Model(merges.toIndexedSeq, alphabet)
  }

  /** The corpus-scale half: word-frequency dictionary via one hash
    * agg, truncated deterministically to `dictSize` (TakeOrdered — a
    * per-partition top-k, not a global sort), then driver merges.
    */
  def trainOn(docs: DataFrame, numMerges: Int = 256, dictSize: Int = 8192): Model = {
    val dict = docs
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(dictSize)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    train(dict, numMerges)
  }

  // ---- SQL surface: models register under an id; the function
  // builder resolves the id at ANALYSIS time (driver) and embeds the
  // model object into the expression, so executors get it with the
  // serialized plan, not from this registry ----
  private val registry = new ConcurrentHashMap[String, Model]()

  def register(id: String, m: Model): Unit = { registry.put(id, m); () }

  def unregister(id: String): Unit = { registry.remove(id); () }

  private[functions] def resolve(id: String): Model = {
    val m = registry.get(id)
    require(m != null, s"no BPE model registered under '$id'")
    m
  }

  def tokenCount(modelId: String, text: Column): Column =
    call_function("bpe_count", text, lit(modelId))

  def encode(modelId: String, text: Column): Column =
    call_function("bpe_encode", text, lit(modelId))
  def decode(modelId: String, ids: Column): Column =
    call_function("bpe_decode", ids, org.apache.spark.sql.functions.lit(modelId))
}

/** Static eval target for both interpreted eval and generated Java —
  * same pattern as [[HashImpl]].
  */
object BpeImpl {
  def count(m: Bpe.Model, text: org.apache.spark.unsafe.types.UTF8String): Int =
    m.countTokens(text.toString)

  def encode(m: Bpe.Model, text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      m.encodeIds(text.toString))

  def decode(m: Bpe.Model, ids: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      m.decodeIds(ids.toIntArray()))
}
