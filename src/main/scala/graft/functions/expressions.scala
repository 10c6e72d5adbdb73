package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the graft hot paths. Each one
  * generates a single static call into VecImpl/HashImpl, so the whole
  * pipeline (scan → filter → these → agg) stays inside one
  * WholeStageCodegen span — no UDF serialization, no Row boxing.
  *
  * All declare `inputTypes` (ImplicitCastInputTypes): SQL callers get
  * int→long widening where safe, and a clean ANALYSIS error for
  * array<double> into a float-vector slot — without the declaration,
  * `getFloat` over a double ArrayData silently reads garbage.
  */

/** dot_f(a, b): dot product of two float vectors → double. */
case class DotF(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecImpl.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF = copy(newLeft, newRight)
  override def prettyName: String = "dot_f"
}

/** norm_f(a): L2 norm of a float vector → double. */
case class NormF(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any = VecImpl.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecImpl.norm($a)")
  override protected def withNewChildInternal(newChild: Expression): NormF =
    copy(newChild)
  override def prettyName: String = "norm_f"
}

/** cosine_sim(a, b): cosine similarity of two float vectors → double. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecImpl.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim = copy(newLeft, newRight)
  override def prettyName: String = "cosine_sim"
}

/** minhash_sig(text, numHashes, shingleSize) → array<bigint>. */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes =
    Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any, n: Any, k: Any): Any =
    HashImpl.minhash(t.asInstanceOf[UTF8String], n.asInstanceOf[Int], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n, k) => s"graft.functions.HashImpl.minhash($t, $n, $k)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MinHashSig = copy(f, s, t)
  override def prettyName: String = "minhash_sig"
}

/** simhash64(text, shingleSize) → bigint. */
case class SimHash64(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any, k: Any): Any =
    HashImpl.simhash64(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.functions.HashImpl.simhash64($t, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHash64 = copy(newLeft, newRight)
  override def prettyName: String = "simhash64"
}

/** rolling_fp(text) → bigint: order-sensitive document fingerprint. */
case class RollingFp(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any): Any =
    HashImpl.rollingFingerprint(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.HashImpl.rollingFingerprint($t)")
  override protected def withNewChildInternal(newChild: Expression): RollingFp =
    copy(newChild)
  override def prettyName: String = "rolling_fp"
}

/** canonical_url(url) → string: the URL's dedup identity (lowercased
  * scheme/host, www/default-port/fragment/tracking-params stripped,
  * remaining params sorted, trailing slash normalized) — the first
  * pass of a crawl pipeline, codegen'd so URL-level dedup of billions
  * of rows stays inside whole-stage codegen. Non-http(s) strings pass
  * through trimmed.
  */
case class CanonicalUrl(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any): Any =
    HashImpl.canonicalUrl(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.HashImpl.canonicalUrl($t)")
  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(newChild)
  override def prettyName: String = "canonical_url"
}

/** token_count(text) → int: whitespace-run token count. */
case class TokenCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(t: Any): Any =
    HashImpl.tokenCount(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.HashImpl.tokenCount($t)")
  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(newChild)
  override def prettyName: String = "token_count"
}

/** word_shingles(text, k) → array<bigint>: distinct hashes of word
  * k-shingles in one tight-loop pass (HashImpl.shingleHashes) — the
  * codegen'd replacement for a transform(sequence)+concat_ws+hash
  * expression pipeline, which builds per-shingle strings through
  * Catalyst array machinery.
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any, k: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HashImpl.shingleHashes(t.asInstanceOf[UTF8String].toString, k.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashImpl.shingleHashes($t.toString(), $k))")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles = copy(newLeft, newRight)
  override def prettyName: String = "word_shingles"
}

/** hamming64(a, b) → int: Hamming distance of two 64-bit hashes. */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming64 = copy(newLeft, newRight)
  override def prettyName: String = "hamming64"
}

/** zvalue(a, b) → long: Z-order (Morton) interleave of two 32-bit
  * normalized coordinates — the clustering key behind multi-column
  * compaction (sort by it and every dimension's per-file min/max stays
  * tight, so file-stat pruning works on BOTH columns).
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.zvalue(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpl.zvalue($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue = copy(newLeft, newRight)
  override def prettyName: String = "zvalue"
}

/** zvalue_n(id1, …, idN) → bigint: generic N-dimension Morton
  * interleave for 3+ cluster columns (2 stays on [[ZValue]]'s
  * magic-constant fast path). Each id must fit 63/N bits — the
  * compaction path scales its equal-frequency range ids to exactly
  * that. Codegen'd: ids land in a stack array, one static kernel
  * call, any null input → null (the same semantics the binary form
  * inherits from nullSafeEval).
  */
case class ZValueN(children: Seq[Expression])
    extends Expression with ImplicitCastInputTypes {
  require(children.length >= 2 && children.length <= 8,
    s"zvalue_n takes 2-8 dimensions, got ${children.length} — beyond 8 " +
      "each dimension keeps under 8 interleaved bits and the key stops " +
      "clustering anything")
  override def inputTypes: Seq[DataType] =
    Seq.fill(children.length)(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ids = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      ids(i) = v.asInstanceOf[Long]
      i += 1
    }
    HashImpl.zvalueN(ids)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zids")
    val anyNull = ctx.freshName("zAnyNull")
    val fill = evals.zipWithIndex.map { case (e, i) =>
      code"""${e.code}
            |if (${e.isNull}) { $anyNull = true; } else { $arr[$i] = ${e.value}; }
            |""".stripMargin
    }.reduce(_ + _)
    ev.copy(code =
      code"""boolean $anyNull = false;
            |long[] $arr = new long[${children.length}];
            |$fill
            |boolean ${ev.isNull} = $anyNull;
            |long ${ev.value} = $anyNull ? 0L : graft.functions.HashImpl.zvalueN($arr);
            |""".stripMargin)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValueN = copy(newChildren)
  override def prettyName: String = "zvalue_n"
}

/** bloom_contains(bloom, h) → boolean: probe a [[BloomAgg]]-built
  * Bloom filter (binary, broadcast as a literal — KBs standing in for
  * a set too large to ship raw) for 64-bit item hash `h`. No false
  * negatives, so `filter(bloom_contains(...))` is a sound pre-filter
  * ahead of exact verification; runs allocation-free inside
  * whole-stage codegen.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.bloomContains(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpl.bloomContains($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains = copy(newLeft, newRight)
  override def prettyName: String = "bloom_contains"
}

/** bpe_count(text, 'model-id') → int: BPE token count under a trained
  * [[Bpe.Model]]. The function BUILDER (driver, analysis time)
  * resolves the id from the model registry and this expression then
  * carries the model OBJECT — `addReferenceObj` embeds it in the
  * generated code's reference array, so executors receive it with the
  * serialized plan and codegen stays one static call. Token counts
  * under the real tokenizer are what packing/budgeting at 100 TB
  * actually needs (whitespace counts mis-size multilingual packs).
  */
case class BpeTokenCount(child: Expression, model: Bpe.Model)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(t: Any): Any =
    BpeImpl.count(model, t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[Bpe.Model].getName)
    defineCodeGen(ctx, ev, t => s"graft.functions.BpeImpl.count($ref, $t)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(newChild)
  override def prettyName: String = "bpe_count"
}

/** bpe_encode(text, 'model-id') → array<int>: the text's BPE token
  * IDS, words concatenated in order — what a packed training batch
  * actually holds. Same model-in-plan embedding as [[BpeTokenCount]];
  * `size(bpe_encode(...)) == bpe_count(...)` by construction.
  */
case class BpeEncode(child: Expression, model: Bpe.Model)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    BpeImpl.encode(model, t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[Bpe.Model].getName)
    defineCodeGen(ctx, ev, t => s"graft.functions.BpeImpl.encode($ref, $t)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(newChild)
  override def prettyName: String = "bpe_encode"
}

/** bpe_decode(ids, 'model') → string: the decode direction — token
  * ids back to their symbol concatenation (U+FFFD for the unk id, so
  * a broken round-trip is visible, never silent). Since the encoder
  * whitespace-tokenizes, decode(encode(text)) equals text with
  * whitespace REMOVED — the round-trip invariant q_bpe_roundtrip
  * gates. Same analysis-time model resolution as bpe_encode.
  */
case class BpeDecode(child: Expression, model: Bpe.Model)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(IntegerType))
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any): Any =
    BpeImpl.decode(model, t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[Bpe.Model].getName)
    defineCodeGen(ctx, ev, t => s"graft.functions.BpeImpl.decode($ref, $t)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeDecode =
    copy(newChild)
  override def prettyName: String = "bpe_decode"
}

/** hash_embed(text, dim) → array<float>: feature-hashed unit vector
  * of a document (signed hashing trick) — the trained-state-free
  * bridge from raw text into every embedding consumer (cosine
  * near-dup, ANN, SemDeDup) when no model embeddings exist. One
  * codegen'd pass per row; `dim` must be a positive literal-ish int.
  */
case class HashEmbed(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(t: Any, d: Any): Any =
    // dim validation lives in HashImpl so the codegen path (a direct
    // static call) raises the same error as this interpreted path
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HashImpl.hashEmbed(t.asInstanceOf[UTF8String], d.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, d) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashImpl.hashEmbed($t, $d))")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashEmbed = copy(newLeft, newRight)
  override def prettyName: String = "hash_embed"
}
