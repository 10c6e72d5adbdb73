package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{Intersection, SetOperation, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** DataSketches aggregates beyond Spark's built-in HLL family — the
  * two sketch classes a 100 TB analytics layer still needs:
  *
  *   - KLL quantile sketches (`kll_sketch_agg` / `kll_merge_agg` /
  *     `kll_value`): RE-AGGREGATABLE percentiles. approx_percentile's
  *     GK summary answers one query and is gone; a STORED KLL sketch
  *     per (group, day) answers any later quantile question over any
  *     date window by merging KB-sized summaries — the quantile twin
  *     of the stored-HLL distinct rollup (`q_hll_sketch`).
  *   - Theta sketches (`theta_sketch_agg` / `theta_union_agg` /
  *     `theta_intersect_agg` / `theta_estimate`): distinct-count
  *     sketches CLOSED UNDER SET ALGEBRA. HLL unions only; Theta
  *     intersects — "distinct users in BOTH periods" (audience
  *     overlap, retention) without ever shuffling raw ids twice.
  *
  * All are TypedImperativeAggregates (Spark's own datasketches-HLL
  * shape): the buffer IS the sketch object, serialized only at
  * shuffle boundaries, partials combine map-side — one distributed
  * aggregation whatever the cardinality.
  */
object DsImpl {
  // Spark evaluates scalar sketch readers inside codegen; keep them as
  // single static calls like the HashImpl kernels. An EMPTY sketch has
  // no quantiles — surface SQL NULL (boxed return), not the library's
  // exception: "p95 of a group that logged nothing" is a null, not a
  // query failure.
  def kllQuantile(bytes: Array[Byte], p: Double): java.lang.Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(sk.getQuantile(p,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE))
  }


  def thetaEstimate(bytes: Array[Byte]): Double =
    Sketches.wrapCompactSketch(Memory.wrap(bytes)).getEstimate

  /** Compact EMPTY theta sketch bytes (estimate 0) — the coalesce
    * identity for side-by-side set algebra: a group with rows in only
    * one half has a NULL sketch for the other, and theta_anotb would
    * null-propagate where the math wants "minus the empty set" /
    * "the empty set minus". Matches ThetaIntersectAgg's convention
    * that an absent input is the empty set, not the universal one.
    */
  val emptyThetaBytes: Array[Byte] =
    org.apache.datasketches.theta.UpdateSketch.builder().build()
      .compact(true, null).toByteArray

  def thetaANotB(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val op = SetOperation.builder().buildANotB()
    op.setA(Sketches.wrapCompactSketch(Memory.wrap(a)))
    op.notB(Sketches.wrapCompactSketch(Memory.wrap(b)))
    op.getResult(true).toByteArray
  }

  def kllRank(bytes: Array[Byte], value: Double): java.lang.Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(sk.getRank(value,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE))
  }
}

/** kll_sketch_agg(value[, k]) → binary: a KLL doubles sketch of the
  * group's values. k (default 200) trades size for rank accuracy
  * (~1.65% normalized rank error at 200, 99% confidence).
  */
case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
  require(k >= 8 && k <= 65535, s"kll k must be in [8, 65535], got $k")
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))
  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
  override def prettyName: String = "kll_sketch_agg"
}

/** kll_merge_agg(sketch) → binary: union previously built KLL
  * sketches WITHOUT touching raw values — the re-aggregation step
  * (store per-day sketches once, answer any window later).
  */
case class KllMergeAgg(child: Expression, k: Int = 200,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
  require(k >= 8 && k <= 65535, s"kll k must be in [8, 65535], got $k")
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  // merged accuracy is governed by the MINIMUM k involved — the
  // buffer's k must match-or-exceed the stored sketches' k or the
  // roll-up silently degrades them (pass the build-time k here)
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }
  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))
  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
  override def prettyName: String = "kll_merge_agg"
}

/** kll_value(sketch, p) → double: the p-quantile a KLL sketch holds
  * (INCLUSIVE search — the convention `percentile` families share).
  */
case class KllValue(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // empty sketch → null
  override def nullSafeEval(b: Any, p: Any): Any =
    DsImpl.kllQuantile(b.asInstanceOf[Array[Byte]], p.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, p) => {
      val boxed = ctx.freshName("kllQ")
      // ONE heapify per row: the boxed result carries both the null
      // test and the value (a primitive-returning split would
      // deserialize the sketch twice)
      s"""java.lang.Double $boxed = graft.functions.DsImpl.kllQuantile($b, $p);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllValue = copy(newLeft, newRight)
  override def prettyName: String = "kll_value"
}

/** theta_sketch_agg(item) → binary: a Theta sketch of the group's
  * 64-bit items. lgK fixes nominal entries (default 2^12 = 4096):
  * EXACT below that many distincts, ~1/√(2^lgK) relative error above.
  * The buffer is a theta Union — it accepts raw item updates AND
  * partial-sketch merges through one object.
  */
case class ThetaSketchAgg(child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {
  require(lgK >= 4 && lgK <= 26, s"theta lgK must be in [4, 26], got $lgK")
  // integral OR string items, checked EXPLICITLY — an implicit
  // string→long cast would turn a uuid column into all-null and
  // report 0 distincts with no error
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"theta_sketch_agg needs an integral or string item, got ${other.simpleString}")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
  private lazy val isString = child.dataType == StringType
  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) {
      if (isString) buf.update(v.toString)
      else buf.update(v.asInstanceOf[Number].longValue())
    }
    buf
  }
  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(b: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(b)))
    u
  }
  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
  override def prettyName: String = "theta_sketch_agg"
}

/** theta_union_agg(sketch) → binary: OR-combine stored sketches. */
case class ThetaUnionAgg(child: Expression, lgK: Int = 12,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
  require(lgK >= 4 && lgK <= 26, s"theta lgK must be in [4, 26], got $lgK")
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  // the union GADGET downsamples to its own nominal entries — it must
  // match-or-exceed the stored sketches' lgK or re-aggregation
  // silently degrades their precision (pass the build-time lgK here)
  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Sketches.wrapCompactSketch(
      Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }
  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(b: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(b)))
    u
  }
  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
  override def prettyName: String = "theta_union_agg"
}

/** theta_intersect_agg(sketch) → binary: AND-combine stored sketches —
  * the operation HLL structurally cannot do. Zero input rows yield an
  * EMPTY sketch (estimate 0): the intersection of nothing is defined
  * as empty here rather than the mathematician's universal set,
  * because "no cohort matched" must read as zero overlap, not
  * everything. State is (Intersection, seeded) — DataSketches'
  * Intersection is virgin until its first intersect and would throw.
  */
case class ThetaIntersectAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaIntersectAgg.Buf]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): ThetaIntersectAgg.Buf =
    ThetaIntersectAgg.Buf(SetOperation.builder().buildIntersection(), seeded = false)
  override def update(buf: ThetaIntersectAgg.Buf, input: InternalRow): ThetaIntersectAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.it.intersect(Sketches.wrapCompactSketch(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf.seeded = true
    }
    buf
  }
  override def merge(buf: ThetaIntersectAgg.Buf, other: ThetaIntersectAgg.Buf): ThetaIntersectAgg.Buf =
    // an unseeded partial is the identity (no constraints yet), not an
    // empty set — merging it must not zero the other side
    if (!other.seeded) buf
    else if (!buf.seeded) other
    else { buf.it.intersect(other.it.getResult); buf }
  override def eval(buf: ThetaIntersectAgg.Buf): Any =
    (if (buf.seeded) buf.it.getResult
     else org.apache.datasketches.theta.UpdateSketch.builder().build().compact())
      .toByteArray
  override def serialize(buf: ThetaIntersectAgg.Buf): Array[Byte] =
    if (!buf.seeded) Array.emptyByteArray
    else buf.it.getResult.toByteArray
  override def deserialize(b: Array[Byte]): ThetaIntersectAgg.Buf =
    if (b.isEmpty) createAggregationBuffer()
    else {
      val buf = createAggregationBuffer()
      buf.it.intersect(Sketches.wrapCompactSketch(Memory.wrap(b)))
      buf.seeded = true
      buf
    }
  override def withNewMutableAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaIntersectAgg =
    copy(child = c)
  override def prettyName: String = "theta_intersect_agg"
}

object ThetaIntersectAgg {
  final case class Buf(it: Intersection, var seeded: Boolean)
}

/** theta_anotb(a, b) → binary: the set DIFFERENCE sketch a \ b —
  * with intersection, the full set algebra: "users active in period
  * A but gone in period B" (churn) straight from stored sketches.
  */
case class ThetaANotB(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any =
    DsImpl.thetaANotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DsImpl.thetaANotB($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaANotB = copy(newLeft, newRight)
  override def prettyName: String = "theta_anotb"
}

/** kll_rank(sketch, value) → double: the normalized rank of `value`
  * (the inverse of kll_value — "what fraction of the distribution
  * sits at or below this SLO threshold"); null on an empty sketch.
  */
case class KllRank(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // empty sketch → null
  override def nullSafeEval(b: Any, v: Any): Any =
    DsImpl.kllRank(b.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, v) => {
      val boxed = ctx.freshName("kllR")
      s"""java.lang.Double $boxed = graft.functions.DsImpl.kllRank($b, $v);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRank = copy(newLeft, newRight)
  override def prettyName: String = "kll_rank"
}

/** theta_estimate(sketch) → double: the sketch's distinct estimate. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(b: Any): Any =
    DsImpl.thetaEstimate(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.DsImpl.thetaEstimate($b)")
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(newChild)
  override def prettyName: String = "theta_estimate"
}
