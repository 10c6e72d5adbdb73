package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** File-level data skipping over a [[VersionedTable]]'s per-file
  * `[min, max, hasNulls]` stats — the scan-side counterpart of the
  * write-side MERGE/DELETE pruning (Delta calls the same idea data
  * skipping; Armbrust '20 §4.2). A predicate's simple conjuncts are
  * compiled to per-column constraints, and a file is opened only when
  * its stats can't refute every constraint.
  *
  * Everything here is BEST-EFFORT AND SOUND-ONLY: a conjunct shape the
  * extractor doesn't recognize, a column without stats, or a literal
  * whose type doesn't live in the committed column's domain (the
  * `delete()` key-type lesson — comparing a string literal against
  * numeric stats in byte order prunes files the engine's implicit cast
  * would match) simply prunes nothing. The caller always applies the
  * FULL predicate to the scanned rows, so skipping can only remove
  * provably-dead IO, never change the result.
  */
private[graft] object DataSkipping {

  /** One per-column pruning constraint. `Range` bounds the matching
    * values (either side optional, each with an inclusivity flag);
    * `RequiresNull` marks an IS NULL conjunct, refutable by a stats
    * entry whose hasNulls flag proves the file null-free.
    */
  sealed trait Constraint
  final case class Range(column: String,
      lo: Option[(Literal, Boolean)], hi: Option[(Literal, Boolean)]) extends Constraint
  final case class RequiresNull(column: String) extends Constraint
  /** `col IN (v1, …, vn)` — the file may match iff ANY point lies in
    * its [min,max] (and, when a Bloom sidecar exists, survives the
    * any-of probe). Null literals are dropped at extraction (equality
    * never matches null), so an all-null list refutes every file.
    */
  final case class AnyOf(column: String, values: Seq[Literal]) extends Constraint
  /** A disjunction: the file may match iff SOME branch's constraint
    * set can't be refuted. Only built when EVERY branch extracted at
    * least one constraint — a branch the extractor can't bound makes
    * the whole OR unbounded (sound-only). Branches may nest further
    * OrOfs (`(a AND (b OR c)) OR d`).
    */
  final case class OrOf(branches: Seq[Seq[Constraint]]) extends Constraint

  /** IN-lists above this size are ignored for skipping — per-file
    * evaluation is O(values), and a list this wide rarely prunes a
    * clustered file anyway. Matches the delete path's probe cap.
    */
  private val MaxInValues = VersionedTable.MaxBloomProbeKeys

  /** `<attr> vs <literal>` in either order, or nothing. */
  private def sides(l: Expression, r: Expression): Option[(String, Literal)] =
    (name(l), r) match {
      case (Some(c), lit: Literal) => Some((c, lit))
      case _ => None
    }

  private def name(e: Expression): Option[String] = e match {
    case u: UnresolvedAttribute => Some(u.nameParts.mkString("."))
    case a: AttributeReference  => Some(a.name)
    case _                      => None
  }

  /** One comparison conjunct → constraints. `<`/`<=` normalize to the
    * mirrored `>`/`>=` (a < b ≡ b > a), so each operator is written
    * once; `sides` in both orders covers literal-on-the-left forms.
    */
  private def cmp(op: String, l: Expression, r: Expression): Seq[Constraint] = op match {
    case "=" =>
      (sides(l, r) orElse sides(r, l)).map { case (c, v) =>
        Range(c, Some((v, true)), Some((v, true))) }.toSeq
    case ">" =>
      sides(l, r).map { case (c, v) => Range(c, Some((v, false)), None) }.toSeq ++
        sides(r, l).map { case (c, v) => Range(c, None, Some((v, false))) }.toSeq
    case ">=" =>
      sides(l, r).map { case (c, v) => Range(c, Some((v, true)), None) }.toSeq ++
        sides(r, l).map { case (c, v) => Range(c, None, Some((v, true))) }.toSeq
    case "<"  => cmp(">", r, l)
    case "<=" => cmp(">=", r, l)
    case _    => Seq.empty
  }

  /** Prunable conjuncts of an (unresolved) predicate expression:
    * `=`, `<`, `<=`, `>`, `>=` between a column and a literal (either
    * side), BETWEEN (it desugars to an AND pair), and IS NULL. OR
    * branches, functions over the column, and every other shape are
    * ignored — not rejected — per the sound-only contract. Two
    * encodings arrive here: typed nodes (a SQL-parsed predicate) and
    * the Column DSL's by-name `UnresolvedFunction`s ("and", "=", ">",
    * …, "isNull") that only resolve to the typed nodes during
    * analysis.
    */
  /** OR of two conjunct sets — or nothing when either side extracted
    * nothing (an unbounded branch admits every file anyway).
    */
  private def orOf(l: Seq[Constraint], r: Seq[Constraint]): Seq[Constraint] =
    if (l.isEmpty || r.isEmpty) Seq.empty else Seq(OrOf(Seq(l, r)))

  def constraints(e: Expression): Seq[Constraint] = e match {
    case And(l, r)                => constraints(l) ++ constraints(r)
    case Or(l, r)                 => orOf(constraints(l), constraints(r))
    case EqualTo(l, r)            => cmp("=", l, r)
    case GreaterThan(l, r)        => cmp(">", l, r)
    case GreaterThanOrEqual(l, r) => cmp(">=", l, r)
    case LessThan(l, r)           => cmp("<", l, r)
    case LessThanOrEqual(l, r)    => cmp("<=", l, r)
    case IsNull(a)                => name(a).map(RequiresNull).toSeq
    // col IN (literal, …): both the Column DSL's `isin` and SQL's IN
    // build the typed node directly. Non-literal elements make the
    // whole conjunct unextractable (sound-only); null literals drop
    // (x = null is never true under IN's match semantics)
    case In(a, list) if list.nonEmpty && list.sizeIs <= MaxInValues &&
        list.forall(_.isInstanceOf[Literal]) =>
      name(a).map(c =>
        AnyOf(c, list.collect { case l: Literal if l.value != null => l })).toSeq
    case f: UnresolvedFunction if f.nameParts.sizeIs == 1 && !f.isDistinct =>
      (f.nameParts.head, f.arguments) match {
        case ("and", Seq(l, r))                   => constraints(l) ++ constraints(r)
        case ("or", Seq(l, r))                    => orOf(constraints(l), constraints(r))
        case ("=" | "==", Seq(l, r))              => cmp("=", l, r)
        case (op @ (">" | ">=" | "<" | "<="), Seq(l, r)) => cmp(op, l, r)
        case ("isNull" | "isnull", Seq(a))        => name(a).map(RequiresNull).toSeq
        // the SQL parser keeps BETWEEN as a ternary function until
        // analysis (the Column DSL desugars it to an AND pair itself)
        case ("between", Seq(a, lo: Literal, hi: Literal)) =>
          name(a).map(c => Range(c, Some((lo, true)), Some((hi, true)))).toSeq
        // Column.isin before analysis: in(col, v1, …, vn)
        case ("in", a +: list) if list.nonEmpty && list.sizeIs <= MaxInValues &&
            list.forall(_.isInstanceOf[Literal]) =>
          name(a).map(c =>
            AnyOf(c, list.collect { case l: Literal if l.value != null => l })).toSeq
        case _                                    => Seq.empty
      }
    case _ => Seq.empty
  }

  /** Could this file hold a row matching every constraint? `st` is the
    * file's stats node (absent → always true), `schema` the committed
    * table schema (absent → always true: without the column's declared
    * type the literal-domain check below can't run).
    */
  def mayMatch(st: Option[JsonNode], schema: Option[StructType],
      cons: Seq[Constraint]): Boolean =
    cons.forall(check(st, schema, _))

  private def check(st: Option[JsonNode], schema: Option[StructType],
      con: Constraint): Boolean =
    con match {
      case OrOf(branches) =>
        branches.exists(_.forall(check(st, schema, _)))
      case RequiresNull(c) =>
        st.flatMap(n => Option(n.get(c))) match {
          // only a three-element ARRAY entry with hasNulls=false PROVES
          // the file null-free; missing stats, a pre-flag manifest, or
          // a non-array node (a column named "_rows" colliding with
          // the per-file row-count field) can't
          case Some(a) if a.isArray && a.size() >= 3 => a.get(2).asBoolean
          case _                                     => true
        }
      case Range(c, lo, hi) =>
        val entry = st.flatMap(n => Option(n.get(c))).filter(_.isArray)
        val dt = schema.flatMap(_.fields.find(_.name == c)).map(_.dataType)
        (entry, dt) match {
          case (Some(a), Some(d)) => rangeMayMatch(a, d, lo, hi)
          case _                  => true
        }
      case AnyOf(c, values) =>
        // an IN over an all-null (or empty) literal list matches no row
        // — refute unconditionally, even without stats
        if (values.isEmpty) false
        else {
          val entry = st.flatMap(n => Option(n.get(c))).filter(_.isArray)
          val dt = schema.flatMap(_.fields.find(_.name == c)).map(_.dataType)
          (entry, dt) match {
            case (Some(a), Some(d)) =>
              values.exists(v => rangeMayMatch(a, d, Some((v, true)), Some((v, true))))
            case _ => true
          }
        }
    }

  /** Point-set constraints among `cons`, each as (column, JVM values
    * in the committed column's domain, committed type) — the shape a
    * Bloom-index probe needs. An equality contributes a 1-element set;
    * an IN-list its whole (null-free) set — a file survives the probe
    * iff the sidecar may contain ANY of the set (the `=`/`IN` match
    * semantics). A constraint with any literal outside the column's
    * domain is skipped whole (same sound-only rule as range pruning:
    * probing a partial set could prune a file whose match was the
    * unconverted literal).
    */
  def pointSets(cons: Seq[Constraint], schema: Option[StructType])
      : Seq[(String, Seq[Any], DataType)] = {
    def domain(c: String, lits: Seq[Literal]): Option[(String, Seq[Any], DataType)] =
      schema.flatMap(_.fields.find(_.name == c)).flatMap { f =>
        val vs = lits.map(bound(f.dataType, _))
        if (vs.exists(_.isEmpty)) None
        else Some((c, vs.flatten, f.dataType))
      }
    cons.collect {
      case Range(c, Some((l1, true)), Some((l2, true))) if l1 == l2 =>
        domain(c, Seq(l1))
      case AnyOf(c, values) if values.nonEmpty => domain(c, values)
    }.flatten
  }

  /** The literal's value in the column's stats domain, or None when the
    * types don't share one (→ no pruning on this constraint). NaN never
    * prunes: Spark orders NaN above every double, IEEE below — stats
    * were recorded NaN-free but the bound's semantics would still be
    * ambiguous.
    */
  private def bound(d: DataType, l: Literal): Option[Any] = {
    if (l.value == null) return None
    (d, l.dataType) match {
      case (LongType | IntegerType | ShortType | ByteType,
            LongType | IntegerType | ShortType | ByteType) =>
        Some(l.value.asInstanceOf[Number].longValue())
      case (DoubleType | FloatType,
            LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType) =>
        val v = l.value.asInstanceOf[Number].doubleValue()
        if (v.isNaN) None else Some(v)
      case (StringType, StringType) =>
        l.value match { // catalyst holds UTF8String; be liberal anyway
          case u: UTF8String => Some(u.toString)
          case s: String     => Some(s)
          case _             => None
        }
      case _ => None
    }
  }

  /** Stats-vs-bounds test in the committed column's domain. String
    * stats obey the write-side truncation contract: the stored min may
    * be a PREFIX of the true min (still a sound lower bound) and a
    * null max means +unbounded — both only ever widen the file's
    * apparent range, so pruning stays sound.
    */
  private def rangeMayMatch(a: JsonNode, d: DataType,
      lo: Option[(Literal, Boolean)], hi: Option[(Literal, Boolean)]): Boolean = {

    // matching rows need value >= lo (or > lo): refuted when statMax
    // falls below the bound; value <= hi (or < hi): refuted when
    // statMin rises above it
    def check(cmpMaxVsLo: Any => Int, cmpMinVsHi: Any => Int): Boolean = {
      val loOk = lo.forall { case (l, incl) =>
        bound(d, l).forall(v => if (incl) cmpMaxVsLo(v) >= 0 else cmpMaxVsLo(v) > 0)
      }
      val hiOk = hi.forall { case (l, incl) =>
        bound(d, l).forall(v => if (incl) cmpMinVsHi(v) <= 0 else cmpMinVsHi(v) < 0)
      }
      loOk && hiOk
    }

    d match {
      case LongType | IntegerType | ShortType | ByteType =>
        check(v => java.lang.Long.compare(a.get(1).asLong, v.asInstanceOf[Long]),
              v => java.lang.Long.compare(a.get(0).asLong, v.asInstanceOf[Long]))
      case DoubleType | FloatType =>
        val (sLo, sHi) = (a.get(0).asDouble, a.get(1).asDouble)
        // NaN in older stats breaks the order — never prune on it
        if (sLo.isNaN || sHi.isNaN) true
        else check(v => java.lang.Double.compare(sHi, v.asInstanceOf[Double]),
                   v => java.lang.Double.compare(sLo, v.asInstanceOf[Double]))
      case StringType =>
        // UTF-8 byte order — the order the stats were recorded in
        def cmp(s: String, v: Any): Int = java.util.Arrays.compareUnsigned(
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8))
        check(v => if (a.get(1).isNull) 1 else cmp(a.get(1).asText, v), // null max = +unbounded
              v => cmp(a.get(0).asText, v))
      case _ => true
    }
  }
}
