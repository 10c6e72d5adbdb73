package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance FUZZY JOIN — all pairs (a, b) with
  * `levenshtein(a.s, b.s) <= d`, without the O(|A|·|B|) cross
  * product: q-gram PREFIX FILTERING (Chaudhuri et al., ICDE 2006;
  * Xiao et al.'s Ed-Join refinement, VLDB 2008) blocks candidates
  * down to pairs sharing a RARE gram, then one codegen'd
  * `levenshtein` verifies each survivor.
  *
  * Why it is LOSSLESS (no false negatives): one edit rewrites at most
  * q of a string's distinct q-grams (a distinct gram vanishes only if
  * some occurrence overlaps the edited position), so
  * `ed(a,b) <= d ⟹ |grams(a) ∖ grams(b)| <= q·d` and the set overlap
  * is at least `max(|grams(a)|, |grams(b)|) − q·d`. By the standard
  * prefix-filtering lemma, two gram sets ordered by ONE global total
  * order and overlapping that much must collide within their first
  * `q·d + 1` grams — so joining only each string's `q·d + 1` RAREST
  * grams (global document frequency, ties by gram) finds every true
  * pair. Rarest-first is also the SCALE lever: a boilerplate gram
  * shared by half the corpus sorts to the back of every prefix and
  * never drives the candidate join's fan-out.
  *
  * Strings too short to carry a q-gram (len < q) can't ride the gram
  * join; their partners sit within d of their length, so both sides
  * of any such pair live in the bounded `len < q + d` slice — those
  * slices pair through a constant-key equi-join (broadcast-sized at
  * any corpus scale: sub-q-gram strings are a fixed-alphabet
  * population) and verify through the same levenshtein. The two
  * candidate sets are disjoint by construction (the short path
  * requires one side with no grams; the gram path requires both).
  *
  * Shuffle inventory at 100 TB: grams explode O(len) rows per string,
  * df is one partial-agg'd gram-keyed pass, the prefix pick is a
  * per-string window (bounded partitions), the candidate join is
  * gram-keyed carrying `q·d + 1` rows per string, verification is a
  * projection. Nothing is quadratic except genuinely-colliding
  * candidates — which the verifier must read anyway.
  */
object FuzzyJoin {

  /** All (a_id, b_id, dist) with `levenshtein <= maxDist` between two
    * (id, s) frames. `q` is the gram width (3 suits natural-language
    * strings; raise it for long near-unique strings to sharpen the
    * filter).
    */
  def edJoin(a: DataFrame, b: DataFrame, maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 0 && q >= 1, s"bad edJoin params d=$maxDist q=$q")
    val prefixLen = q * maxDist + 1

    def named(df: DataFrame, side: String): DataFrame =
      df.select(col("id").as(s"${side}_id"), col("s").as(s"${side}_s"),
        length(col("s")).as(s"${side}_len"))

    val aN = named(a, "a")
    val bN = named(b, "b")

    // distinct q-grams per string: one explode, no shuffle until df
    def grams(df: DataFrame, side: String): DataFrame =
      df.filter(col(s"${side}_len") >= q)
        .select(col(s"${side}_id"), col(s"${side}_s"), col(s"${side}_len"),
          explode(array_distinct(transform(
            sequence(lit(1), col(s"${side}_len") - lit(q) + 1),
            i => col(s"${side}_s").substr(i, lit(q))))).as("gram"))

    val aG = grams(aN, "a")
    val bG = grams(bN, "b")

    // ONE global gram order for both sides: document frequency over
    // the union (rarest first, ties by gram) — the lemma needs the
    // same total order on every prefix
    val df = aG.select(col("gram")).union(bG.select(col("gram")))
      .groupBy("gram").agg(count(lit(1)).as("gram_df"))

    def prefix(g: DataFrame, side: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      g.join(df, "gram")
        .withColumn("grank", row_number().over(
          Window.partitionBy(s"${side}_id")
            .orderBy(col("gram_df"), col("gram"))))
        .filter(col("grank") <= prefixLen)
        .select(col("gram"), col(s"${side}_id"), col(s"${side}_s"),
          col(s"${side}_len"))
    }

    // candidates: prefixes collide on a gram within the length window;
    // strings ride along (<= prefixLen copies each) so verification
    // needs no id-rejoin — flip to a rejoin if rows are document-sized
    val gramCands = prefix(aG, "a").join(prefix(bG, "b"), "gram")
      .filter(abs(col("a_len") - col("b_len")) <= maxDist)
      .select("a_id", "a_s", "b_id", "b_s")
      .distinct()

    // sub-q-gram strings: both sides of such a pair have len < q + d —
    // a bounded population at any scale. The length window IS the
    // equi-key: the a-side emits its 2d+1 admissible partner lengths,
    // the b-side its own length, and equality covers |Δlen| <= d as a
    // hash join (a constant dummy key would fold away and degrade to
    // a nested loop; a length key survives the optimizer). Each pair
    // meets on exactly one key (b's length), so no dedup is needed.
    val shortCands = aN.filter(col("a_len") < q + maxDist)
      .withColumn("lk", explode(sequence(
        col("a_len") - lit(maxDist), col("a_len") + lit(maxDist))))
      .join(bN.filter(col("b_len") < q + maxDist)
        .withColumn("lk", col("b_len")), "lk")
      .filter(least(col("a_len"), col("b_len")) < q)
      .select("a_id", "a_s", "b_id", "b_s")

    gramCands.unionByName(shortCands)
      .withColumn("dist", levenshtein(col("a_s"), col("b_s"), maxDist))
      .filter(col("dist") >= 0) // threshold form returns -1 past the bound
      .select("a_id", "b_id", "dist")
  }

  /** Brute-force reference — O(|A|·|B|); test-scale oracle only. */
  private[graft] def edJoinBrute(a: DataFrame, b: DataFrame, maxDist: Int): DataFrame =
    a.select(col("id").as("a_id"), col("s").as("a_s"))
      .crossJoin(b.select(col("id").as("b_id"), col("s").as("b_s")))
      .withColumn("dist", levenshtein(col("a_s"), col("b_s"), maxDist))
      .filter(col("dist") >= 0)
      .select("a_id", "b_id", "dist")

  /** Contract query — FULLY DuckDB-oracled with an INDEPENDENT
    * lossless blocking: the oracle blocks by the PassJoin pigeonhole
    * (split each left string into d+1 chunks; an ed<=d partner must
    * contain one chunk verbatim — Li et al., VLDB 2012) while this
    * side blocks by prefix-filtered q-grams, so a false negative in
    * EITHER filter diverges the hash. The dirty side is a
    * deterministic per-key mutation of `part.p_name` (drop a char /
    * identity / replace a char — all ed<=1, all SQL-replicable), the
    * entity-resolution shape: match a corrupted feed back to its
    * catalog.
    */
  def qEditJoin(t: graft.sources.Tables): DataFrame = {
    val clean = t.part.select(col("p_partkey").as("id"), col("p_name").as("s"))
    val dirty = t.part.select(
      (col("p_partkey") + lit(1000000L)).as("id"),
      when(col("p_partkey") % 3 === 0,
        concat(substring(col("p_name"), 1, 2), expr("substr(p_name, 4)")))
        .when(col("p_partkey") % 3 === 1, col("p_name"))
        .otherwise(concat(substring(col("p_name"), 1, 4), lit("x"),
          expr("substr(p_name, 6)"))).as("s"))
    edJoin(clean, dirty, maxDist = 1)
      .orderBy("a_id", "b_id")
  }
}
