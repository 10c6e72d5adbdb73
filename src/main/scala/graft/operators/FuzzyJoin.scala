package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance FUZZY JOIN — all pairs (a, b) with
  * `levenshtein(a.s, b.s) <= d`, without the O(|A|·|B|) cross
  * product: POSITIONAL q-gram blocking in the Ed-Join family (Xiao
  * et al., VLDB 2008; prefix filtering after Chaudhuri et al., ICDE
  * 2006), then one codegen'd threshold-`levenshtein` verifies each
  * surviving candidate.
  *
  * Why it is LOSSLESS (no false negatives): a string of length L has
  * L−q+1 positional q-gram OCCURRENCES, and one edit rewrites at most
  * q of them — so `ed(a,b) <= d` destroys at most `q·d` of a's
  * occurrences, and every SURVIVING occurrence (gram g at position p)
  * appears in b as g at some position within `d` of p (edits left of
  * it shift it by at most one each). Pick ANY `q·d + 1` of a's
  * occurrences: at least one survives, so joining a's picked
  * occurrences against ALL of b's occurrences on (gram,
  * position-bucket) — buckets of width d+1, the a side emitting the
  * ≤2 buckets its ±d window spans — finds every true pair. The pick
  * is a free choice, so it is spent as a performance heuristic: a's
  * occurrences whose gram is RAREST ON THE B SIDE (absent-in-b grams
  * first — for a true pair those were destroyed occurrences, and the
  * +1 over `q·d` already pays for them). The positional key is what
  * keeps a common gram cheap: a boilerplate gram pairs only strings
  * carrying it at nearby OFFSETS, not every pair of strings
  * containing it anywhere.
  *
  * The pick guarantee needs `q·d + 1` occurrences to pick FROM, i.e.
  * `len >= q·(d+1)`; a-strings below that (including the gram-less
  * `len < q`) can have EVERY occurrence destroyed by d edits, so they
  * can't ride the gram join. Their partners sit within d of their
  * length, a bounded slice, so every a-string with
  * `a_len < q·(d+1)` pairs through an exploded LENGTH-BAND equi-key
  * (a constant dummy key would fold away in the optimizer and
  * degrade to a nested loop) against the `b_len <= a_len + d` slice
  * and verifies through the same levenshtein. The two candidate sets
  * are disjoint by construction: the band path takes exactly the
  * a-strings the gram path excludes (`a_len < q·(d+1)` vs `>=`).
  *
  * Shuffle inventory at 100 TB: both sides explode O(len) occurrence
  * rows per string, b's gram frequencies are one partial-agg'd pass,
  * a's pick is a per-string window (bounded partitions), the
  * candidate join carries `q·d + 1` rows per a-string (×2 bucket
  * keys) against b's occurrence table, and verification is a
  * projection. Nothing is quadratic except genuinely-colliding
  * candidates — which the verifier must read anyway.
  */
object FuzzyJoin {

  /** Length bound for the d = 2 deletion regime: strings below it
    * carry O(len²/2) two-deletion variants (≤ ~530 hashes at 32) —
    * cheap, vocabulary-immune blocking; above it the positional-gram
    * path takes over (its pick guarantee needs only len >= q·(d+1),
    * comfortably below this).
    */
  private[graft] val DeletionMaxLen = 32

  /** All (a_id, b_id, dist) with `levenshtein <= maxDist` between two
    * (id, s) frames. `q` is the gram width (3 suits natural-language
    * strings; raise it for long near-unique strings to sharpen the
    * filter).
    *
    * Regimes: d ≤ 1 is pure deletion-neighborhood; d = 2 splits on
    * the LEFT length at [[DeletionMaxLen]] — short strings block by
    * depth-2 deletion neighborhoods (`ed ≤ 2 ⟹ D≤2 sets intersect`:
    * delete from each side the ≤2 positions its half of the edit
    * script touches and both reach the same string — false positives
    * verified away), long strings by positional grams; d ≥ 3 is the
    * gram path with its length-band branch. The deletion split
    * matters on REPETITIVE short-string corpora (entity names drawn
    * from a small vocabulary), where any gram blocking floors at
    * n²/|vocab| candidates: measured on the contract corpus (64
    * distinct 7-12-char names over 20k rows), gram blocking admits
    * 19M candidates for a 39k-pair answer; deletion blocking tracks
    * the actual near-duplicate structure.
    */
  def edJoin(a: DataFrame, b: DataFrame, maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 0 && q >= 1, s"bad edJoin params d=$maxDist q=$q")
    if (maxDist <= 1) return edJoinDeletion(a, b, maxDist)
    if (maxDist == 2) {
      // disjoint on the LEFT length (the band-split convention): a
      // short-a pair's b side sits within +d, a bounded slice the
      // deletion branch's own filter admits. The split point must sit
      // AT OR ABOVE the gram path's pick floor q·(d+1): with q >= 11
      // (3q > DeletionMaxLen) a left string in [DeletionMaxLen, 3q)
      // has too few occurrences for the pick guarantee, so the
      // deletion regime widens to cover it — O(len²/2) variants per
      // string stays bounded by the caller's own q choice
      val split = math.max(DeletionMaxLen, q * (maxDist + 1))
      val short = edJoinDeletion(
        a.filter(length(col("s")) < split),
        b.filter(length(col("s")) < split + maxDist), maxDist)
      val long = gramPath(a, b, maxDist, q, aFloor = split)
      return short.unionByName(long)
    }
    gramPath(a, b, maxDist, q, aFloor = q * (maxDist + 1), bandBranch = true)
  }

  /** Verify candidate id pairs: re-join the strings by id (the only
    * point where payload strings move — candidate generation and dedup
    * shuffle ids + lengths only, guide §2.3 "shuffle keys and metadata
    * instead of payloads": before r19 the candidate join carried both
    * strings through the blocking join AND the distinct at the
    * occurrence fan-out's multiplicity, ~6× the bytes) and keep pairs
    * the threshold levenshtein admits. The `(id, s).distinct()` on the
    * re-join sides reproduces the old 4-tuple-distinct multiplicity
    * exactly when a caller feeds duplicate rows; for unique-id frames
    * (every contract use) it folds into the join's own exchange scale.
    * Lossless: any (a_s, b_s) combo within `maxDist` shares a blocking
    * key by the pick/deletion guarantees, so id-level dedup can only
    * ADD string combos the verifier then filters — never drop one.
    */
  private def verified(candIds: DataFrame, a: DataFrame, b: DataFrame,
      maxDist: Int): DataFrame =
    candIds
      .join(a.select(col("id").as("a_id"), col("s").as("a_s")).distinct(), "a_id")
      .join(b.select(col("id").as("b_id"), col("s").as("b_s")).distinct(), "b_id")
      .withColumn("dist", levenshtein(col("a_s"), col("b_s"), maxDist))
      .filter(col("dist") >= 0) // threshold form returns -1 past the bound
      .select("a_id", "b_id", "dist")

  /** The positional-gram regime: candidates for pairs whose LEFT
    * string has `len >= aFloor` (callers guarantee `aFloor >=
    * q·(d+1)`, the pick floor); when `bandBranch` is set, left
    * strings below the floor pair through the length-band equi-key
    * (the d >= 3 layout — at d = 2 the deletion branch covers them).
    */
  private def gramPath(a: DataFrame, b: DataFrame, maxDist: Int, q: Int,
      aFloor: Int, bandBranch: Boolean = false): DataFrame = {
    val pickLen = q * maxDist + 1
    val w = maxDist + 1 // position-bucket width

    // O(len)× occurrence amplification — same round-robin pre-split
    // as the deletion path, so the explode never runs on the scan's
    // raw-byte-sized (often single-task) partitioning
    val nPart = a.sparkSession.sessionState.conf.numShufflePartitions
    def named(df: DataFrame, side: String): DataFrame =
      df.repartition(nPart)
        .select(col("id").as(s"${side}_id"), col("s").as(s"${side}_s"),
          length(col("s")).as(s"${side}_len"))

    // a's pre-split HASH-partitions by id (not round-robin): same
    // explode-parallelizing spread, but the pick window below then
    // reuses the clustering and sorts locally instead of re-shuffling
    // the exploded occurrence rows (guide §2.4)
    val aN = a.repartition(nPart, col("id"))
      .select(col("id").as("a_id"), col("s").as("a_s"),
        length(col("s")).as("a_len"))
    val bN = named(b, "b")
    // everything from the gram explode to the candidate distinct moves
    // ids + lengths only; strings re-join at verification ([[verified]])

    // the pick below chooses q·d + 1 of a's occurrences, so the
    // guarantee only holds for a-strings that HAVE that many
    // (a_len − q + 1 >= q·d + 1 ⇔ a_len >= q·(d+1)); the caller's
    // aFloor is at or above that, and a-strings below it arrive via
    // the deletion (d = 2) or length-band (d >= 3) branch instead.
    // The b side only needs its occurrences ENUMERATED, and any b
    // paired with a gram-path a has b_len >= aFloor − d — applied as
    // a filter so a corpus with NO gram-regime strings costs two
    // filtered scans, not an occurrence explode + frequency aggregate
    // (the pick heuristic stays lossless: frequencies steer a free
    // choice, and b's outside the window can never be candidates).
    val bFloor = math.max(q, aFloor - maxDist)
    def grams(df: DataFrame, side: String): DataFrame =
      df.filter(col(s"${side}_len") >= (if (side == "a") aFloor else bFloor))
        .select(col(s"${side}_id"), col(s"${side}_len"),
          explode(transform(
            sequence(lit(1), col(s"${side}_len") - lit(q) + 1),
            i => struct(col(s"${side}_s").substr(i, lit(q)).as("gram"),
              i.as("pos")))).as("g"))
        .select(col(s"${side}_id"), col(s"${side}_len"),
          col("g.gram").as("gram"), col("g.pos").as("pos"))

    val aG = grams(aN, "a")
    val bG = grams(bN, "b")
      .withColumn("pb", floor(col("pos") / w))

    // b-side gram frequencies steer a's pick (rarest-in-b first;
    // absent-in-b grams rank ahead of everything — destroyed
    // occurrences for any true pair, already budgeted by the +1)
    val dfB = bG.groupBy("gram").agg(count(lit(1)).as("gram_df"))

    val aPick = {
      import org.apache.spark.sql.expressions.Window
      aG.join(dfB, Seq("gram"), "left")
        .withColumn("gram_df", coalesce(col("gram_df"), lit(0L)))
        .withColumn("grank", row_number().over(
          Window.partitionBy("a_id")
            .orderBy(col("gram_df"), col("gram"), col("pos"))))
        .filter(col("grank") <= pickLen)
    }
    // each picked occurrence enumerates every bucket its ±d window
    // can touch (≤3 of width d+1) — the band-join-to-equi-join trick
    val aKeys = aPick
      .withColumn("pb", explode(sequence(
        floor((col("pos") - maxDist) / w), floor((col("pos") + maxDist) / w))))
      .select("gram", "pb", "a_id", "a_len")

    // candidates: picked a-occurrences meet ALL b-occurrences sharing
    // the gram at a nearby offset, inside the length window — id pairs
    // only; [[verified]] re-joins the strings once after the dedup.
    // both sides of the candidate join are exploded occurrence tables
    // (never broadcast-sized despite Generate's understated estimate)
    val gramCands = aKeys.join(
        bG.select("gram", "pb", "b_id", "b_len").hint("shuffle_hash"),
        Seq("gram", "pb"))
      .filter(abs(col("a_len") - col("b_len")) <= maxDist)
      .select("a_id", "b_id")
      .distinct()

    val gramVerified = verified(gramCands, a, b, maxDist)

    // below-floor a-strings (the d >= 3 layout; at d = 2 the deletion
    // branch owns them): partners sit at b_len <= a_len + d — a
    // bounded slice at any scale. The length window IS the equi-key
    // (see the scaladoc); each pair meets on exactly one key (b's
    // length), so no dedup is needed — and with no dedup there is no
    // payload-amplified shuffle to avoid, so the strings ride straight
    // into the verify (the id-rejoin would only add two joins here).
    if (!bandBranch) gramVerified
    else gramVerified.unionByName(
      aN.filter(col("a_len") < aFloor)
        .withColumn("lk", explode(sequence(
          col("a_len") - lit(maxDist), col("a_len") + lit(maxDist))))
        .join(bN.filter(col("b_len") < aFloor + maxDist)
          .withColumn("lk", col("b_len")), "lk")
        .withColumn("dist", levenshtein(col("a_s"), col("b_s"), maxDist))
        .filter(col("dist") >= 0)
        .select("a_id", "b_id", "dist"))
  }

  /** The d <= 1 fast path — DELETION-NEIGHBORHOOD blocking (the
    * FastSS / SymSpell family, Bocek et al. 2007): `ed(a, b) <= 1`
    * EXACTLY when `{a} ∪ deletions(a)` intersects `{b} ∪
    * deletions(b)` (a substitution deletes the differing position
    * from both; an insertion deletes the inserted character from the
    * longer side), so candidates come from ONE equi-join on hashed
    * variants — no gram frequencies, no windows, and crucially no
    * dependence on the corpus's gram vocabulary: q-gram blocking
    * degrades to ~n²/|gram vocabulary| candidates on repetitive
    * small-vocabulary corpora, while the deletion join's fan-out
    * tracks actual near-duplicate structure. Variants are emitted as
    * xxhash64 values (8 bytes per variant, O(len) per string — never
    * the O(len²) bytes of materialized variant strings); a hash
    * collision or the ed<=2 shapes whose deletion sets also touch
    * only ever ADD candidates, and the levenshtein verify kills them.
    */
  private def edJoinDeletion(a: DataFrame, b: DataFrame, maxDist: Int): DataFrame = {
    // the explode amplifies each row ~len²/2× at d = 2, so the scan's
    // own partitioning (sized for the RAW bytes — often one task for a
    // dimension-sized input) undersplits the expensive stage: a 1×
    // round-robin shuffle of the raw strings buys a fully parallel
    // variant explode. The variant join is hinted SHUFFLE_HASH: the
    // exploded sides are never broadcast-sized (Generate's size
    // estimate wildly understates them), and per-task deserialization
    // of a multi-million-row broadcast table dominated the probe stage
    val nPart = a.sparkSession.sessionState.conf.numShufflePartitions
    def variants(df: DataFrame, side: String): DataFrame = {
      val named = df.repartition(nPart)
        .select(col("id").as(s"${side}_id"),
          col("s").as(s"${side}_s"), length(col("s")).as(s"${side}_len"))
      val s = col(s"${side}_s")
      val len = col(s"${side}_len")
      // i = 0 keeps the string itself; i = 1..len deletes char i
      val upper = if (maxDist == 0) lit(0) else len
      val depth1 = transform(sequence(lit(0), upper), i =>
        xxhash64(when(i === 0, s)
          .otherwise(concat(s.substr(lit(1), i - 1),
            s.substr(i + 1, len - i)))))
      // depth 2 (maxDist = 2): delete chars i < j — O(len²/2) hashes;
      // callers bound len ([[DeletionMaxLen]]) so this stays cheap
      val all =
        if (maxDist < 2) depth1
        else concat(depth1,
          // sequence(x, y) with x > y generates DESCENDING — guard the
          // sub-2-char strings to an empty depth-2 set instead
          when(len >= 2, flatten(transform(sequence(lit(1), len - 1), i =>
            transform(sequence(i + 1, len), j =>
              xxhash64(concat(s.substr(lit(1), i - 1),
                s.substr(i + 1, j - i - 1),
                s.substr(j + 1, len - j)))))))
            .otherwise(array().cast("array<long>")))
      // ids + lengths only ride the variant join and the candidate
      // dedup (strings re-join at verification — guide §2.3): the
      // explode amplifies each row O(len)× at d = 1 and O(len²/2)× at
      // d = 2, so a ~45-byte string riding here costs ~6× the bytes of
      // the (id, len, vh) triple at every exchange
      named.select(col(s"${side}_id"), col(s"${side}_len"),
        explode(array_distinct(all)).as("vh"))
    }
    val candIds = variants(a, "a").join(variants(b, "b").hint("shuffle_hash"), "vh")
      .filter(abs(col("a_len") - col("b_len")) <= maxDist)
      .select("a_id", "b_id")
      .distinct()
    verified(candIds, a, b, maxDist)
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
    * side blocks by positional q-grams, so a false negative in
    * EITHER filter diverges the hash. The dirty side is a
    * deterministic per-key mutation of the part entity (drop a char /
    * identity / replace a char — all ed<=1, all SQL-replicable), the
    * entity-resolution shape: match a corrupted feed back to its
    * catalog.
    */
  def qEditJoin(t: graft.sources.Tables): DataFrame = {
    // entity string = name + record id, the dirty-feed shape. The id
    // suffix matters for SCALE, not just realism: the synthetic part
    // names draw from a ~100-name vocabulary with groups of hundreds
    // of identical strings, so a bare-name ed-join's ANSWER is
    // quadratic in group size (6M+ pairs at sf0.1) — no blocking can
    // beat an output that large. Suffixed entities keep the answer
    // O(n) and give every string rare grams for the pick to block on.
    def entity(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat(name, lit(" #"), col("p_partkey").cast("string"))
    val clean = t.part.select(col("p_partkey").as("id"),
      entity(col("p_name")).as("s"))
    val dirty = t.part.select(
      (col("p_partkey") + lit(1000000L)).as("id"),
      when(col("p_partkey") % 3 === 0,
        entity(concat(substring(col("p_name"), 1, 2), expr("substr(p_name, 4)"))))
        .when(col("p_partkey") % 3 === 1, entity(col("p_name")))
        .otherwise(entity(concat(substring(col("p_name"), 1, 4), lit("x"),
          expr("substr(p_name, 6)")))).as("s"))
    edJoin(clean, dirty, maxDist = 1)
      .orderBy("a_id", "b_id")
  }

  /** The SAME join as [[qEditJoin]] written the way a SQL user would —
    * a naive `JOIN ON levenshtein(a.s, b.s) <= 1` over two views —
    * planned by [[graft.plans.EdJoinRewrite]] into the blocked form
    * (PlanAuditSpec's no-nested-loop sweep enforces that the rule
    * actually fired: without it this plan IS a BroadcastNestedLoopJoin
    * over 20k×20k levenshtein calls). Shares q_edit_join's oracle
    * text: both paths must hash-match the same independent PassJoin
    * replay.
    */
  def qEditJoinSql(t: graft.sources.Tables): DataFrame = {
    graft.plans.EdJoinRewrite.install(t.spark)
    def entity(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat(name, lit(" #"), col("p_partkey").cast("string"))
    t.part.select(col("p_partkey").as("id"), entity(col("p_name")).as("s"))
      .createOrReplaceTempView("__graft_edj_a")
    t.part.select((col("p_partkey") + lit(1000000L)).as("id"),
      when(col("p_partkey") % 3 === 0,
        entity(concat(substring(col("p_name"), 1, 2), expr("substr(p_name, 4)"))))
        .when(col("p_partkey") % 3 === 1, entity(col("p_name")))
        .otherwise(entity(concat(substring(col("p_name"), 1, 4), lit("x"),
          expr("substr(p_name, 6)")))).as("s"))
      .createOrReplaceTempView("__graft_edj_b")
    t.spark.sql(
      """SELECT a.id AS a_id, b.id AS b_id, levenshtein(a.s, b.s) AS dist
        |FROM __graft_edj_a a JOIN __graft_edj_b b
        |  ON levenshtein(a.s, b.s) <= 1
        |ORDER BY a_id, b_id""".stripMargin)
  }

  /** The d = 2 twin of [[qEditJoinSql]]: a naive `ON levenshtein <= 2`
    * join planned by [[graft.plans.EdJoinRewrite]]'s positional
    * q-gram path (the d >= 2 regime — deletion neighborhoods are
    * useless there). Mutations are two-edit (drop two chars / identity
    * / replace two chars), all SQL-replicable; the oracle blocks with
    * the d+1 = 3-chunk PassJoin pigeonhole. Both sides take the even
    * half of `part` — the d = 2 verify budget is the same, but the
    * oracle's contains() scan is quadratic in slice size, and half the
    * table already exercises every code path.
    */
  def qEditJoinSql2(t: graft.sources.Tables): DataFrame = {
    graft.plans.EdJoinRewrite.install(t.spark)
    def entity(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat(name, lit(" #"), col("p_partkey").cast("string"))
    val half = t.part.filter(col("p_partkey") % 2 === 0)
    half.select(col("p_partkey").as("id"), entity(col("p_name")).as("s"))
      .createOrReplaceTempView("__graft_edj2_a")
    half.select((col("p_partkey") + lit(1000000L)).as("id"),
      when(col("p_partkey") % 3 === 0,
        entity(concat(substring(col("p_name"), 1, 2), expr("substr(p_name, 5)"))))
        .when(col("p_partkey") % 3 === 1, entity(col("p_name")))
        .otherwise(entity(concat(substring(col("p_name"), 1, 4), lit("xy"),
          expr("substr(p_name, 7)")))).as("s"))
      .createOrReplaceTempView("__graft_edj2_b")
    t.spark.sql(
      """SELECT a.id AS a_id, b.id AS b_id, levenshtein(a.s, b.s) AS dist
        |FROM __graft_edj2_a a JOIN __graft_edj2_b b
        |  ON levenshtein(a.s, b.s) <= 2
        |ORDER BY a_id, b_id""".stripMargin)
  }
}
