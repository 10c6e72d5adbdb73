package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Rnd.round

import graft.sources.Tables

/** Benchmark decontamination + redaction + stratified sampling — the
  * remaining compliance stages of a training-data run (overlap
  * removal per GPT-3/PaLM appendix methodology; pattern scrubbing;
  * per-stratum rate control).
  */
object Decontam {

  private def shingles(df: DataFrame, k: Int): DataFrame =
    df.select(col("doc_id"),
      explode(graft.functions.GraftFunctions.wordShingles(col("text"), k)).as("shingle"))

  /** The stand-in benchmark membership rule (every 50th doc) — ONE
    * definition, shared by both scan variants, their oracles'
    * `% 50` literals, and PipelineDemo's training-corpus exclusion;
    * swap in a real benchmark id table here and every consumer
    * follows.
    */
  def isBench: org.apache.spark.sql.Column = col("doc_id") % 50 === 0

  /** Corpus documents sharing ≥ `minHits` word-k-grams with the
    * benchmark set (stand-in: every 50th doc). The benchmark shingle
    * table is tiny relative to the corpus → broadcast inner join, so
    * the corpus never shuffles BY SHINGLE (the expensive key); the
    * remaining exchanges are the corpus-side rebalance for shingling
    * CPU and the per-doc hit aggregation.
    */
  def qDecontaminate(t: Tables, k: Int = 5, minHits: Int = 2): DataFrame = {
    // filter BEFORE repartition: the ~2% benchmark side must not drag
    // a full-corpus shuffle behind it
    val bench = t.documents.filter(isBench)
    val benchShingles = shingles(bench, k)
      .select(col("shingle"), col("doc_id").as("bench_id")).distinct()
    val corpus = t.documents.filter(!isBench)
      .repartition(col("doc_id"))
    shingles(corpus, k)
      .join(broadcast(benchShingles), "shingle")
      .groupBy("doc_id")
      // n_hits = DISTINCT shared k-grams ("shares >= minHits k-grams
      // with the benchmark SET"): one k-gram appearing in two bench
      // docs is still ONE shared k-gram — the pair dimension is what
      // n_bench_docs reports
      .agg(countDistinct(col("shingle")).as("n_hits"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .filter(col("n_hits") >= minHits)
      .orderBy("doc_id")
  }

  /** Bloom-prefiltered decontamination — SAME result as
    * [[qDecontaminate]], different scale regime. The exact form
    * broadcasts the raw benchmark shingle table; once the benchmark
    * suite grows past broadcast size (10^9 shingles ≈ tens of GB of
    * strings), that plan dies. Here the benchmark side is first folded
    * into a [[graft.functions.BloomAgg]] Bloom filter — a distributed
    * OR-mergeable build, ~1.2 bytes/item at 1% fp — and the corpus
    * shingle stream drops non-members via the codegen'd
    * `bloom_contains` BEFORE any join: only the ~(true hits + fp)
    * sliver reaches the exact-confirm join that removes false
    * positives (false negatives are impossible), so the result is
    * bit-identical to the exact plan — the oracle is literally
    * q_decontaminate's SQL.
    *
    * The `head()` is a single filter-sized byte array landing on the
    * driver (the sketch, never the strings) — same driver traffic
    * class as broadcast cut points elsewhere.
    */
  def qDecontaminateBloom(t: Tables, k: Int = 5, minHits: Int = 2,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.Encoders
    val bench = t.documents.filter(isBench)
    val benchShingles = shingles(bench, k)
      .select(col("shingle"), col("doc_id").as("bench_id")).distinct()
    // two tiny jobs over the small side only: size the filter, fill it
    val n = math.max(1L, benchShingles.select("shingle").distinct().count())
    val bloom = benchShingles
      .select(xxhash64(col("shingle")).as("h")).as[Long](Encoders.scalaLong)
      .select(new graft.functions.BloomAgg(n, fpp).toColumn).head()
    val corpus = t.documents.filter(!isBench)
      .repartition(col("doc_id"))
    shingles(corpus, k)
      .filter(graft.functions.GraftFunctions.bloomContains(
        lit(bloom), xxhash64(col("shingle"))))
      .join(broadcast(benchShingles), "shingle")
      .groupBy("doc_id")
      .agg(countDistinct(col("shingle")).as("n_hits"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .filter(col("n_hits") >= minHits)
      .orderBy("doc_id")
  }

  /** Pattern scrubbing: redact a target token pattern, report
    * per-document redaction counts and resulting length — the shape
    * of a PII scrub (the synthetic corpus has no PII, so the pattern
    * targets a vocabulary word).
    */
  def qRedact(t: Tables, pattern: String = "spark"): DataFrame =
    t.documents
      .select(col("doc_id"),
        length(col("text")).as("len_before"),
        length(regexp_replace(col("text"), pattern, "[X]")).as("len_after"),
        (size(split(col("text"), pattern, -1)) - 1).as("n_redactions"))
      .orderBy("doc_id")

  /** Multi-pattern PII scan — per-document counts of email, phone,
    * and IPv4 shapes plus a has_pii flag (the detect side of the
    * scrub; qRedact is the remove side). One pruned scan, three
    * codegen'd regexp_count projections — no UDF, no shuffle until
    * the deterministic output sort. Patterns stay in the RE2 ∩ Java
    * regex dialect so the DuckDB oracle matches byte-for-byte (the
    * synthetic corpus is PII-free, so the gate pins the all-zero
    * result — detection quality is the pattern's business, the
    * operator's business is exact counting).
    */
  def qPiiScan(t: Tables): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\\b"
    val ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    t.documents.select(col("doc_id"),
        regexp_count(col("text"), lit(email)).as("n_emails"),
        regexp_count(col("text"), lit(phone)).as("n_phones"),
        regexp_count(col("text"), lit(ipv4)).as("n_ips"))
      .withColumn("has_pii",
        (col("n_emails") + col("n_phones") + col("n_ips") > 0).cast("int"))
      .orderBy("doc_id")
  }

  /** Deterministic WEIGHTED sample — priority sampling (Duffield,
    * Lund & Thorup, JACM 2007) with the uniform derived from the key:
    * priority = u(doc_id) / weight, keep the k smallest, so a doc's
    * selection odds scale with its weight (n_chars here; any scalar
    * quality column drops in). u is engine-portable integer
    * arithmetic — (doc_id · 2654435761) mod 1000003, the same
    * convention as the leakage-split assignment — so the sample is
    * bit-reproducible across engines and runs, the property
    * TABLESAMPLE can't give (and the priority ordering is a plain
    * IEEE division of integers, exact-rounded identically
    * everywhere, unlike a pow/log-based Efraimidis–Spirakis key).
    * Top-k plans as TakeOrderedAndProject — per-partition heaps, no
    * corpus-scale total order.
    */
  def qWeightedSample(t: Tables, k: Int = 100): DataFrame = {
    // reduce BEFORE the multiply: (d mod p)·m stays under 2^63 for any
    // 64-bit doc_id, where d·m would silently wrap in Spark and raise
    // an overflow error in DuckDB — same residues either way
    val u = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
      lit(1000003L)) + lit(0.5)
    t.documents
      .filter(col("n_chars") > 0) // zero-weight docs can't be drawn
      .select(col("doc_id"), col("n_chars"),
        round(u / col("n_chars"), 6).as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)
  }

  /** Bounded per-group sample: exactly k docs per language, chosen by
    * a deterministic pseudo-random order (md5 of the key) — the
    * "inspect k examples per stratum" primitive. One shuffle on the
    * group key; WindowGroupLimit caps per-partition state at k.
    */
  def qGroupSample(t: Tables, k: Int = 5): DataFrame =
    t.documents
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
      .orderBy("lang", "rk")

  /** Deterministic stratified sampling: per-language keep rates via a
    * pure function of the key — reproducible across runs/engines,
    * unlike TABLESAMPLE. One pruned scan, rates as a CASE expression.
    */
  def qStratifiedSample(t: Tables): DataFrame = {
    val rate = when(col("lang") === "en", 80)
      .when(col("lang") === "zh", 50)
      .otherwise(20)
    t.documents
      .filter(pmod(col("doc_id"), lit(100)) < rate)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy("lang")
  }
}
