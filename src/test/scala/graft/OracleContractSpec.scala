package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contract file documents exactly which queries are rows-only by
  * design; this spec keeps that list honest — a new query missing its
  * oracle (or an oracle for a deleted query) fails here instead of
  * silently weakening the correctness gate. Pure map arithmetic, no
  * Spark session.
  */
class OracleContractSpec extends AnyFunSuite {

  // round 12 closed the oracle program: the four codec-bound
  // multimodal queries are now DECODED-PLANE REPLAYS (the decode
  // exports its output plane; DuckDB recomputes every downstream
  // feature from those values), so nothing is rows-only anymore
  private val rowsOnlyByDesign = Set.empty[String]

  test("every query is oracled unless declared rows-only by design") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnlyByDesign,
      s"undeclared rows-only: ${(missing -- rowsOnlyByDesign).toSeq.sorted}; " +
        s"stale declarations: ${(rowsOnlyByDesign -- missing).toSeq.sorted}")
  }

  test("no orphaned oracle entries") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.toSeq.sorted}")
  }

  test("the flagship entry() returns rows (the driver's smoke check)") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  // global-aggregate queries whose result is a single row — an ORDER
  // BY would be a no-op, so its absence is deliberate
  private val singleRowResults = Set(
    "q6_filter_agg", "q17_small_qty", "q14_promo_revenue", "q19_disjunctive",
    "q_funnel", "q_sample_mod", "q_distinct_cond", "q_dedup_exact", "q_data_card", "q_table_replace",
    "q_approx_distinct", "q_copy_into", "q_sketch_sidecars",
    "q_table_merge", "q_sql_merge", "q_sql_merge_general", "q_sql_insert",
    "q_vtable_skip", "q_vtable_lazy", "q_vtable_meta",
    "q_vtable_dfp", "q_vtable_in", "q_vtable_or", "q_table_evolve",
    "q_table_rename", "q_table_apply", "q_bloom_lookup")

  test("every oracle pins a deterministic output order") {
    // the driver hash compare sorts rows, but ORDER BY (or a LIMIT'd
    // TakeOrdered) keeps row COUNTS stable under ties across engines
    val unordered = SparkEntry.oracleSql.collect {
      case (name, sql) if !sql.toUpperCase.contains("ORDER BY") => name
    }.toSet
    assert(unordered == singleRowResults,
      s"oracles without ORDER BY beyond the single-row set: " +
        s"${(unordered -- singleRowResults).toSeq.sorted}; stale single-row " +
        s"declarations: ${(singleRowResults -- unordered).toSeq.sorted}")
  }
}
