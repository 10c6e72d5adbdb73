package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Relational}

/** Plan-shape audits: the 100 TB guarantees (pushdown, pruning,
  * broadcast, no cartesian products) asserted on the optimized plans.
  */
class ExplainSpec extends SparkSpecBase {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6 filter pushes down to the parquet scan") {
    val plan = planOf(Relational.q6FilterAgg(tables))
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("IsNotNull(l_shipdate")),
      s"no pushdown in:\n$plan")
  }

  test("q1 shipdate filter pushes down despite the timestamp_ntz literal cast") {
    val plan = planOf(Relational.q1PricingSummary(tables))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate not pushed:\n$plan")
  }

  test("q6 scan reads only the referenced columns") {
    val scanSchema = Relational.q6FilterAgg(tables).queryExecution.executedPlan
      .collectLeaves().map(_.toString).mkString
    assert(scanSchema.contains("l_extendedprice"))
    assert(!scanSchema.contains("l_comment") && !scanSchema.contains("l_returnflag"),
      s"scan not pruned:\n$scanSchema")
  }

  test("q5 broadcasts the dimension tables") {
    val plan = planOf(Relational.q5LocalSupplier(tables))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"no broadcast join in:\n$plan")
  }

  test("q3 keeps whole-stage codegen in the probe pipeline") {
    val df = Relational.q3ShippingPriority(tables)
    df.collect() // finalize the AQE plan
    val plan = planOf(df)
    // codegen stages print as "*(n)" prefixes in the executed plan
    assert(plan.contains("*("), s"no codegen span in:\n$plan")
  }

  test("topk plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf(Relational.qTopkOrders(tables))
    assert(plan.contains("TakeOrderedAndProject"), s"global sort in topk:\n$plan")
  }

  test("embed near-dup join is an equi-join on label, not a cartesian product") {
    val plan = planOf(Dedup.qEmbedNeardup(tables))
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("asof join plans one shuffle + window, no join operator at all") {
    val plan = planOf(graft.operators.AsofJoin.qAsofJoin(tables))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop in asof plan:\n$plan")
    assert(plan.contains("Window"), s"no window operator:\n$plan")
  }

  test("range join is an equi-join on (user, bucket), not nested-loop") {
    val plan = planOf(graft.operators.RangeJoin.qRangeJoin(tables))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop in range-join plan:\n$plan")
    assert(plan.contains("bucket"), s"no bucket key:\n$plan")
  }

  test("q_ntile_scaled has no Window operator — bucketing is a projection") {
    val plan = planOf(Relational.qNtileScaled(tables))
    assert(!plan.contains("Window"), s"global window crept back in:\n$plan")
  }

  test("pii scan prunes the documents read to (doc_id, text)") {
    val plan = planOf(graft.operators.Decontam.qPiiScan(tables))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text") &&
      !readSchema.contains("lang") && !readSchema.contains("n_chars"),
      s"unpruned scan: $readSchema")
  }

  test("approx percentile aggregates partially map-side (mergeable sketch)") {
    val plan = planOf(Relational.qPercentileApprox(tables))
    // the GK sketch must partial-aggregate BEFORE the group shuffle —
    // that map-side collapse is the entire point of the approx form
    assert(plan.contains("partial_approx_percentile"),
      s"no partial sketch aggregation:\n$plan")
  }

  test("chunking is shuffle-free until the final presentation sort") {
    val plan = planOf(graft.operators.Pretrain.qChunkDocs(tables))
    // split→slice→rejoin is per-row work: the ONLY exchange allowed is
    // the orderBy's range partitioning
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(plan).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"chunking shuffled before the sort: $exchanges\n${plan.take(600)}")
  }

  test("packing's corpus-side windows are partitioned; mixture gate broadcasts") {
    val pack = planOf(graft.operators.Pretrain.qPackSequences(tables))
    // exactly one unpartitioned window may exist — over the tiny block
    // roster; the corpus-side running sum must be keyed by block
    assert(pack.contains("windowspecdefinition(block"),
      s"corpus window lost its block partitioning:\n${pack.take(800)}")
    val mix = planOf(graft.operators.Pretrain.qDomainMix(tables))
    assert(mix.contains("BroadcastHashJoin"),
      s"mixture gate did not broadcast the rates:\n${mix.take(800)}")
  }

  test("hash_embed and bpe-adjacent expressions stay codegen'd") {
    val df = tables.documents.select(
      graft.functions.GraftFunctions.hashEmbed(col("text"), 64).as("e"))
    val plan = planOf(df)
    assert(plan.contains("*(") && plan.contains("hash_embed"),
      s"hash_embed fell out of codegen:\n$plan")
  }

  test("q10 top-20 plans as TakeOrderedAndProject over the rounded revenue") {
    val plan = planOf(Relational.q10ReturnedItems(tables))
    assert(plan.contains("TakeOrderedAndProject"), s"global sort in q10:\n$plan")
  }

  test("q8/q2 dims all broadcast; facts never nested-loop") {
    for (df <- Seq(Relational.q8MarketShare(tables),
        Relational.q2MinBalSupplier(tables))) {
      val plan = planOf(df)
      assert(plan.contains("BroadcastHashJoin"), s"no broadcast:\n${plan.take(800)}")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"nested-loop fact join:\n${plan.take(800)}")
    }
  }

  test("q4/q21 EXISTS chains ride semi/anti hash joins on the orderkey") {
    val q4 = planOf(Relational.q4PriorityCheck(tables))
    assert(q4.contains("LeftSemi"), s"q4 EXISTS not a semi join:\n${q4.take(800)}")
    val q21 = planOf(Relational.q21WaitingSupplier(tables))
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"),
      s"q21 lost its semi/anti pair:\n${q21.take(800)}")
    assert(!q21.contains("CartesianProduct") &&
      !q21.contains("BroadcastNestedLoopJoin"),
      s"q21 nested-loop:\n${q21.take(800)}")
  }

  test("q19 derives scan-prunable bounds from the OR'd envelopes") {
    val plan = planOf(Relational.q19Disjunctive(tables))
    // Catalyst folds the three branches' l_quantity ranges into a
    // common [1,30] envelope that reaches the lineitem scan
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"no derived quantity bound at the scan:\n${plan.take(1200)}")
  }

  test("keep-first windows plan as map-side WindowGroupLimit, not full-list windows") {
    // every rank-filtered keep-first/top-k window in the dedup and
    // curation paths must take Spark's WindowGroupLimit rewrite with a
    // Partial (pre-shuffle) stage: a hot key — a boilerplate line in
    // line-dedup, a mega-duplicated content hash in curation, a
    // stopword token in bm25 — then contributes at most k rows per map
    // task to the shuffle instead of its whole posting list to one
    // window partition. (qSpanDedup's aggregate window is NOT eligible
    // for this rewrite, which is why it routes hot spans explicitly —
    // see Dedup.routedSpans.)
    for ((name, df) <- Seq(
        "line_dedup" -> Dedup.qLineDedup(tables),
        "curate" -> graft.operators.Curate.qCurate(tables),
        "bm25" -> graft.operators.TextAnalysis.qBm25(tables),
        "group_sample" -> graft.operators.Decontam.qGroupSample(tables))) {
      val plan = planOf(df)
      assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
        s"$name lost the map-side group-limit rewrite:\n${plan.take(1200)}")
    }
  }

  test("custom expressions stay inside codegen (no eval fallback marker)") {
    val df = tables.embeddings.select(
      graft.functions.GraftFunctions.cosineSim(col("embedding"), col("embedding")).as("c"))
    val plan = planOf(df)
    assert(plan.contains("*(") && plan.contains("cosine_sim"),
      s"cosine fell out of codegen:\n$plan")
    // the z-order clustering key must also stay codegen'd — it runs
    // over every row of a compaction rewrite
    val z = tables.orders.select(graft.functions.GraftFunctions.zvalue(
      col("o_orderkey"), col("o_custkey")).as("z"))
    val zplan = planOf(z)
    assert(zplan.contains("*(") && zplan.contains("zvalue"),
      s"zvalue fell out of codegen:\n$zplan")
  }
}
