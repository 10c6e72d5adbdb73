package graft

/** Blanket plan audit over the ENTIRE driver contract: no query may
  * plan a cartesian product or nested-loop join unless it
  * intentionally broadcasts a tiny constant-size side (scalar
  * subqueries, fixed query sets, the 24-hour grid). Catches the
  * classic silent killer — a join whose equi-condition stopped being
  * recognized and degraded to NLJ — across all 55 queries at once.
  */
class PlanAuditSpec extends SparkSpecBase {

  // queries whose plan legitimately contains a broadcast nested-loop
  // join of a bounded-size side (≤ O(100) rows by construction)
  private val intentionalCross = Set(
    "q_scalar_subquery", // 1-row global avg
    "q11_important_parts", // 1-row grand-total threshold
    "q22_idle_customers",  // 1-row rounded avg-balance threshold
    "q_ann_bruteforce",  // 3-row query set
    "q_hard_negatives",  // same 3-row query set, band-filtered
    "q_text_ann",        // 3-row hash-embedded query set
    "q_hybrid_rrf",      // same 3-row query set (dense arm of the fusion)
    "q_maxsim",          // 4-row query-token set (late interaction)
    "q_maxsim_ivf",      // same 4-row query set, IVF-pruned candidates
    "q_ann_ivf",         // k-row centroid table
    "q_ann_pq",          // 3-row query-ordinal frame fanning out the ADC batch
    "q_ann_ivfpq",       // k-row centroid table + same ordinal frame
    "q_semdedup",        // same k-row centroid table (index-build lineage)
    "q_cluster_topics",  // same k-row centroid table (assignment pass)
    "q_approx_distinct", // 1-row exact-count audit side (bound verification)
    "q_sketch_sidecars", // 1-row metadata-estimate decision × 1-row audits
    "q_cosine_pairs",    // label-blocked; AQE may plan tiny side as BNLJ? keep strict below
    "q_tfidf",           // 1-row n_docs
    "q_bm25",            // 1-row (n_docs, avgdl) corpus stats
    "q_text_index_bm25", // same 1-row corpus stats, from the index ledger
    "q_resample",        // |types| x 24 grid
    "q_ntile_scaled",    // 1-row quartile cut points
    "q_nb_filter",       // 1-row label median + 1-row model scalars
    "q_dsir_select",     // 1-row vocab/total scalars
    "q_lm_score"         // 1-row vocab scalar
  )

  test("no unintentional cartesian/nested-loop joins in any contract query") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, TestSpark.sfDir).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val nlj = plan.contains("BroadcastNestedLoopJoin")
      if (cartesian) Some(s"$name: CartesianProduct")
      else if (nlj && !intentionalCross(name)) Some(s"$name: BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the intentionalCross allowlist's non-equi join sides are actually bounded") {
    // each allowlist entry claims its nested-loop side is <= O(100)
    // rows BY CONSTRUCTION — machine-check the claim instead of
    // trusting the comment: for every optimized-plan join with no
    // cross-side equi key, the SMALLER side must actually count under
    // the bound at audit SF (a constant-size side stays constant; a
    // corpus-shaped side would already dwarf it here)
    import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val Bound = 200L
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o         => Seq(o)
    }
    val offenders = intentionalCross.toSeq.sorted.flatMap { name =>
      val fn = SparkEntry.queries(name)
      val plan = fn(spark, TestSpark.sfDir).queryExecution.optimizedPlan
      val loose = plan.collectWithSubqueries {
        case j: Join =>
          val hasEqui = j.condition.exists(c => conjuncts(c).exists {
            case EqualTo(l, r) => splitsAcross(j, l, r)
            case EqualNullSafe(l, r) => splitsAcross(j, l, r)
            case _ => false
          })
          if (hasEqui) None else Some(j)
      }.flatten
      loose.flatMap { j =>
        val minSide = Seq(j.left, j.right).map(side =>
          org.apache.spark.sql.GraftSqlBridge.ofRows(spark, side).count()).min
        if (minSide > Bound)
          Some(s"$name: non-equi join whose smaller side is $minSide rows (> $Bound)")
        else None
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  // a genuine equi KEY pulls references from BOTH children (a
  // literal comparison has an empty side and blocks nothing)
  private def splitsAcross(j: org.apache.spark.sql.catalyst.plans.logical.Join,
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    (l.references.nonEmpty && r.references.nonEmpty) &&
      ((l.references.subsetOf(j.left.outputSet) &&
        r.references.subsetOf(j.right.outputSet)) ||
        (r.references.subsetOf(j.left.outputSet) &&
          l.references.subsetOf(j.right.outputSet)))

  // Queries whose served plan legitimately contains a GLOBAL
  // (partition-less) window, each with its bound proof — the input is
  // O(constant) or O(dims) rows BY CONSTRUCTION, never corpus-scale.
  // Anything else planning a partition-less window fails the audit:
  // the bench log's recurring benign WindowExec warnings would
  // otherwise mask a real single-partition total order sneaking in.
  private val boundedGlobalWindows = Map(
    // two-level prefix sums: the global window ranks the BLOCK ROSTER
    // (n/BlockSize rows, Pretrain.withStart), never the docs
    "q_pack_sequences" -> "block roster of n/8192 rows",
    "q_pack_bpe" -> "block roster of n/8192 rows",
    // same two-level shape over exactly 64 hash buckets
    "q_shuffle_order" -> "bucket roster of <=65 rows",
    // grand-total over PER-LANGUAGE counts (|langs| rows, single digits)
    "q_domain_mix" -> "per-lang count frame",
    "q_mix_upsample" -> "per-lang count frame",
    // deliberate dim-scale total order, documented at the operator;
    // its fact-scale twin is q_ntile_scaled (pre-computed cut points)
    "q_ntile" -> "dim-scale by contract; scale twin q_ntile_scaled")

  test("no contract query plans an unbounded partition-less window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, TestSpark.sfDir).queryExecution.optimizedPlan
      val globals = plan.collectWithSubqueries {
        case w: LWindow if w.partitionSpec.isEmpty          => w.nodeName
        case w: WindowGroupLimit if w.partitionSpec.isEmpty => w.nodeName
      }
      if (globals.nonEmpty && !boundedGlobalWindows.contains(name))
        Some(s"$name: ${globals.mkString(",")}")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("every query's plan prunes the parquet scan to referenced columns") {
    // spot the worst smell: a scan with the full 16-col lineitem schema
    // in a query that uses a handful
    val fullLineitem = "l_orderkey,l_partkey,l_suppkey,l_linenumber,l_quantity," +
      "l_extendedprice,l_discount,l_tax,l_returnflag,l_linestatus,l_shipdate"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, TestSpark.sfDir).queryExecution.executedPlan.toString
      if (plan.contains(fullLineitem.replace(",", ":bigint,"))) Some(name) else None
    }
    assert(offenders.isEmpty, s"unpruned lineitem scans: $offenders")
  }
}
