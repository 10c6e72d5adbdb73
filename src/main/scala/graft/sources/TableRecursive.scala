package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Recursive (frontier-chasing) queries OVER A VTABLE with per-level
  * dynamic file pruning — the scale posture `q_recursive_cte`'s plain
  * SQL form can't reach: Spark's native WITH RECURSIVE re-plans each
  * level as a join against the full table relation, so every level
  * re-SCANS the table even though the live frontier pins the only
  * keys that can match. Here each level's frontier becomes a
  * LocalRelation dim joined to the LAZY vtable scan, which is exactly
  * the `marker ⋈ small-dim` shape [[graft.plans.VTableScanRule]]'s
  * dynamic file pruning rewrites: the executed IN-list reaches the
  * manifest's per-file stats (and Bloom sidecars) and each recursion
  * level opens O(matching files) of a range-clustered table instead
  * of all of them — on a 100 TB table, the difference between 12
  * directory pings and 12 full scans (TableRecursiveSpec asserts the
  * per-level file count).
  *
  * The frontier itself is collected per level — bounded by the live
  * CHAIN count, not the corpus (key-chasing recursions carry only the
  * frontier; the contract query's is ≤ 32 rows). `frontierCap` guards
  * the collect: a frontier that outgrows it falls back to the
  * distributed join against the same lazy scan (correct at any size,
  * band-pruned at best) instead of materializing on the driver.
  */
object TableRecursive {

  private case class Key(session: Int, sfDir: String)
  private val tables = new graft.util.BoundedMemo[Key, String](4, _ => ())

  /** The contract fixture: orders' key column committed as a vtable,
    * range-clustered on o_orderkey across 8 files so a small key set
    * prunes to 1 of 8 (the clustered layout a maintenance loop keeps
    * on a long-lived table — same convention as [[TableSkip]]).
    */
  private def builtTable(t: Tables): String =
    tables.getOrBuild(Key(System.identityHashCode(t.spark), t.sfDir)) {
      val dir = graft.util.TempDirs.createWithCleanup("graft-trec") + "/orders_rk"
      val vt = VersionedTable(t.spark, dir)
      vt.append(t.orders.select(col("o_orderkey"))
        .repartitionByRange(8, col("o_orderkey")))
      dir
    }

  /** Chase key chains through `vt`: seed rows are `keyCol` values
    * matching `seedCond` (pushed into the pruned scan), and each level
    * follows `step(k)` for every live chain, surviving only where the
    * stepped key exists in the table. Returns every visited
    * (start_k, k, depth) node. Levels run until the frontier dies or
    * `maxDepth` — the cap is declared semantics, the same production
    * guard as [[graft.operators.Relational.qRecursiveCte]].
    */
  def chaseChains(vt: VersionedTable, keyCol: String, seedCond: Column,
      step: Column => Column, maxDepth: Int,
      frontierCap: Int = 100000): DataFrame = {
    val spark = vt.spark
    val schema = StructType(Seq(StructField("start_k", LongType, nullable = false),
      StructField("k", LongType, nullable = false),
      StructField("depth", IntegerType, nullable = false)))
    def frame(rows: Seq[Row]): DataFrame =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val dimSchema = StructType(Seq(
      StructField("start_k", LongType, nullable = false),
      StructField("k", LongType, nullable = false)))
    // the stepped key must surface as a dim ATTRIBUTE (a Project below
    // the join), not an expression in the join condition — the DFP
    // rule recognizes EqualTo(markerAttr, dimAttr) only
    def stepped(live: DataFrame): DataFrame =
      live.select(col("start_k"), step(col("k")).cast("long").as("k2"))
    // level 0: the seed predicate collapses into the stats-pruned scan
    var frontier: Seq[Row] = vt.readWhere(seedCond)
      .select(col(keyCol).cast("long")).collect()
      .map(r => Row(r.getLong(0), r.getLong(0), 0)).toSeq
    val visited = scala.collection.mutable.ArrayBuffer(frontier)
    var depth = 0
    var spilled: Option[DataFrame] = None // distributed fallback, if ever
    while (frontier.nonEmpty && spilled.isEmpty && depth < maxDepth) {
      depth += 1
      // a true LocalRelation (List overload), NOT an RDD-backed frame:
      // the DFP rule's snapshot-stability check admits LocalRelation
      // leaves and refuses LogicalRDD
      val dim = spark.createDataFrame(
        java.util.Arrays.asList(
          frontier.map(r => Row(r.getLong(0), r.getLong(1))): _*), dimSchema)
      // marker ⋈ tiny stepped dim: VTableScanRule's dynamic pruning
      // derives the executed IN-list from the dim and expands the
      // marker to only the admitting files, per level
      val lvl = vt.scan().join(stepped(dim), col(keyCol) === col("k2"))
        .select(col("start_k"), col("k2").as("k"), lit(depth).as("depth"))
      if (frontier.length > frontierCap) {
        // oversized frontier: stop collecting, finish distributed —
        // the remaining levels join frame-to-scan without driver hops
        var live = lvl.localCheckpoint()
        var acc: DataFrame = live
        var d = depth
        while (d < maxDepth) {
          d += 1
          val nxt = vt.scan().join(stepped(live), col(keyCol) === col("k2"))
            .select(col("start_k"), col("k2").as("k"), lit(d).as("depth"))
            .localCheckpoint()
          acc = acc.unionByName(nxt)
          live = nxt
        }
        spilled = Some(acc)
      } else {
        frontier = lvl.collect().toSeq
        visited += frontier
      }
    }
    val collectedPart = frame(visited.toSeq.flatten)
    spilled.fold(collectedPart)(collectedPart.unionByName(_))
  }

  /** Contract query — the vtable twin of `q_recursive_cte` with the
    * SAME chain semantics (odd seeds ≤ 64, key-doubling steps, depth
    * cap 12), oracled by the identical recursive SQL over orders: file
    * pruning must never change WHICH nodes a chase visits. The
    * distributed fallback in [[chaseChains]] never triggers here (≤ 32
    * chains); TableRecursiveSpec separately proves each level's scan
    * opened a strict subset of the table's files.
    */
  def qRecursiveVtable(t: Tables): DataFrame = {
    val vt = VersionedTable(t.spark, builtTable(t))
    chaseChains(vt, "o_orderkey",
      col("o_orderkey") % 2 === 1 && col("o_orderkey") <= 64,
      step = _ * 2, maxDepth = 12)
      .groupBy("start_k")
      .agg(max("depth").as("chain_len"), count(lit(1)).as("n_nodes"))
      .orderBy("start_k")
  }
}
