package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.{TableRecursive, VersionedTable}

/** The frontier-chasing recursion over a vtable: every level's join
  * must open only the files the frontier's stepped keys can touch
  * (DFP through the LocalRelation dim), and pruning must never change
  * which nodes the chase visits (same output as the declarative
  * WITH RECURSIVE and as the distributed fallback path).
  */
class TableRecursiveSpec extends SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-trec-spec").toString + "/t"

  /** Files the final physical plan opens — through AQE wrappers. */
  private def scanFiles(df: DataFrame): Int = {
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def go(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case q: QueryStageExec        => go(q.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other => (other.children ++ other.subqueries).flatMap(go)
    }
    go(df.queryExecution.executedPlan).map(_.relation.location.inputFiles.length).sum
  }

  /** Eight single-file appends with disjoint key ranges [i*100, i*100+19]. */
  private def eightFiles(): VersionedTable = {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    (0 until 8).foreach(i => t.append(
      Seq.tabulate(20)(j => (i * 100 + j).toLong).toDF("k").coalesce(1)))
    t
  }

  test("each recursion level's scan opens only the frontier's admitting files") {
    val t = eightFiles()
    // the chase's per-level shape: the stepped frontier keys as an
    // executed IN-list on the lazy scan — all land in file 3's
    // [300, 319] range
    val lvl = t.scan().filter(col("k").isin(300L, 304L, 308L))
      .groupBy(col("k")).count()
    assert(lvl.count() == 3)
    assert(scanFiles(lvl) == 1,
      s"level scan should open 1 of 8 files, opened ${scanFiles(lvl)}")
    // the DFP dim-join form (the fallback path's shape when the dim is
    // a LocalRelation) prunes the same way
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val dim = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, 150L), Row(3L, 152L), Row(5L, 154L)),
      StructType(Seq(StructField("start_k", LongType, nullable = false),
        StructField("k", LongType, nullable = false))))
      .select(col("start_k"), (col("k") * 2).cast("long").as("k2"))
    val joined = t.scan().join(dim, col("k") === col("k2"))
    assert(joined.count() == 3)
    assert(scanFiles(joined) == 1,
      s"level join should open 1 of 8 files, opened ${scanFiles(joined)}")
  }

  test("the vtable chase visits exactly the nodes the declarative recursion visits") {
    val viaVtable = graft.sources.TableRecursive.qRecursiveVtable(tables)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val viaSql = graft.operators.Relational.qRecursiveCte(tables)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(viaVtable == viaSql)
    assert(viaVtable.nonEmpty)
  }

  test("the distributed fallback (oversized frontier) chases the same chains") {
    val t = eightFiles()
    def agg(df: DataFrame) = df.groupBy("start_k")
      .agg(max("depth").as("len"), count(lit(1)).as("n")).orderBy("start_k")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val collected = agg(TableRecursive.chaseChains(t, "k",
      col("k") <= 8 && col("k") % 2 === 1, _ * 2, maxDepth = 10))
    // frontierCap = 0: every level past the seed runs the distributed
    // frame-to-scan join instead of the collect/LocalRelation path
    val spilledPath = agg(TableRecursive.chaseChains(t, "k",
      col("k") <= 8 && col("k") % 2 === 1, _ * 2, maxDepth = 10,
      frontierCap = 0))
    assert(collected == spilledPath)
    // key-doubling inside [0,19]: 1→2→4→8→16, 3→6→12, 5→10, 7→14
    assert(collected == Seq((1L, 4, 5L), (3L, 2, 3L), (5L, 1, 2L), (7L, 1, 2L)))
  }
}
