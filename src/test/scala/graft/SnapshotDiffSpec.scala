package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Retroactive snapshot diff (`VersionedTable.snapshotDiff` + the
  * `table_diff` TVF): row-level delta between any two versions with
  * no change tracking, manifest-pruned to the files unique to either
  * side (SURVEY §2.2).
  */
class SnapshotDiffSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshTable(tag: String): VersionedTable = {
    val dir = Files.createTempDirectory(s"graft-sdiff-$tag").toString + "/t"
    VersionedTable(spark, dir)
  }

  private def classes(df: org.apache.spark.sql.DataFrame): Set[(Long, Double, String)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet

  test("diff classifies inserts, deletes, and updates; unchanged rows drop") {
    val vt = freshTable("classes")
    vt.append((1 to 6).map(i => (i.toLong, i * 10.0)).toDF("k", "v")) // v1
    vt.merge(Seq((2L, 999.0), (7L, 70.0)).toDF("k", "v"), "k")       // v2: upd + ins
    vt.delete(Seq(Tuple1(3L)).toDF("k"), "k")                        // v3: del
    val got = classes(vt.snapshotDiff(1, 3, "k").select("k", "v", "_change_type"))
    assert(got == Set(
      (2L, 20.0, "update_preimage"), (2L, 999.0, "update_postimage"),
      (7L, 70.0, "insert"),
      (3L, 30.0, "delete")), got.toString)
    // identity: diffing a version against itself is empty
    assert(vt.snapshotDiff(3, 3, "k").count() == 0)
    // direction matters: the reverse diff swaps the classes
    val rev = classes(vt.snapshotDiff(3, 1, "k").select("k", "v", "_change_type"))
    assert(rev.contains((3L, 30.0, "insert")) && rev.contains((7L, 70.0, "delete")))
  }

  test("manifest pruning: files common to both versions are never read") {
    val vt = freshTable("prune")
    // two well-separated appends → two disjoint file sets
    vt.append((1 to 100).map(i => (i.toLong, i * 1.0)).toDF("k", "v"))      // v1
    vt.append((201 to 300).map(i => (i.toLong, i * 1.0)).toDF("k", "v"))    // v2
    // v3 touches ONLY the high range (the v1 files carry untouched)
    vt.merge(Seq((250L, -1.0)).toDF("k", "v"), "k")                          // v3
    val diff = vt.snapshotDiff(2, 3, "k")
    val read = diff.inputFiles.toSet
    // the v1 files are common to v2 and v3 — none may be scanned
    val v1Files = vt.read(1).inputFiles.toSet
    assert(v1Files.nonEmpty && read.intersect(v1Files).isEmpty,
      s"common files leaked into the diff scan: ${read.intersect(v1Files)}")
    assert(classes(diff.select("k", "v", "_change_type")) ==
      Set((250L, 250.0, "update_preimage"), (250L, -1.0, "update_postimage")))
  }

  test("schema evolution across the window: the old side null-extends to the new schema") {
    val vt = freshTable("evolve")
    vt.append(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")) // v1
    vt.addColumn("tag", org.apache.spark.sql.types.StringType) // v2
    vt.merge(Seq((2L, 21.0, "new")).toDF("k", "v", "tag"), "k") // v3
    val got = vt.snapshotDiff(1, 3, "k").select("k", "v", "tag", "_change_type")
      .collect().map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)), r.getString(3))).toSet
    assert(got == Set(
      (2L, 20.0, None, "update_preimage"),
      (2L, 21.0, Some("new"), "update_postimage")), got.toString)
  }

  test("table_diff TVF serves the same frame over SQL") {
    val vt = freshTable("tvf")
    vt.append(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
    vt.merge(Seq((2L, 22.0)).toDF("k", "v"), "k")
    vt.scan().createOrReplaceTempView("sdiff_tvf_t")
    val viaSql = spark.sql(
      s"SELECT k, v, _change_type FROM table_diff('${vt.dir}', 1, 2, 'k') ORDER BY _change_type")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(viaSql == Seq((2L, 22.0, "update_postimage"), (2L, 2.0, "update_preimage")))
    // registered-view spelling resolves through the catalog too
    assert(spark.sql(
      "SELECT count(*) AS n FROM table_diff('sdiff_tvf_t', 1, 2, 'k')")
      .head().getLong(0) == 2L)
  }

  test("diff output replays through applyChanges: a replica seeded at v1 converges to v2") {
    val vt = freshTable("replay-src")
    vt.append((1 to 10).map(i => (i.toLong, i * 1.0)).toDF("k", "v"))
    val v1Snapshot = vt.read(1)
    vt.merge(Seq((3L, 33.0), (11L, 11.0)).toDF("k", "v"), "k")
    vt.delete(Seq(Tuple1(5L)).toDF("k"), "k")
    val head = vt.currentVersion
    val replica = freshTable("replay-dst")
    replica.append(v1Snapshot)
    // the diff IS a change feed: key as orderBy (one change per key)
    replica.applyChanges(vt.snapshotDiff(1, head, "k"), "k", "k")
    assert(replica.read().collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      vt.read().collect().map(r => (r.getLong(0), r.getDouble(1))).toSet)
  }
}
