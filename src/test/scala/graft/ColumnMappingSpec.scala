package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Column renames via name-mode column mapping: a rename is a
  * metadata-only commit (the field keeps its PHYSICAL storage name in
  * metadata), data files are never rewritten, reads map stored→
  * logical, stats re-key in the same commit, and time travel keeps
  * old names at old versions.
  */
class ColumnMappingSpec extends SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-cmap").toString + "/t"

  test("rename round-trips: reads, new writes, time travel, skipping") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    // 3 disjoint-range files so skipping is observable
    (0 until 3).foreach(i => t.append(
      Seq.tabulate(10)(j => ((i * 100 + j).toLong, s"r$i-$j")).toDF("id", "name").coalesce(1)))
    val vBefore = t.currentVersion
    t.renameColumn("id", "doc_id")
    assert(t.read().columns.toSeq == Seq("doc_id", "name"))
    assert(t.read().select("doc_id").collect().map(_.getLong(0)).sorted.length == 30)
    // time travel keeps the old name
    assert(t.read(vBefore).columns.toSeq == Seq("id", "name"))
    // new appends use the NEW logical name; old + new files read together
    t.append(Seq((300L, "new")).toDF("doc_id", "name").coalesce(1))
    assert(t.read().count() == 31)
    assert(t.read().where(col("doc_id") === 300L).head().getString(1) == "new")
    // stats re-keyed: skipping on the renamed column still prunes and
    // is result-identical to the plain filter
    val skipped = t.readWhere(col("doc_id").between(100L, 109L))
    assert(skipped.collect().map(_.getLong(0)).sorted.toSeq == (100L to 109L))
    // the old name is gone from the current schema
    intercept[org.apache.spark.sql.AnalysisException] {
      t.read().select("id").collect()
    }
    ()
  }

  test("metadata aggregates, scan, and profile speak the new name") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.append(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").coalesce(1))
    t.renameColumn("k", "key")
    t.scan().createOrReplaceTempView("__graft_cmap_meta")
    val r = spark.sql(
      "SELECT count(*) AS n, count(key) AS nk, min(key) AS lo, max(key) AS hi FROM __graft_cmap_meta").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2 && r.getLong(2) == 1 && r.getLong(3) == 2)
    // lazy-scan DFP-style filters through SQL also prune on the new name
    val one = spark.sql("SELECT v FROM __graft_cmap_meta WHERE key = 2")
    assert(one.head().getDouble(0) == 20.0)
  }

  test("merge and delete keyed on a renamed column span vintages") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "val").coalesce(1))
    t.renameColumn("id", "pk")
    t.merge(Seq((2L, "B"), (4L, "d")).toDF("pk", "val"), "pk")
    assert(t.read().collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
    t.delete(Seq(1L).toDF("pk"), "pk")
    assert(t.read().collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L, 4L))
    // compact keeps the mapping (old physical names) intact
    t.compact(targetBytes = 1L << 30)
    assert(t.read().columns.toSeq == Seq("pk", "val"))
    assert(t.read().count() == 3)
  }

  test("adding a column with a renamed column's OLD name gets distinct storage") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.append(Seq((1L, "x")).toDF("a", "v").coalesce(1))
    t.renameColumn("a", "b") // b's physical storage name is "a"
    // now ADD a brand-new logical "a" — it must not collide with b's storage
    t.appendEvolve(Seq((2L, "y", 99L)).toDF("b", "v", "a"))
    val rows = t.read().orderBy("b").collect()
    assert(t.read().columns.toSeq == Seq("b", "v", "a"))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // old row: new column null; new row: both columns distinct values
    assert(rows(0).isNullAt(2))
    assert(rows(1).getLong(0) == 2L && rows(1).getLong(2) == 99L)
  }

  test("change feed aligns across a rename by physical identity") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableCdf()
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name")) // v1
    t.renameColumn("id", "doc_id")                          // v2
    t.merge(Seq((2L, "B"), (3L, "c")).toDF("doc_id", "name"), "doc_id") // v3
    val feed = t.readChangesSince(0)
    assert(feed.columns.take(2).toSeq == Seq("doc_id", "name"))
    val rows = feed.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(r.fieldIndex(VersionedTable.ChangeTypeCol)))).toSet
    // pre-rename inserts feed the renamed column (NOT null-extended)
    assert(rows == Set(
      (1L, "a", "insert"), (2L, "b", "insert"),
      (2L, "b", "update_preimage"), (2L, "B", "update_postimage"),
      (3L, "c", "insert")), rows.toString)
    // readAppendsSince treats the rename as the zero-row commit it is
    assert(t.readAppendsSince(1, 2).count() == 0)
  }

  test("rename refusals: duplicates, missing, indexed, reserved") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableNdv(Seq("k"))
    t.append(Seq((1L, "a")).toDF("k", "v").coalesce(1))
    intercept[IllegalArgumentException] { t.renameColumn("k", "v") }
    intercept[IllegalArgumentException] { t.renameColumn("nope", "x") }
    intercept[IllegalArgumentException] { t.renameColumn("k", "k2") } // NDV-indexed
    intercept[IllegalArgumentException] { t.renameColumn("v", "_rows") }
    ()
  }

  test("dropColumn: metadata-only, time travel keeps it, re-add gets fresh storage") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.append(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "score").coalesce(1))
    val vBefore = t.currentVersion
    t.dropColumn("score")
    assert(t.read().columns.toSeq == Seq("id", "name"))
    assert(t.read().count() == 2)
    // time travel keeps the dropped column's values
    assert(t.read(vBefore).select("score").collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(10.0, 20.0))
    // new appends omit it (schema enforcement requires the new shape)
    t.append(Seq((3L, "c")).toDF("id", "name").coalesce(1))
    assert(t.read().count() == 3)
    // RE-ADD a column named score: fresh storage — old files' dropped
    // values must NOT resurrect (they read null)
    t.appendEvolve(Seq((4L, "d", 99.0)).toDF("id", "name", "score"))
    val byId = t.read().collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(byId(1L).isEmpty && byId(2L).isEmpty && byId(3L).isEmpty,
      s"dropped values resurrected: $byId")
    assert(byId(4L).contains(99.0))
    // merge after the re-add keeps both vintages straight
    t.merge(Seq((1L, "A", 1.5)).toDF("id", "name", "score"), "id")
    val r1 = t.read().where(col("id") === 1L).head()
    assert(r1.getString(1) == "A" && r1.getDouble(2) == 1.5)
    // drop refusals
    intercept[IllegalArgumentException] { t.dropColumn("nope") }
    val t2 = VersionedTable(spark, tmp())
    t2.append(Seq(Tuple1(1L)).toDF("only").coalesce(1))
    intercept[IllegalArgumentException] { t2.dropColumn("only") }
    ()
  }

  test("drop of a RENAMED column retires its original storage name") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.append(Seq((1L, 5L)).toDF("a", "keep").coalesce(1))
    t.renameColumn("a", "b")
    t.dropColumn("b") // physical storage was "a"
    // re-adding logical "a" must get fresh storage, not the old bytes
    t.appendEvolve(Seq((7L, 100L)).toDF("keep", "a"))
    val rows = t.read().orderBy("keep").collect()
    assert(t.read().columns.toSeq == Seq("keep", "a"))
    assert(rows(0).getLong(0) == 5L && rows(0).isNullAt(1),
      s"dropped storage resurrected: ${rows.toSeq}")
    assert(rows(1).getLong(0) == 7L && rows(1).getLong(1) == 100L)
  }

  test("overwrite resets the mapping (fresh schema, no stale physical names)") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.append(Seq((1L, "a")).toDF("a", "v").coalesce(1))
    t.renameColumn("a", "b")
    t.overwrite(Seq((7L, 8L)).toDF("a", "b").coalesce(1)) // fresh columns, incl. reused names
    assert(t.read().collect().toSeq == Seq(Row(7L, 8L)))
    assert(t.readWhere(col("b") === 8L).count() == 1)
  }
}
