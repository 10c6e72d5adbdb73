package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Shallow-clone semantics: zero-copy creation, isolation in both
  * directions, vacuum never reaching across table boundaries, stats
  * and constraints carrying over, and OPTIMIZE as gradual
  * materialization.
  */
class CloneSpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-clone").toString

  private def parquetFilesUnder(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) return Seq.empty
    val s = Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq
    } finally s.close()
  }

  test("clone is zero-copy and reads the source snapshot exactly") {
    import spark.implicits._
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"))
    val clone = src.cloneTo(s"$root/clone")
    assert(clone.read().collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L, 3L)))
    // zero-copy: the clone directory holds a manifest, no data bytes
    assert(parquetFilesUnder(s"$root/clone").isEmpty,
      "clone wrote data files — not a shallow clone")
  }

  test("divergence is isolated in both directions, incl. COW rewrites") {
    import spark.implicits._
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"))
    val clone = src.cloneTo(s"$root/clone")
    clone.append(Seq((4L, "d")).toDF("id", "name"))
    // COW delete rewrites the shared file into a clone-local one
    clone.deleteWhere(col("id") === 2L)
    assert(clone.read().collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 3L, 4L)))
    // the source never moved
    assert(src.read().collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L, 3L)))
    // and source writes don't appear in the clone
    src.append(Seq((9L, "z")).toDF("id", "name"))
    assert(!clone.read().collect().map(_.getLong(0)).contains(9L))
  }

  test("vacuum on the clone never deletes source-owned files") {
    import spark.implicits._
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val srcFiles = parquetFilesUnder(s"$root/src")
    val clone = src.cloneTo(s"$root/clone")
    // drop every external reference (overwrite replaces the snapshot),
    // then vacuum the clone's history down to the head
    clone.overwrite(Seq((7L, "x")).toDF("id", "name"))
    clone.vacuum(retainVersions = 1, force = true)
    assert(parquetFilesUnder(s"$root/src").toSet == srcFiles.toSet,
      "clone vacuum reached into the source directory")
    assert(src.read().count() == 2)
  }

  test("per-file stats carry: data skipping prunes on the clone from v1") {
    import spark.implicits._
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    // two appends → two files with disjoint id ranges
    src.append(Seq((1L, "lo"), (2L, "lo")).toDF("id", "name").coalesce(1))
    src.append(Seq((100L, "hi"), (101L, "hi")).toDF("id", "name").coalesce(1))
    val clone = src.cloneTo(s"$root/clone")
    val pruned = clone.readWhere(col("id") >= 100L)
    assert(pruned.collect().map(_.getLong(0)).sorted.sameElements(Array(100L, 101L)))
    // the pruned scan must open strictly fewer files than the snapshot
    assert(pruned.inputFiles.length == 1,
      s"carried stats did not prune: ${pruned.inputFiles.toSeq}")
  }

  test("CHECK constraints carry to the clone") {
    import spark.implicits._
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.append(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"))
    src.addConstraint("pos_price", "price > 0")
    val clone = src.cloneTo(s"$root/clone")
    assert(clone.constraintList.map(_._1) == Seq("pos_price"))
    intercept[IllegalArgumentException] {
      clone.append(Seq((3L, -5.0)).toDF("id", "price"))
    }
  }

  test("legacy sidecar constraints carry to the clone with enforcement intact") {
    import spark.implicits._
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.append(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"))
    // simulate a pre-versioned-constraints table: constraints only in
    // the unversioned sidecar, no node in any manifest — a manifest-only
    // resolver would clone this with CHECK enforcement silently dropped
    Files.write(Paths.get(s"$root/src", "_graft_log", "_constraints"),
      """{"pos_price":"price > 0"}""".getBytes)
    val clone = src.cloneTo(s"$root/clone")
    assert(clone.constraintList == Seq("pos_price" -> "price > 0"),
      "legacy-sidecar constraints must carry to the clone")
    intercept[IllegalArgumentException] {
      clone.append(Seq((3L, -5.0)).toDF("id", "price"))
    }
  }

  test("clone commits record provenance: source dir + source version") {
    import spark.implicits._
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.append(Seq((1L, "a")).toDF("id", "v"))
    src.append(Seq((2L, "b")).toDF("id", "v"))
    val clone = src.cloneTo(s"$root/clone", 1)
    assert(clone.cloneProvenance(1) ==
      Some((Paths.get(s"$root/src").toAbsolutePath.normalize.toString, 1)))
    // a non-clone commit has none
    assert(src.cloneProvenance(1).isEmpty)
  }

  test("compaction materializes external references into local files") {
    import spark.implicits._
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1))
    src.append(Seq((3L, "c")).toDF("id", "name").coalesce(1))
    val clone = src.cloneTo(s"$root/clone")
    clone.compact(targetBytes = Long.MaxValue)
    val rels = clone.fileList(clone.currentVersion)
    assert(rels.nonEmpty && rels.forall(!_.startsWith("/")),
      s"external refs survived OPTIMIZE: $rels")
    assert(clone.read().collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L, 3L)))
    // the deep-copied clone now outlives the source
    assert(parquetFilesUnder(s"$root/clone").nonEmpty)
  }

  test("the retired-storage ledger carries: a dropped column re-added on the clone reads null") {
    import spark.implicits._
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.append(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("id", "name", "score").coalesce(1))
    src.dropColumn("score")
    val clone = src.cloneTo(s"$root/clone")
    // re-adding `score` ON THE CLONE must get fresh storage — the
    // clone still references the source's pre-drop files
    clone.appendEvolve(Seq((3L, "c", 99.0)).toDF("id", "name", "score"))
    val byId = clone.read().collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(byId(1L).isEmpty && byId(2L).isEmpty,
      s"dropped values resurrected through the clone: $byId")
    assert(byId(3L).contains(99.0))
  }

  test("CDF enablement carries: the clone's own rewrites feed from commit 2") {
    import spark.implicits._
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    src.enableCdf()
    val clone = src.cloneTo(s"$root/clone")
    assert(clone.cdfEnabled, "change tracking is a table property — it carries")
    clone.deleteWhere(col("id") === 1L)
    val feed = clone.readChangesSince(1).collect()
    assert(feed.length == 1 && feed.head.getAs[String]("_change_type") == "delete")
  }

  test("deep clone owns all its bytes and outlives source deletion") {
    import spark.implicits._
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val deep = src.deepCloneTo(s"$root/deep")
    assert(deep.fileList(deep.currentVersion).forall(!_.startsWith("/")),
      "deep clone must hold no external references")
    // delete the SOURCE's data outright — the deep clone still reads
    parquetFilesUnder(s"$root/src").foreach(p =>
      Files.delete(java.nio.file.Paths.get(p)))
    assert(deep.read().collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L)))
    // v1 (the shallow stage) remains in history as the audited step
    assert(deep.currentVersion == 2)
  }

  test("clone of a time-travel version and self/existing-dest refusals") {
    import spark.implicits._
    val root = tmp()
    val src = VersionedTable(spark, s"$root/src")
    src.append(Seq((1L, "a")).toDF("id", "name"))
    src.append(Seq((2L, "b")).toDF("id", "name"))
    val cloneV1 = src.cloneTo(s"$root/clone_v1", version = 1)
    assert(cloneV1.read().collect().map(_.getLong(0)).sameElements(Array(1L)))
    intercept[IllegalArgumentException] { src.cloneTo(s"$root/src") }
    intercept[IllegalArgumentException] { src.cloneTo(s"$root/clone_v1") }
  }
}
