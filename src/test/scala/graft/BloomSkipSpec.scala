package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.sources.VersionedTable

/** Per-file Bloom index contract: point lookups skip files whose
  * sidecar filter proves them key-free, in exactly the layout where
  * range stats are powerless — every file's [min,max] spans the whole
  * key domain (the uuid-key case).
  */
class BloomSkipSpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-bloom").toString + "/t"

  /** Four single-file batches whose key ranges ALL overlap: batch i
    * holds keys k00-bi … k09-bi, so every file's range is ≈[k00,k09]
    * and range pruning alone can never carry a file.
    */
  private def seeded(dir: String): VersionedTable = {
    import spark.implicits._
    val t = VersionedTable(spark, dir)
    t.enableBloom(Seq("k"), expectedItemsPerFile = 1000, fpp = 0.001)
    (0 until 4).foreach { i =>
      t.append((0 until 10).map(j => (f"k$j%02d-b$i", i.toLong * 100 + j))
        .toDF("k", "v").repartition(1))
    }
    t
  }

  test("key-set DELETE rewrites only the file the filter admits") {
    import spark.implicits._
    val t = seeded(tmp())
    val before = t.fileList(t.currentVersion)
    assert(before.size == 4)
    t.delete(Seq("k05-b2").toDF("k"), "k")
    val after = t.fileList(t.currentVersion)
    // ranges overlap everywhere — only the bloom can prove three of
    // the four files key-free, so they carry by exact path
    assert(before.toSet.intersect(after.toSet).size == 3,
      s"expected 3 carried files, got ${before.toSet.intersect(after.toSet).size}")
    assert(t.read().count() == 39)
    assert(t.read().where(col("k") === "k05-b2").count() == 0)
  }

  test("MERGE touches only the admitting file; fresh inserts still land") {
    import spark.implicits._
    val t = seeded(tmp())
    val before = t.fileList(t.currentVersion)
    t.merge(Seq(("k03-b1", 9999L), ("zz-new", 7L)).toDF("k", "v"), "k")
    val after = t.fileList(t.currentVersion)
    // "zz-new" is outside every file's range (range-pruned); "k03-b1"
    // bloom-hits only batch 1's file → exactly 3 files carried
    assert(before.toSet.intersect(after.toSet).size == 3)
    assert(t.read().where(col("k") === "k03-b1").head().getLong(1) == 9999L)
    assert(t.read().where(col("k") === "zz-new").count() == 1)
    assert(t.read().count() == 41)
  }

  test("readWhere point lookup opens one file; non-point predicates unaffected") {
    val t = seeded(tmp())
    val hit = t.readWhere(col("k") === "k07-b3")
    assert(hit.count() == 1 && hit.head().getLong(1) == 307L)
    // the scan actually opened ONE parquet file, not four
    assert(hit.inputFiles.length == 1, hit.inputFiles.mkString(","))
    // a range predicate can't use the filter — still opens all files,
    // still answers exactly
    val range = t.readWhere(col("k") >= "k08")
    assert(range.count() == 8)
    assert(range.inputFiles.length == 4)
    // a probe for an absent key reads nothing at all
    assert(t.readWhere(col("k") === "k99-zz").count() == 0)
  }

  test("huge key sets skip the filter probe but stay correct") {
    import spark.implicits._
    val t = seeded(tmp())
    val big = (0 until VersionedTable.MaxBloomProbeKeys + 5)
      .map(i => f"absent-$i%06d").toDF("k")
    t.delete(big.union(Seq("k01-b0").toDF("k")), "k") // over the probe cap
    assert(t.read().count() == 39)
    assert(t.read().where(col("k") === "k01-b0").count() == 0)
  }

  test("vacuum takes dead files' sidecars; live files keep theirs") {
    import spark.implicits._
    val dir = tmp()
    val t = seeded(dir)
    def sidecars() = {
      val root = Paths.get(dir)
      val s = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.getFileName.toString.contains(".bloom-"))
      } finally s.close()
    }
    assert(sidecars() == 4)
    t.delete(Seq("k05-b2").toDF("k"), "k") // rewrites b2's file (+ its own fresh bloom)
    t.vacuum(retainVersions = 1)
    // b2's dead original (and only it) lost its sidecar; 3 carried
    // originals + the rewritten file keep theirs
    assert(sidecars() == 4, s"got ${sidecars()}")
    assert(t.read().count() == 39)
  }
}
