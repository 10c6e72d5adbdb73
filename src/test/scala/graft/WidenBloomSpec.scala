package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit, xxhash64}
import org.apache.spark.sql.types._

import graft.sources.VersionedTable

/** Bloom indexes across type-widening evolution: sidecars record
  * their BUILD type per file (stats key `__bt_<col>`), every probe
  * site hashes in the file's own era, and a probe value that isn't
  * representable in a file's value type refutes the file outright.
  * This is what lets `appendEvolve` widen a bloom-indexed column
  * without rewriting a single old file or losing a single prune.
  */
class WidenBloomSpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-widen-bloom").toString + "/t"

  /** Three int-era single-file batches with fully overlapping key
    * ranges (range pruning alone can never carry a file), then an
    * int→long widening append whose key needs the wider type.
    */
  private def widened(dir: String): VersionedTable = {
    import spark.implicits._
    val t = VersionedTable(spark, dir)
    t.enableBloom(Seq("k"), expectedItemsPerFile = 1000, fpp = 0.001)
    (0 until 3).foreach { i =>
      t.append(Seq(10 + i, 20 + i, 30 + i).map(k => (k, s"b$i"))
        .toDF("k", "v").repartition(1))
    }
    t.appendEvolve(Seq((4100000000L, "wide"), (21L, "dup21"))
      .toDF("k", "v").repartition(1))
    t
  }

  test("interpreted probe hash matches the codegen'd build hash, per type") {
    // the sidecar build runs functions.xxhash64 (codegen); probes run
    // XxHash64Function driver-side — the contract is bit-equality
    val want = spark.range(1).select(
      xxhash64(lit(21).cast(ByteType)),
      xxhash64(lit(21).cast(ShortType)),
      xxhash64(lit(21).cast(IntegerType)),
      xxhash64(lit(21).cast(LongType)),
      xxhash64(lit(1.5f).cast(FloatType)),
      xxhash64(lit(1.5).cast(DoubleType)),
      xxhash64(lit("k05-b2"))).head()
    def one(v: Any, dt: DataType): Long = {
      val hs = VersionedTable.probeHashes(Seq(v), dt)
      assert(hs.isDefined && hs.get.length == 1, s"$v as $dt")
      hs.get.head
    }
    assert(one(21L, ByteType) == want.getLong(0))
    assert(one(21L, ShortType) == want.getLong(1))
    assert(one(21L, IntegerType) == want.getLong(2))
    assert(one(21L, LongType) == want.getLong(3))
    assert(one(1.5, FloatType) == want.getLong(4))
    assert(one(1.5, DoubleType) == want.getLong(5))
    assert(one("k05-b2", StringType) == want.getLong(6))
    // out-of-domain values drop (→ refutation), not wrap
    assert(VersionedTable.probeHashes(Seq(4100000000L), IntegerType).get.isEmpty)
    assert(VersionedTable.probeHashes(Seq(300L), ByteType).get.isEmpty)
    assert(VersionedTable.probeHashes(Seq(0.1), FloatType).get.isEmpty)
    assert(VersionedTable.probeHashes(Seq(1.5), FloatType).get.nonEmpty)
  }

  test("point lookups keep pruning across an int→long widening") {
    val t = widened(tmp())
    assert(t.read().schema("k").dataType == LongType)
    // an int-era key: bloom admits exactly its own file plus the new
    // long file that repeated the value (ranges all overlap on 21)
    val hit = t.readWhere(col("k") === 21L)
    assert(hit.count() == 2)
    assert(hit.inputFiles.length == 2, hit.inputFiles.mkString(","))
    // a different int-era key, present once: one file opened
    val one = t.readWhere(col("k") === 30L)
    assert(one.count() == 1 && one.inputFiles.length == 1)
    // a key beyond int range REFUTES every int-era file without even
    // touching a sidecar — only the long-era file opens
    val wide = t.readWhere(col("k") === 4100000000L)
    assert(wide.count() == 1)
    assert(wide.inputFiles.length == 1, wide.inputFiles.mkString(","))
    // absent keys read nothing, both eras
    assert(t.readWhere(col("k") === 99L).count() == 0)
    assert(t.readWhere(col("k") === 5100000000L).count() == 0)
  }

  test("DELETE and MERGE with widened keys carry other-era files by path") {
    import spark.implicits._
    val t = widened(tmp())
    val before = t.fileList(t.currentVersion)
    assert(before.size == 4)
    // deleting the wide key rewrites ONLY the long-era file: every
    // int-era file is refuted by representability, not rewritten
    t.delete(Seq(4100000000L).toDF("k"), "k")
    val afterDelete = t.fileList(t.currentVersion)
    assert(before.toSet.intersect(afterDelete.toSet).size == 3)
    assert(t.read().count() == 10)
    assert(t.read().where(col("k") === 4100000000L).count() == 0)
    // merging an int-era key touches its one admitting file (21 was
    // just deleted from the long era's file... 22 lives in batch 2)
    val beforeMerge = t.fileList(t.currentVersion)
    t.merge(Seq((22L, "updated")).toDF("k", "v"), "k")
    val afterMerge = t.fileList(t.currentVersion)
    assert(beforeMerge.toSet.intersect(afterMerge.toSet).size == beforeMerge.size - 1)
    assert(t.read().where(col("k") === 22L).head().getString(1) == "updated")
  }

  test("NDV-indexed integral columns widen; cross-era unions never double-count") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableNdv(Seq("k"))
    // int era: 5 distinct keys
    t.append((1 to 5).map(i => (i, s"v$i")).toDF("k", "v"))
    assert(t.approxNdv("k").contains(5L))
    // widening append with OVERLAPPING keys (3,4,5 recur as longs):
    // Spark's sketch agg hashes every integral input as long, so the
    // int-era and long-era sidecars union to the exact distinct count
    // — a type-dependent hash would read ~11 here, not 8
    t.appendEvolve((3L to 8L).map(i => (i, s"w$i")).toDF("k", "v"))
    assert(t.read().schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(t.approxNdv("k").contains(8L), t.approxNdv("k").toString)
    // and the pre-widening snapshot still answers in its own era
    assert(t.approxNdv("k", version = 1).contains(5L))
  }

  test("compact after widening rebuilds sidecars in the wide era; probes stay exact") {
    val t = widened(tmp())
    t.compact(targetBytes = 1L << 30) // packs every era into one file
    assert(t.read().count() == 11)
    val hit = t.readWhere(col("k") === 21L)
    assert(hit.count() == 2)
    assert(hit.inputFiles.length == 1, hit.inputFiles.mkString(","))
    // absent key inside the packed range: only the fresh bigint-era
    // sidecar can refute it
    assert(t.readWhere(col("k") === 99L).count() == 0)
    assert(t.readWhere(col("k") === 4100000000L).count() == 1)
  }

  test("change feed reads across a widening append") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableCdf()
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    t.appendEvolve(Seq((5000000000L, "c")).toDF("k", "v"))
    val ch = t.readChangesSince(0)
    assert(ch.schema("k").dataType == LongType)
    val inserts = ch.where(col(VersionedTable.ChangeTypeCol) === "insert")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(inserts == Set(1L, 2L, 5000000000L))
  }

  test("widening stamps carried files that predate build-type records") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    val t = widened(dir)
    // every snapshot file carries a build tag: the int-era files via
    // aggStats (and the appendEvolve stamp is a no-op over them), the
    // long-era file its own
    val m = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(java.nio.file.Paths.get(dir, "_graft_log",
        f"v${t.currentVersion}%08d.json").toFile)
    val tags = m.get("stats").properties().iterator().asScala
      .map(e => Option(e.getValue.get("__bt_k")).map(_.asText).orNull).toSeq
    assert(tags.count(_ == "int") == 3, tags.mkString(","))
    assert(tags.count(_ == "bigint") == 1, tags.mkString(","))
  }
}
