package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.util.FoldCommit

/** The shared write-ahead roll-forward primitive, at the protocol
  * level: every step idempotent, recovery correct from both sides of
  * the commit point, and reader/writer sweep scoping — the invariants
  * the three index OPTIMIZEs all lean on.
  */
class FoldCommitSpec extends SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-foldc").toString

  private def writeTree(root: String, sub: String, buckets: Int,
      filesPer: Int): Unit = {
    import spark.implicits._
    (0 until filesPer).foreach { _ =>
      (0 until buckets).map(b => (b.toLong, s"r$b"))
        .toDF("b", "v").coalesce(1)
        .write.mode("append").partitionBy("b").parquet(s"$root/$sub")
    }
  }

  test("compactPartitionedTree: 1 file per dir, idempotent, rows intact") {
    val root = tmp()
    writeTree(root, "data", buckets = 4, filesPer = 3)
    val before = spark.read.parquet(s"$root/data").count()
    assert(FoldCommit.listDataFiles(Paths.get(root, "data")).size == 12)
    val n = FoldCommit.compactPartitionedTree(spark, root, "data", "b")
    assert(n == before)
    assert(FoldCommit.listDataFiles(Paths.get(root, "data")).size == 4)
    assert(spark.read.parquet(s"$root/data").count() == before)
    // already compact: no-op
    assert(FoldCommit.compactPartitionedTree(spark, root, "data", "b") == 0L)
  }

  test("recovery completes a committed fold exactly once, even run twice") {
    val root = tmp()
    writeTree(root, "data", buckets = 2, filesPer = 2)
    val total = spark.read.parquet(s"$root/data").count()
    val files = FoldCommit.listDataFiles(Paths.get(root, "data"))
    // stage a full rewrite + land the marker by hand (the crash point:
    // committed, nothing moved)
    spark.read.option("basePath", s"$root/data")
      .parquet(files.map(_.toString): _*)
      .repartition(col("b")).write.partitionBy("b")
      .parquet(FoldCommit.stageDir(root, "feed0001").toString)
    Files.write(Paths.get(root, "_fold_commit.txt"),
      (Seq("feed0001", "data") ++ files.map(f =>
        Paths.get(root).relativize(f).toString)).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(FoldCommit.recover(root))
    assert(spark.read.parquet(s"$root/data").count() == total)
    // READER recovery leaves the marker for the writer (deleting it
    // could race a live writer's newer claim); re-running is pure
    // no-ops — nothing doubles, nothing vanishes
    assert(Files.exists(Paths.get(root, "_fold_commit.txt")),
      "reader recovery must not delete the writer-owned marker")
    assert(FoldCommit.recover(root))
    assert(spark.read.parquet(s"$root/data").count() == total)
    assert(FoldCommit.listDataFiles(Paths.get(root, "data")).size == 2)
    // WRITER-mode recovery clears the marker; after that, a no-op
    assert(FoldCommit.recover(root, sweepStaging = true))
    assert(!Files.exists(Paths.get(root, "_fold_commit.txt")))
    assert(!FoldCommit.recover(root))
    assert(spark.read.parquet(s"$root/data").count() == total)
  }

  test("reader-mode recovery leaves a marker-less stage alone; writer-mode sweeps it") {
    val root = tmp()
    writeTree(root, "data", buckets = 2, filesPer = 1)
    val stage = FoldCommit.stageDir(root, "live0001")
    Files.createDirectories(stage)
    Files.write(stage.resolve("part-x.parquet"), Array[Byte](1, 2, 3))
    // a reader must NOT delete what might be the live writer's stage
    assert(!FoldCommit.recover(root))
    assert(Files.exists(stage.resolve("part-x.parquet")),
      "reader-mode recovery swept live staging")
    // the writer's own recovery sweeps the (now known-dead) stage
    assert(!FoldCommit.recover(root, sweepStaging = true))
    assert(!Files.exists(stage))
  }

  test("two concurrent committers: the claim serializes them, the loser is loud") {
    val root = tmp()
    writeTree(root, "data", buckets = 2, filesPer = 2)
    val total = spark.read.parquet(s"$root/data").count()
    val files = FoldCommit.listDataFiles(Paths.get(root, "data"))
    def stageFold(id: String): Unit = {
      spark.read.option("basePath", s"$root/data")
        .parquet(files.map(_.toString): _*)
        .repartition(col("b")).write.partitionBy("b")
        .parquet(FoldCommit.stageDir(root, id).toString)
    }
    // writer A: committed (marker landed) but not yet rolled forward —
    // the exact window a second writer would previously CLOBBER with
    // REPLACE_EXISTING, orphaning A's delete list forever
    stageFold("writera1")
    FoldCommit.DefaultStore.putIfAbsent(Paths.get(root, "_fold_commit.txt"),
      (Seq("writera1", "data") ++ files.map(f =>
        Paths.get(root).relativize(f).toString)).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8), "test fold a")
    // writer B loses the claim loudly; its deletes never run
    stageFold("writerb1")
    intercept[java.util.ConcurrentModificationException] {
      FoldCommit.commit(root, "writerb1", "data",
        files.map(f => Paths.get(root).relativize(f).toString))
    }
    assert(spark.read.parquet(s"$root/data").count() == total,
      "loser's commit touched the tree")
    // A's fold completes via recovery; B's dead stage sweeps writer-side
    assert(FoldCommit.recover(root, sweepStaging = true))
    assert(spark.read.parquet(s"$root/data").count() == total)
    assert(FoldCommit.listDataFiles(Paths.get(root, "data")).size == 2)
    assert(!Files.exists(Paths.get(root, "_fold")))
  }

  test("no-rename store: compaction commits through a simulated conditional PUT") {
    val root = tmp()
    writeTree(root, "data", buckets = 3, filesPer = 3)
    val before = spark.read.parquet(s"$root/data").count()
    val store = graft.sources.CommitStore.simulatedConditionalPut()
    val n = FoldCommit.compactPartitionedTree(spark, root, "data", "b", store)
    assert(n == before)
    assert(FoldCommit.listDataFiles(Paths.get(root, "data")).size == 3)
    assert(spark.read.parquet(s"$root/data").count() == before)
    assert(!Files.exists(Paths.get(root, "_fold_commit.txt")))
  }

  test("a torn marker (checksum mismatch) is an uncommitted fold: nothing moves, nothing deletes") {
    val root = tmp()
    writeTree(root, "data", buckets = 2, filesPer = 2)
    val total = spark.read.parquet(s"$root/data").count()
    val files = FoldCommit.listDataFiles(Paths.get(root, "data"))
    spark.read.option("basePath", s"$root/data")
      .parquet(files.map(_.toString): _*)
      .repartition(col("b")).write.partitionBy("b")
      .parquet(FoldCommit.stageDir(root, "torn0001").toString)
    // a power crash that made the marker NAME durable but tore its
    // payload: the recorded hash no longer matches the (truncated)
    // delete list — executing it after the moves would double the
    // originals the missing tail named
    val payload = (Seq("torn0001", "data") ++ files.map(f =>
      Paths.get(root).relativize(f).toString)).mkString("\n")
    val truncated = payload.substring(0, payload.length - 10)
    val hash = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    Files.write(Paths.get(root, "_fold_commit.txt"),
      (s"#sha256=$hash\n" + truncated)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    FoldCommit.recover(root)
    // the reader treats it as uncommitted and touches NOTHING — not
    // even the marker (writer-owned, like staging)
    assert(Files.exists(Paths.get(root, "_fold_commit.txt")))
    assert(spark.read.parquet(s"$root/data").count() == total)
    assert(FoldCommit.listDataFiles(Paths.get(root, "data")).size == 4,
      "a torn marker moved or deleted files")
    // the writer's next sweep clears both the torn marker and the stage
    assert(FoldCommit.recover(root, sweepStaging = true))
    assert(!Files.exists(Paths.get(root, "_fold_commit.txt")), "torn marker kept")
    assert(spark.read.parquet(s"$root/data").count() == total)
    assert(FoldCommit.listDataFiles(Paths.get(root, "data")).size == 4)
    assert(!Files.exists(FoldCommit.stageDir(root, "torn0001")))
  }

  test("traversal-shaped marker entries are refused, nothing deleted") {
    val root = tmp()
    writeTree(root, "data", buckets = 1, filesPer = 1)
    Files.write(Paths.get(root, "_fold_commit.txt"),
      "f1\ndata\n../../etc/passwd"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    intercept[IllegalArgumentException] { FoldCommit.recover(root) }
    assert(spark.read.parquet(s"$root/data").count() == 1)
  }
}
