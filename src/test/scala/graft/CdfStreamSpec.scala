package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.sources.VersionedTable

/** Streaming change-feed source: commit versions as offsets, each
  * micro-batch the exact row-level delta of a commit range, resumable
  * from the checkpoint across stream restarts.
  */
class CdfStreamSpec extends SparkSpecBase {

  private val CT = VersionedTable.ChangeTypeCol
  private val CV = VersionedTable.CommitVersionCol

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  private def readCdf(dir: String, startingVersion: Option[Int]) = {
    // the SHORT name, resolved through the ServiceLoader registration
    // (META-INF/services) — the ergonomic form a user writes; the
    // fully-qualified class name works identically
    val r = spark.readStream
      .format("graft-cdf")
      .option("path", dir)
    startingVersion.fold(r)(v => r.option("startingVersion", v.toString)).load()
  }

  private def drainTo(dir: String, checkpoint: String, queryName: String,
      startingVersion: Option[Int]) = {
    val q = readCdf(dir, startingVersion).writeStream
      .format("memory").queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(50))
      .start()
    q.processAllAvailable()
    q
  }

  private def rows(queryName: String): Set[(Long, String, String, Int)] =
    spark.table(queryName).collect().map(r => (
      r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("name")),
      r.getString(r.fieldIndex(CT)), r.getInt(r.fieldIndex(CV)))).toSet

  test("startingVersion=0 bootstraps the snapshot, then streams merge deltas") {
    import spark.implicits._
    val root = tmp("cdfstream")
    val dir = s"$root/t"
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name")) // v1
    t.enableCdf()
    val q = drainTo(dir, s"$root/ckpt", "cdf_boot", startingVersion = Some(0))
    try {
      assert(rows("cdf_boot") == Set(
        (1L, "a", "insert", 1), (2L, "b", "insert", 1)))
      t.merge(Seq((2L, "B"), (3L, "c")).toDF("id", "name"), "id") // v2
      q.processAllAvailable()
      assert(rows("cdf_boot") == Set(
        (1L, "a", "insert", 1), (2L, "b", "insert", 1),
        (2L, "b", "update_preimage", 2), (2L, "B", "update_postimage", 2),
        (3L, "c", "insert", 2)))
    } finally q.stop()
  }

  test("restart resumes from the checkpointed version, not the beginning") {
    import spark.implicits._
    val root = tmp("cdfresume")
    val dir = s"$root/t"
    val out = s"$root/out"
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")) // v1
    t.enableCdf()
    // file sink (the memory sink refuses checkpoint recovery): rows
    // accumulate across runs, so replay would show as duplicates
    def run(): Unit = {
      val q = readCdf(dir, Some(0)).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.ProcessingTime(50))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 3)
    // a commit while the stream is DOWN
    t.delete(Seq(3L).toDF("id"), "id") // v2
    run()
    val all = spark.read.parquet(out).collect().map(r => (
      r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex(CT)),
      r.getInt(r.fieldIndex(CV)))).toSeq
    // exactly the 3 bootstrap inserts + 1 delete — no v1 replay
    assert(all.length == 4, s"replayed rows: $all")
    assert(all.count(_._2 == "delete") == 1)
    assert(all.filter(_._2 == "delete").head == ((3L, "delete", 2)))
  }

  test("default start tails only commits after stream creation") {
    import spark.implicits._
    val root = tmp("cdftail")
    val dir = s"$root/t"
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "name")) // v1
    t.enableCdf()
    val q = drainTo(dir, s"$root/ckpt", "cdf_tail", startingVersion = None)
    try {
      assert(rows("cdf_tail").isEmpty) // v1 predates the stream
      t.append(Seq((2L, "b")).toDF("id", "name")) // v2
      q.processAllAvailable()
      assert(rows("cdf_tail") == Set((2L, "b", "insert", 2)))
    } finally q.stop()
  }

  test("an untracked rewrite in range fails the stream with ResyncRequired") {
    import spark.implicits._
    val root = tmp("cdfresync")
    val dir = s"$root/t"
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name")) // v1
    t.enableCdf()
    val q = drainTo(dir, s"$root/ckpt", "cdf_rs", startingVersion = Some(0))
    try {
      t.overwrite(Seq((9L, "z")).toDF("id", "name")) // v2: full rewrite
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(x: Throwable): Seq[Throwable] =
        if (x == null) Nil else x +: causes(x.getCause)
      assert(causes(e).exists(_.isInstanceOf[VersionedTable.ResyncRequired]),
        s"want ResyncRequired in cause chain, got $e")
    } finally q.stop()
  }

  test("maxVersionsPerTrigger drains a commit backlog in bounded batches") {
    import spark.implicits._
    val root = tmp("cdfthrottle")
    val dir = s"$root/t"
    val t = VersionedTable(spark, dir)
    t.enableCdf()
    // 5-commit backlog BEFORE the stream starts (the backfill shape:
    // unthrottled, this is one giant micro-batch)
    (1 to 5).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "name")))
    val q = spark.readStream
      .format("graft.streaming.VTableChangeSourceProvider")
      .option("path", dir)
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "2")
      .load()
      .writeStream.format("memory").queryName("cdf_throttle")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      q.processAllAvailable()
      // exactly-once: each commit's row exactly one insert
      assert(rows("cdf_throttle") == (1 to 5).map(i =>
        (i.toLong, s"r$i", "insert", i)).toSet)
      // the backlog drained as ≥3 bounded batches (2+2+1 versions),
      // not one giant one
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 3, s"backlog drained in $dataBatches batches")
      // the tail keeps flowing after catch-up
      t.append(Seq((6L, "r6")).toDF("id", "name"))
      q.processAllAvailable()
      assert(rows("cdf_throttle").size == 6)
    } finally q.stop()
  }

  /** Snapshot as a sorted row set (the convergence comparison). */
  private def snap(t: VersionedTable): Seq[(Long, String)] =
    t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("replica converges to the source through its change feed, restart included") {
    import spark.implicits._
    val root = tmp("cdfreplica")
    val srcDir = s"$root/src"
    val repDir = s"$root/replica"
    val src = VersionedTable(spark, srcDir)
    src.enableCdf()
    src.append(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "name"))
    src.merge(Seq((2L, "B"), (5L, "e")).toDF("id", "name"), "id") // update + insert
    src.delete(Seq(3L).toDF("id"), "id")
    def start() = graft.streaming.VTableApplySink(repDir, "id", s"$root/ckpt")
      .start(readCdf(srcDir, startingVersion = Some(0)))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    val rep = VersionedTable(spark, repDir)
    // full convergence: backfill + update + insert + delete all applied
    assert(snap(rep) == Seq((1L, "a"), (2L, "B"), (4L, "d"), (5L, "e")))
    // source keeps changing while the replica is down; the restarted
    // stream resumes from the checkpointed version and re-converges
    src.merge(Seq((1L, "A2"), (6L, "f")).toDF("id", "name"), "id")
    src.delete(Seq(5L).toDF("id"), "id")
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(snap(rep) == snap(src))
      assert(snap(rep) == Seq((1L, "A2"), (2L, "B"), (4L, "d"), (6L, "f")))
      // exactly-once: a crash-replay of the last epoch skips whole
      val e = rep.lastCommittedEpoch.get
      assert(rep.applyChangesEpoch(
        Seq((1L, "ZZZ", "insert", 99)).toDF("id", "name", CT, CV),
        "id", CV, e).isEmpty)
      assert(snap(rep) == snap(src))
    } finally q2.stop()
  }

  test("replication chains: A→B→C converges through B's OWN change feed") {
    // C can only converge if B's apply commits emit an exactly-right
    // row-level feed — this chain test therefore gates applyChanges's
    // CDF emission (preimage/postimage/insert/delete derivation)
    // against the strongest oracle there is: a downstream consumer
    import spark.implicits._
    val root = tmp("cdfchain")
    val a = VersionedTable(spark, s"$root/a")
    a.enableCdf()
    val b = VersionedTable(spark, s"$root/b")
    b.enableCdf() // B is a replica AND a source
    a.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"))
    a.merge(Seq((2L, "B"), (4L, "d")).toDF("id", "name"), "id")
    a.delete(Seq(1L).toDF("id"), "id")
    def pump(src: String, dst: String, ck: String) = {
      val q = graft.streaming.VTableApplySink(dst, "id", ck)
        .start(readCdf(src, startingVersion = Some(0)))
      q.processAllAvailable(); q.stop()
    }
    pump(s"$root/a", s"$root/b", s"$root/ck_ab")
    pump(s"$root/b", s"$root/c", s"$root/ck_bc")
    val c = VersionedTable(spark, s"$root/c")
    assert(snap(c) == snap(a))
    assert(snap(c) == Seq((2L, "B"), (3L, "c"), (4L, "d")))
    // second wave: more change types through the chain, resumed from
    // both checkpoints
    a.merge(Seq((3L, "C2"), (5L, "e")).toDF("id", "name"), "id")
    a.delete(Seq(4L).toDF("id"), "id")
    pump(s"$root/a", s"$root/b", s"$root/ck_ab")
    pump(s"$root/b", s"$root/c", s"$root/ck_bc")
    assert(snap(b) == snap(a))
    assert(snap(c) == snap(a))
    assert(snap(c) == Seq((2L, "B"), (3L, "C2"), (5L, "e")))
  }

  test("applyChanges resolves multi-change keys and mixes deletes in one commit") {
    import spark.implicits._
    val dir = tmp("cdfapply") + "/t"
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"))
    val batch = Seq(
      (1L, "a1", "update_postimage", 10), // then deleted at seq 20
      (1L, "a0", "delete", 20),
      (2L, "b1", "delete", 10),           // then re-inserted at seq 20
      (2L, "b2", "insert", 20),
      (4L, "d1", "insert", 10)            // plain insert
    ).toDF("id", "name", CT, "seq")
    t.applyChanges(batch, "id", orderBy = "seq")
    assert(t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted ==
      Seq((2L, "b2"), (3L, "c"), (4L, "d1")))
    // null change keys raise loudly — a CDC feed bug, not a semantic
    val err = intercept[IllegalArgumentException] {
      t.applyChanges(Seq((null.asInstanceOf[java.lang.Long], "x", "insert", 1))
        .toDF("id", "name", CT, "seq"), "id", orderBy = "seq")
    }
    assert(err.getMessage.contains("null"))
  }

  test("vacuum respects an active change-feed consumer's lease") {
    import spark.implicits._
    val root = tmp("cdflease")
    val dir = s"$root/t"
    val out = s"$root/out"
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "name")) // v1
    t.enableCdf()
    // restartable consumer (file sink — memory refuses checkpoint
    // recovery); its lease records the checkpointed progress
    def run(): Unit = {
      val q = readCdf(dir, Some(0)).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.ProcessingTime(50))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(t.feedLeases.nonEmpty, "streaming source registered no lease")
    // commits the offline consumer has NOT seen yet
    t.merge(Seq((2L, "b")).toDF("id", "name"), "id") // v2
    t.merge(Seq((3L, "c")).toDF("id", "name"), "id") // v3
    // retention would drop versions past the consumer's read-through
    // point → refused, nothing deleted
    val e = intercept[IllegalStateException] { t.vacuum(retainVersions = 1) }
    assert(e.getMessage.contains("change-feed consumer"), e.getMessage)
    assert(t.read(1).count() == 1, "refused vacuum must delete nothing")
    // the offline consumer catches up cleanly — its deltas survived —
    // and its lease advances (to the catch-up batch's START, v1: the
    // lease is deliberately one batch conservative)
    run()
    assert(spark.read.parquet(out).count() == 3) // bootstrap + 2 merge inserts
    assert(t.feedLeases.values.exists(_._1 >= 1), t.feedLeases.toString)
    // dropping only v1 (consumed) is now allowed
    assert(t.vacuum(retainVersions = 2) >= 0)
    // an EXPIRED lease stops blocking (age bound zero ⇒ every lease
    // stale) — the dead-consumer escape hatch
    t.merge(Seq((4L, "d")).toDF("id", "name"), "id")
    t.registerFeedLease("dead-replica", 0)
    t.vacuum(retainVersions = 1, maxFeedLeaseAgeMs = 0L)
    // releasing a lease removes its hold entirely
    t.feedLeases.keys.foreach(t.releaseFeedLease)
    t.merge(Seq((5L, "e")).toDF("id", "name"), "id")
    t.registerFeedLease("retired", 0)
    intercept[IllegalStateException] { t.vacuum(retainVersions = 1) }
    t.releaseFeedLease("retired")
    t.vacuum(retainVersions = 1)
  }

  test("seeding an empty replica from a foreign feed drops its sequence column") {
    import spark.implicits._
    val dir = tmp("cdfseed") + "/t"
    val t = VersionedTable(spark, dir)
    // a FOREIGN feed's first batch: custom `seq` ordering column, a
    // superseded change, and a delete for a never-seen key
    val seedBatch = Seq(
      (1L, "a0", "insert", 10),
      (1L, "a1", "update_postimage", 20), // supersedes the insert
      (2L, "b", "insert", 10),
      (9L, "gone", "delete", 10)          // vacuous on an empty table
    ).toDF("id", "name", CT, "seq")
    t.applyChanges(seedBatch, "id", orderBy = "seq")
    // the seeded schema is the SOURCE's data schema: no change-type,
    // no commit-version, and no foreign `seq` — ordering metadata must
    // not bake into the replica (the docstring's "extras fall away")
    assert(t.read().columns.toSeq == Seq("id", "name"))
    assert(t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted ==
      Seq((1L, "a1"), (2L, "b")))
    // and the NEXT batch from the same feed applies cleanly against
    // the seeded schema (projection to committed fields must line up)
    t.applyChanges(Seq((2L, "b2", "update_postimage", 30))
      .toDF("id", "name", CT, "seq"), "id", orderBy = "seq")
    assert(t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted ==
      Seq((1L, "a1"), (2L, "b2")))
  }

  test("startingVersion accepts a tag name: replicate everything after the blessed snapshot") {
    import spark.implicits._
    val root = tmp("cdftag")
    val dir = s"$root/t"
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "name")) // v1
    t.enableCdf()
    t.append(Seq((2L, "b")).toDF("id", "name")) // v2
    t.createTag("blessed")                       // pins v2
    t.merge(Seq((2L, "B"), (3L, "c")).toDF("id", "name"), "id") // v3
    val q = spark.readStream.format("graft-cdf")
      .option("path", dir).option("startingVersion", "blessed").load()
      .writeStream.format("memory").queryName("cdf_tag")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      // exclusive start at the tag's pinned version, identical to the
      // integer form: only the post-tag delta flows
      assert(rows("cdf_tag") == Set(
        (2L, "b", "update_preimage", 3), (2L, "B", "update_postimage", 3),
        (3L, "c", "insert", 3)))
    } finally q.stop()
  }

  test("a checkpointed stream restarts after its bootstrap tag is dropped") {
    import spark.implicits._
    val root = tmp("cdftagdrop")
    val dir = s"$root/t"
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "name")) // v1
    t.enableCdf()
    t.createTag("boot")                          // pins v1
    t.merge(Seq((2L, "b")).toDF("id", "name"), "id") // v2
    val out = s"$root/out"
    // file sink: the memory sink refuses checkpoint recovery
    def run(): Unit = {
      val q = spark.readStream.format("graft-cdf")
        .option("path", dir).option("startingVersion", "boot").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.ProcessingTime(50)).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 1, "v2's insert delta")
    // the documented re-pin two-step drops the tag; the stream's
    // checkpoint already supersedes the bootstrap ref, so a restart
    // must RESUME (lazy resolution), not die re-resolving the name —
    // the integer form could never fail a restart here and the named
    // form must not either
    assert(t.dropTag("boot"))
    t.merge(Seq((3L, "c")).toDF("id", "name"), "id") // v3
    run()
    val all = spark.read.parquet(out).collect().map(r => (
      r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex(CT)),
      r.getInt(r.fieldIndex(CV)))).toSeq
    assert(all.count(_ == ((3L, "insert", 3))) == 1, s"rows: $all")
    assert(all.length == 2, s"no replay of the since-tag window: $all")
  }

  test("a startingVersion that is neither a number nor a tag fails naming the roster") {
    import spark.implicits._
    val root = tmp("cdftagbad")
    val dir = s"$root/t"
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "name"))
    t.enableCdf()
    t.createTag("blessed")
    // sources build on the stream thread, so the guided error arrives
    // wrapped in the StreamingQueryException — but it must be the
    // roster-naming IllegalArgumentException, never a bare
    // NumberFormatException out of option parsing
    val q = spark.readStream.format("graft-cdf")
      .option("path", dir).option("startingVersion", "nope").load()
      .writeStream.format("memory").queryName("cdf_tag_bad")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(50)).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).toList
    assert(chain.exists(c => String.valueOf(c.getMessage).contains("nope") &&
      String.valueOf(c.getMessage).contains("blessed")), e.getMessage)
    assert(!chain.exists(_.isInstanceOf[NumberFormatException]), e.getMessage)
  }
}
