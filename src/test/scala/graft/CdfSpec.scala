package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}

import graft.sources.VersionedTable

/** Row-level change-data-feed contract: readChangesSince serves every
  * change a tracked commit made — appends from file diffs, rewrites
  * from change files, compaction transparently skipped — and the feed
  * agrees with what the rewrites actually did to the snapshot.
  */
class CdfSpec extends SparkSpecBase {

  private val CT = VersionedTable.ChangeTypeCol
  private val CV = VersionedTable.CommitVersionCol

  private def tmp(): String =
    Files.createTempDirectory("graft-cdf").toString + "/t"

  private def changeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String, Int)] =
    df.collect().map(r => (r.getLong(r.fieldIndex("id")),
      r.getString(r.fieldIndex("name")),
      r.getString(r.fieldIndex(CT)),
      r.getInt(r.fieldIndex(CV)))).toSet

  test("randomized APPLY batches: snapshot and feed match the model oracle") {
    import spark.implicits._
    // applyChanges' CDF rows are DERIVED from joins over the touched
    // base files, not recorded directly — this property trial gates
    // that derivation (and the batch resolution rule) against a plain
    // in-memory model: random batches of insert/update/delete/preimage
    // rows with COLLIDING sequence numbers, applied commit after
    // commit; after each, the committed snapshot must equal the model
    // and the commit's feed rows must be exactly the model's diff
    // classes (pre+post for an upsert on a live key — equal values
    // included — insert for a new key, delete for a live key, nothing
    // for a delete of an absent key).
    val types = Seq("insert", "update_postimage", "delete", "update_preimage")
    (0 until 3).foreach { trial =>
      val rnd = new scala.util.Random(4200 + trial)
      val t = VersionedTable(spark, tmp())
      var model = (1L to 10L).map(k => k -> s"init$k").toMap
      t.append(model.toSeq.toDF("id", "name"))
      t.enableCdf()
      var v = 1
      (0 until 6).foreach { _ =>
        val batch = (0 until (5 + rnd.nextInt(11))).map { _ =>
          (rnd.nextInt(30).toLong + 1, s"v${rnd.nextInt(1000)}",
            types(rnd.nextInt(types.length)), rnd.nextInt(5).toLong + 1)
        }
        // model resolution = the documented rule: preimages drop, then
        // per key the highest seq wins, seq ties broken by change type
        // ascending (so replays resolve identically)
        val resolved = batch.filter(_._3 != "update_preimage")
          .groupBy(_._1).map { case (k, changes) =>
            k -> changes.minBy(c => (-c._4, c._3))
          }
        val prev = model
        resolved.foreach { case (k, (_, value, ct, _)) =>
          if (ct == "delete") model -= k else model += (k -> value)
        }
        val expectedFeed: Set[(Long, String, String)] = resolved.flatMap {
          case (k, (_, value, ct, _)) =>
            (ct, prev.get(k)) match {
              case ("delete", Some(old)) => Seq((k, old, "delete"))
              case ("delete", None)      => Seq.empty
              case (_, Some(old)) => Seq((k, old, "update_preimage"),
                (k, value, "update_postimage"))
              case (_, None)      => Seq((k, value, "insert"))
            }
        }.toSet
        t.applyChanges(
          batch.toDF("id", "name", CT, "seq"), "id", orderBy = "seq")
        v += 1
        assert(t.read().collect().map(r => (r.getLong(0), r.getString(1))).toMap
          == model, s"trial $trial v$v snapshot diverged from model")
        val feed = t.readChangesSince(v - 1, v).collect()
          .map(r => (r.getLong(r.fieldIndex("id")),
            r.getString(r.fieldIndex("name")), r.getString(r.fieldIndex(CT))))
          .toSet
        assert(feed == expectedFeed, s"trial $trial v$v feed diverged")
      }
    }
  }

  test("merge emits pre/postimage for matched keys, insert for new ones") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")) // v1
    t.enableCdf()
    t.merge(Seq((2L, "B"), (9L, "z")).toDF("id", "name"), "id")       // v2
    val feed = t.readChangesSince(1)
    assert(changeSet(feed) == Set(
      (2L, "b", "update_preimage", 2),
      (2L, "B", "update_postimage", 2),
      (9L, "z", "insert", 2)))
    // the postimage+insert rows ARE the new snapshot state for those keys
    assert(t.read().collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "z")))
  }

  test("table_changes() SQL TVF serves the same feed by path and by registered name") {
    import spark.implicits._
    val dir = tmp()
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name")) // v1
    t.enableCdf()
    t.merge(Seq((2L, "B")).toDF("id", "name"), "id")       // v2
    // path form, SQL-composable: filter + count like any relation
    val byPath = spark.sql(
      s"SELECT id, name, _change_type FROM table_changes('$dir', 1) " +
        "ORDER BY _change_type")
    assert(byPath.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((2L, "B", "update_postimage"), (2L, "b", "update_preimage")))
    // registered-name form through the lazy-scan view
    t.scan().createOrReplaceTempView("cdf_tvf_t")
    assert(spark.sql(
      "SELECT count(*) AS n FROM table_changes('cdf_tvf_t', 0, 1)")
      .head().getLong(0) == 2, "bootstrap window: v1's two inserts")
    // usage errors are loud
    intercept[Exception] { spark.sql("SELECT * FROM table_changes('/nope')") }
    // "changes since the blessed snapshot": a tag name resolves to its
    // pinned version for either operand
    t.createTag("seed", 1)
    assert(spark.sql(
      "SELECT count(*) AS n FROM table_changes('cdf_tvf_t', 'seed')")
      .head().getLong(0) == 2, "since-tag window must equal since-v1")
    val et = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('cdf_tvf_t', 'nope')").collect()
    }
    assert(et.getMessage.contains("seed"), et.getMessage)
  }

  test("a since-tag window past a vacuumed gap resyncs loudly; the tag itself still reads") {
    import spark.implicits._
    val dir = tmp()
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "name")) // v1
    t.enableCdf()
    t.createTag("blessed", 1)
    t.merge(Seq((2L, "b")).toDF("id", "name"), "id") // v2
    t.merge(Seq((3L, "c")).toDF("id", "name"), "id") // v3
    // intact history: the since-tag window serves v2+v3 changes
    assert(t.readChangesSince(1).count() == 2)
    // vacuum drops v2 (v1 is tag-pinned, v3 is head): the tag pins its
    // OWN snapshot, deliberately not the feed above it — a forgotten
    // tag must never become an unbounded retention leak
    t.vacuum(retainVersions = 1, force = true)
    assert(t.read(1).count() == 1, "the tagged snapshot must still read")
    val e = intercept[VersionedTable.ResyncRequired] {
      spark.sql(s"SELECT * FROM table_changes('$dir', 'blessed')").collect()
    }
    assert(e.getMessage.contains("vacuum horizon"), e.getMessage)
  }

  test("version-taking TVFs accept timestamp operands: string, TIMESTAMP literal, epoch millis") {
    import spark.implicits._
    val dir = tmp()
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name")) // v1
    t.enableCdf()
    Thread.sleep(30)
    val between = System.currentTimeMillis() // strictly between v1 and v2
    Thread.sleep(30)
    t.merge(Seq((2L, "B")).toDF("id", "name"), "id")       // v2
    // "changes since yesterday" without hunting the version number:
    // the operand resolves through versionAt, the same contract
    // RESTORE's TIMESTAMP AS OF honors — here the instant lands on v1,
    // so all three spellings must serve the since-v1 window (2 rows)
    val s = new java.sql.Timestamp(between).toString
    for (operand <- Seq(s"'$s'", s"TIMESTAMP '$s'", between.toString))
      assert(spark.sql(
        s"SELECT count(*) AS n FROM table_changes('$dir', $operand)")
        .head().getLong(0) == 2, s"operand $operand")
    // table_diff: a timestamp v1 operand must equal the integer form
    val byInt = spark.sql(s"SELECT * FROM table_diff('$dir', 1, 2, 'id')")
      .collect().toSet
    val byTs = spark.sql(s"SELECT * FROM table_diff('$dir', '$s', 2, 'id')")
      .collect().toSet
    assert(byInt.nonEmpty && byInt == byTs)
    // table_files: the listed snapshot pins to versionAt(ts) = v1
    assert(spark.sql(s"SELECT sum(rows) AS r FROM table_files('$dir', '$s')")
      .head().getLong(0) ==
      spark.sql(s"SELECT sum(rows) AS r FROM table_files('$dir', 1)")
        .head().getLong(0))
    // a string that is neither a tag nor a timestamp names both forms
    val bad = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$dir', 'not-a-thing')").collect()
    }
    assert(bad.getMessage.contains("timestamp"), bad.getMessage)
  }

  test("delete by key set and deleteWhere both emit delete rows") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "name")) // v1
    t.enableCdf()
    t.delete(Seq(2L).toDF("id"), "id")                // v2
    t.deleteWhere(col("id") > 3L)                     // v3
    assert(changeSet(t.readChangesSince(1)) == Set(
      (2L, "b", "delete", 2),
      (4L, "d", "delete", 3)))
    assert(t.read().collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("updateWhere postimage reflects old-value filtering, new values") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name")) // v1
    t.enableCdf()
    // the assignment rewrites the condition column itself: the feed
    // must still carry the row (condition evaluated on OLD values)
    t.updateWhere(col("name") === "a", Map("name" -> lit("A"))) // v2
    assert(changeSet(t.readChangesSince(1)) == Set(
      (1L, "a", "update_preimage", 2),
      (1L, "A", "update_postimage", 2)))
  }

  test("appends feed as inserts with no enablement; windows compose") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.append(Seq((1L, "a")).toDF("id", "name"))  // v1
    t.append(Seq((2L, "b")).toDF("id", "name"))  // v2
    val all = t.readChangesSince(0)
    assert(changeSet(all) == Set((1L, "a", "insert", 1), (2L, "b", "insert", 2)))
    // (since, until] windowing matches readAppendsSince semantics
    assert(changeSet(t.readChangesSince(1, 2)) == Set((2L, "b", "insert", 2)))
    assert(t.readChangesSince(2).isEmpty)
  }

  test("compaction is transparent to the feed; no-op rewrites feed nothing") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableCdf()
    t.append(Seq((1L, "a")).toDF("id", "name"))  // v1
    t.append(Seq((2L, "b")).toDF("id", "name"))  // v2
    t.compact(targetBytes = 1L << 20)            // v3: bytes move, rows don't
    t.delete(Seq(99L).toDF("id"), "id")          // v4: all-pruned no-op
    assert(t.currentVersion == 4)
    assert(changeSet(t.readChangesSince(0)) ==
      Set((1L, "a", "insert", 1), (2L, "b", "insert", 2)))
  }

  test("untracked rewrites and overwrites answer ResyncRequired") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name")) // v1 (no CDF yet)
    t.merge(Seq((2L, "B")).toDF("id", "name"), "id")       // v2: untracked rewrite
    intercept[VersionedTable.ResyncRequired] { t.readChangesSince(1) }
    t.enableCdf()
    // enabling is not retroactive: v2 still can't answer...
    intercept[VersionedTable.ResyncRequired] { t.readChangesSince(1) }
    // ...but a window past it can
    t.delete(Seq(1L).toDF("id"), "id")                     // v3
    assert(changeSet(t.readChangesSince(2)) == Set((1L, "a", "delete", 3)))
    t.overwrite(Seq((9L, "z")).toDF("id", "name"))         // v4: tracked or not, resync
    intercept[VersionedTable.ResyncRequired] { t.readChangesSince(3) }
  }

  test("vacuum reclaims dropped commits' change files; feed below horizon resyncs") {
    import spark.implicits._
    val dir = tmp()
    val t = VersionedTable(spark, dir)
    t.enableCdf()
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name")) // v1
    t.merge(Seq((2L, "B")).toDF("id", "name"), "id")       // v2: writes change files
    t.delete(Seq(1L).toDF("id"), "id")                     // v3
    def cdfDirs() = {
      val s = Files.list(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("cdf-")).toSeq
      } finally s.close()
    }
    assert(cdfDirs().size == 2)
    t.vacuum(retainVersions = 1)
    // v2's change files are unreferenced once its manifest drops; the
    // RETAINED v3's change files stay live with its manifest
    assert(cdfDirs().size == 1, cdfDirs().mkString(","))
    assert(t.read().collect().map(_.getLong(0)).toSeq == Seq(2L))
    intercept[VersionedTable.ResyncRequired] { t.readChangesSince(1) }
  }

  test("feed aligns across additive schema evolution under the until-schema") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableCdf()
    t.append(Seq((1L, "a")).toDF("id", "name"))                  // v1
    t.delete(Seq(99L, 1L).toDF("id"), "id")                      // v2: change file, old schema
    t.appendEvolve(Seq((2L, "b", 7)).toDF("id", "name", "score")) // v3: adds score
    val feed = t.readChangesSince(0)
    assert(feed.columns.toSeq == Seq("id", "name", "score", CT, CV))
    val rows = feed.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) -1 else r.getInt(2), r.getString(3), r.getInt(4))).toSet
    // pre-evolution rows (v1 insert read from old data files, v2 delete
    // read from an old-schema change file) null-extend the added column
    assert(rows == Set(
      (1L, "a", -1, "insert", 1),
      (1L, "a", -1, "delete", 2),
      (2L, "b", 7, "insert", 3)))
  }
}
