package graft

import java.nio.file.Files

import graft.sources.{Catalog, VersionedTable}

class VersionedTableSpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-vtable").toString + "/t"

  test("append accumulates versions; reads are snapshot-consistent") {
    import spark.implicits._
    val dir = tmp()
    val t = VersionedTable(spark, dir)
    val v1 = t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val v2 = t.append(Seq((3L, "c")).toDF("id", "name"))
    assert(v1 == 1 && v2 == 2 && t.currentVersion == 2)
    assert(t.read().count() == 3)
    // time travel: version 1 still reads its original 2 rows
    assert(t.read(1).count() == 2)
  }

  test("overwrite replaces the snapshot but keeps history readable") {
    import spark.implicits._
    val dir = tmp()
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    t.overwrite(Seq((9L, "z")).toDF("id", "name"))
    assert(t.read().collect().map(_.getLong(0)).toSeq == Seq(9L))
    assert(t.read(1).count() == 2)
  }

  test("merge has upsert semantics: update matched, insert new, keep rest") {
    import spark.implicits._
    val dir = tmp()
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"))
    t.merge(Seq((2L, "b2"), (9L, "new")).toDF("id", "name"), "id")
    val got = t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b2"), (3L, "c"), (9L, "new")))
    // pre-merge snapshot untouched
    assert(t.read(1).collect().map(_.getString(1)).toSet == Set("a", "b", "c"))
  }

  test("two writers claiming the same version: exactly one commit wins") {
    import spark.implicits._
    val dir = tmp()
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "name"))
    // two table handles race to commit version 2 — the atomic
    // rename-without-replace lets exactly one manifest land
    val winner = VersionedTable(spark, dir)
    winner.commit(2, "append", Seq.empty)
    intercept[java.util.ConcurrentModificationException] {
      t.commit(2, "append", Seq.empty)
    }
    // the loser's failed commit changed nothing; a writer that retries
    // on a fresh snapshot succeeds at the next version
    assert(VersionedTable(spark, dir).currentVersion == 2)
    assert(t.append(Seq((2L, "b")).toDF("id", "name")) == 3)
  }

  test("reopening the table sees the committed log; Catalog serves it") {
    import spark.implicits._
    val dir = tmp()
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "name"))
    t.append(Seq((2L, "b")).toDF("id", "name"))
    assert(VersionedTable(spark, dir).currentVersion == 2)
    val cat = new Catalog(spark)
    assert(cat.read("vtable", dir).count() == 2)
    assert(cat.read("vtable", dir, Map("version" -> "1")).count() == 1)
  }

  test("uncommitted data files are invisible to readers") {
    import spark.implicits._
    val dir = tmp()
    val t = VersionedTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "name"))
    // simulate a crashed writer: data landed, manifest never did
    Seq((99L, "ghost")).toDF("id", "name").write.parquet(s"$dir/files-crashed")
    assert(t.read().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
