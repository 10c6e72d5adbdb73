package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.service.QueryService
import graft.sources.VersionedTable

/** COPY INTO's exactly-once ledger: idempotent re-runs, grown-source
  * increments, FORCE reloads, rewritten-file re-loads, schema
  * refusal, and the SQL statement surface.
  */
class CopyIntoSpec extends SparkSpecBase {

  private def tmp(): String = Files.createTempDirectory("graft-copy").toString

  test("re-runs are no-ops; grown directories load only the new files") {
    import spark.implicits._
    val root = tmp()
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").write.parquet(s"$root/src/b1")
    val t = VersionedTable(spark, s"$root/t")
    val (v1, n1) = t.copyInto(s"$root/src")
    assert(v1 == 1 && n1 > 0 && t.read().count() == 2)
    val (v2, n2) = t.copyInto(s"$root/src")
    assert(n2 == 0 && v2 == v1, "identical re-run must be a no-op")
    Seq((3L, "c")).toDF("id", "name").write.parquet(s"$root/src/b2")
    val (v3, n3) = t.copyInto(s"$root/src")
    assert(v3 == 2 && n3 > 0)
    assert(t.read().collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L, 3L)))
  }

  test("FORCE reloads; a rewritten file (new size) reloads without FORCE") {
    import spark.implicits._
    val root = tmp()
    Seq((1L, "a")).toDF("id", "name").coalesce(1).write.parquet(s"$root/src/b1")
    val t = VersionedTable(spark, s"$root/t")
    t.copyInto(s"$root/src")
    val (_, nForced) = t.copyInto(s"$root/src", force = true)
    assert(nForced > 0 && t.read().count() == 2, "FORCE must double-load")
    // rewrite b1 with different content → different size → new identity
    Seq((9L, "zzzzzzzzzzzz"), (10L, "yyyyyyyyyy")).toDF("id", "name")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/src/b1")
    val (_, nRewritten) = t.copyInto(s"$root/src")
    assert(nRewritten > 0, "a rewritten source file is a new identity")
  }

  test("schema mismatch refuses; the ledger survives unrelated commits") {
    import spark.implicits._
    val root = tmp()
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$root/src/b1")
    val t = VersionedTable(spark, s"$root/t")
    t.copyInto(s"$root/src")
    // an unrelated append must not forget the ledger
    t.append(Seq((5L, "e")).toDF("id", "name"))
    assert(t.copyInto(s"$root/src")._2 == 0,
      "ledger lost across an unrelated commit")
    // a source with a different schema refuses whole
    Seq((1.5, "x")).toDF("other", "name").write.parquet(s"$root/bad/b1")
    intercept[IllegalArgumentException] { t.copyInto(s"$root/bad") }
  }

  test("the ledger carries through a shallow clone: same landing dir stays a no-op") {
    import spark.implicits._
    val root = tmp()
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$root/src/b1")
    val t = VersionedTable(spark, s"$root/t")
    t.copyInto(s"$root/src")
    val clone = t.cloneTo(s"$root/cl")
    assert(clone.copyInto(s"$root/src")._2 == 0,
      "the clone holds the copied rows — a re-run must not double-load")
    Seq((2L, "b")).toDF("id", "name").write.parquet(s"$root/src/b2")
    assert(clone.copyInto(s"$root/src")._2 > 0, "new files still load")
    assert(t.read().count() == 1, "source untouched by the clone's copy")
  }

  test("two concurrent COPY INTOs of one landing dir never double-load") {
    import spark.implicits._
    val root = tmp()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
      .repartition(3).write.parquet(s"$root/src/b1")
    val t = VersionedTable(spark, s"$root/t")
    // OCC: both threads race the same ledger; the loser's retry
    // re-reads the winner's copied set and must land ZERO new files
    val threads = (0 until 2).map { _ =>
      new Thread(() => { t.copyInto(s"$root/src"); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(t.read().count() == 3,
      s"double-load: ${t.read().count()} rows from a 3-row source")
    assert(t.read().collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L, 3L)))
  }

  test("COPY INTO SQL: loads, reports files, no-ops on re-run") {
    import spark.implicits._
    val svc = new QueryService(spark)
    val root = tmp()
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").write.parquet(s"$root/src/b1")
    svc.sql(s"CREATE TABLE copy_sql_t (k BIGINT, v DOUBLE) USING vtable " +
      s"LOCATION '$root/t'").collect()
    val r1 = svc.sql(s"COPY INTO copy_sql_t FROM '$root/src' FILEFORMAT = PARQUET")
      .head()
    assert(r1.getAs[Int]("files_loaded") > 0)
    assert(spark.table("copy_sql_t").count() == 2)
    val r2 = svc.sql(s"COPY INTO copy_sql_t FROM '$root/src'").head()
    assert(r2.getAs[Int]("files_loaded") == 0)
    assert(spark.table("copy_sql_t").count() == 2)
    svc.sql("DROP TABLE copy_sql_t").collect()
  }
}
