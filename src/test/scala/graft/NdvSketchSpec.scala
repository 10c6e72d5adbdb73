package graft

import org.apache.spark.sql.functions.col

import graft.sources.VersionedTable

/** Per-file HLL NDV sketches: mergeable across files, so the global
  * distinct count answers from sidecar metadata with no data scan —
  * per-file exact counts can't compose, a sketch union can.
  */
class NdvSketchSpec extends SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-ndv").toString + "/t"

  test("sketch union estimates distinct ids across overlapping files") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableNdv(Seq("id"))
    // three files with overlapping id ranges: exact distinct = 200
    t.append((0L until 100L).map(i => (i, s"r$i")).toDF("id", "name").coalesce(1))
    t.append((50L until 150L).map(i => (i, s"r$i")).toDF("id", "name").coalesce(1))
    t.append((100L until 200L).map(i => (i, s"r$i")).toDF("id", "name").coalesce(1))
    val est = t.approxNdv("id")
    assert(est.isDefined, "full sidecar coverage should answer")
    assert(math.abs(est.get - 200L) <= 10, s"estimate ${est.get} vs exact 200")
    // a naive sum of per-file counts would say 300 — the union must not
    assert(est.get < 260, s"estimate ${est.get} double-counts the overlap")
    // unconfigured column: no sketches, no answer
    assert(t.approxNdv("name").isEmpty)
    // the O(metadata) describe surfaces it
    assert(t.describeJson().contains("\"ndv_approx\""))
    // ...and the lazy scan serves CBO-grade column statistics: exact
    // rows and null counts, manifest min/max, sketch distinct counts
    val rel = t.scan().queryExecution.logical.collectFirst {
      case r: graft.plans.VTableRelation => r
    }.get
    val stats = rel.computeStats()
    assert(stats.rowCount.contains(BigInt(300)))
    val idStat = stats.attributeStats.find(_._1.name == "id").map(_._2).get
    assert(idStat.nullCount.contains(BigInt(0)))
    assert(idStat.min.contains(0L) && idStat.max.contains(199L))
    assert(idStat.distinctCount.exists(d => (d - BigInt(200)).abs <= 10),
      s"distinctCount ${idStat.distinctCount}")
  }

  test("a pre-enablement file breaks coverage; compaction restores it") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.append((0L until 50L).map(i => (i, s"r$i")).toDF("id", "name").coalesce(1))
    t.enableNdv(Seq("id"))
    t.append((50L until 100L).map(i => (i, s"r$i")).toDF("id", "name").coalesce(1))
    // the first file has no sidecar — sound-only: refuse, never guess
    assert(t.approxNdv("id").isEmpty)
    // compaction rewrites every file under the current config → fresh
    // sidecars, coverage restored
    t.compact(targetBytes = 64 << 20)
    val est = t.approxNdv("id")
    assert(est.isDefined && math.abs(est.get - 100L) <= 5, s"post-compact $est")
  }

  test("a column literally named _rows survives merge/delete keyed on it") {
    import spark.implicits._
    // the per-file row count shares the stats node with column entries;
    // a user column named "_rows" loses its range stats (sound — it
    // just won't prune) but every keyed rewrite must still WORK
    val t = VersionedTable(spark, tmp())
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("_rows", "name").coalesce(1))
    val v = t.delete(Seq(2L).toDF("_rows"), "_rows")
    assert(v == 2)
    assert(t.read().collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 3L)))
    t.merge(Seq((3L, "c2"), (4L, "d")).toDF("_rows", "name"), "_rows")
    assert(t.read().collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      .sameElements(Array((1L, "a"), (3L, "c2"), (4L, "d"))))
  }

  test("vacuum sweeps dead files' ndv sidecars") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableNdv(Seq("id"))
    t.append((0L until 30L).map(i => (i, s"r$i")).toDF("id", "name").coalesce(1))
    t.overwrite((100L until 130L).map(i => (i, s"r$i")).toDF("id", "name").coalesce(1))
    t.vacuum(retainVersions = 1)
    val dirF = new java.io.File(t.dir)
    def sidecars(f: java.io.File): Seq[String] = {
      val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isDirectory).flatMap(sidecars) ++
        kids.filter(_.getName.contains(".ndv-")).map(_.getName)
    }
    // only the live snapshot's sidecar survives
    assert(sidecars(dirF).size == 1, s"leftover sidecars: ${sidecars(dirF)}")
    assert(t.approxNdv("id").exists(e => math.abs(e - 30L) <= 3))
    // the filter on the live snapshot still answers after the sweep
    assert(t.read().where(col("id") >= 100L).count() == 30)
  }

  test("string-column sketches: distinct languages from sidecars alone") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableNdv(Seq("lang", "src"))
    val langs = Seq("en", "de", "fr", "zh", "es")
    t.append((0 until 200).map(i => (i.toLong, langs(i % 3), s"crawl-${i % 7}"))
      .toDF("id", "lang", "src").coalesce(1))
    t.append((200 until 400).map(i => (i.toLong, langs(i % 5), s"crawl-${i % 11}"))
      .toDF("id", "lang", "src").coalesce(1))
    // union across files, exact at these cardinalities
    assert(t.approxNdv("lang").contains(5L), t.approxNdv("lang"))
    assert(t.approxNdv("src").contains(11L), t.approxNdv("src"))
    // the lazy scan's column statistics carry the string NDVs (CBO food)
    val rel = t.scan().queryExecution.logical.collectFirst {
      case r: graft.plans.VTableRelation => r
    }.get
    val langStat = rel.computeStats().attributeStats
      .find(_._1.name == "lang").map(_._2).get
    assert(langStat.distinctCount.contains(BigInt(5)))
  }

  test("profileFromMetadata: full coverage answers, partial falls back") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableNdv(Seq("id", "lang"))
    t.append(Seq((1L, "en"), (2L, "de"), (3L, null: String))
      .toDF("id", "lang").coalesce(1))
    val p = t.profileFromMetadata()
    assert(p.isDefined, "full NDV coverage should answer from metadata")
    val rows = p.get.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(rows("id") == ((3L, 0L, 3L, "1", "3")))
    // string bounds withheld (manifest may truncate); counts exact
    assert(rows("lang") == ((3L, 1L, 2L, null, null)))
    // a column without an NDV sidecar breaks coverage: no metadata answer
    val t2 = VersionedTable(spark, tmp())
    t2.enableNdv(Seq("id"))
    t2.append(Seq((1L, "x")).toDF("id", "lang").coalesce(1))
    assert(t2.profileFromMetadata().isEmpty)
  }
}
