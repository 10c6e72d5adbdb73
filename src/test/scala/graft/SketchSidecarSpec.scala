package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Per-file KLL quantile + Theta key sketch sidecars: built in the
  * same one-pass stats job as bloom/NDV, merged driver-side to answer
  * quantiles and distinct-key set algebra from metadata alone — no
  * data file opened.
  */
class SketchSidecarSpec extends SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-sketch").toString + "/t"

  test("sidecar-merged quantiles match a direct kll_sketch_agg over the table") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableSketch(kllColumns = Seq("v"), thetaColumns = Seq("id"))
    // two files, 80 values total — well inside k=200, so BOTH the
    // per-file sidecars and the direct whole-table sketch are in
    // exact mode and must agree exactly
    t.append((0L until 40L).map(i => (i, i * 2.5)).toDF("id", "v").coalesce(1))
    t.append((40L until 80L).map(i => (i, i * 2.5)).toDF("id", "v").coalesce(1))
    val fromSidecars = t.approxQuantiles("v", Seq(0.1, 0.5, 0.9, 0.95))
    assert(fromSidecars.isDefined, "full sidecar coverage should answer")
    val direct = t.read()
      .agg(graft.functions.GraftFunctions.kllSketchAgg(col("v").cast("double")).as("sk"))
      .select(
        graft.functions.GraftFunctions.kllValue(col("sk"), 0.1),
        graft.functions.GraftFunctions.kllValue(col("sk"), 0.5),
        graft.functions.GraftFunctions.kllValue(col("sk"), 0.9),
        graft.functions.GraftFunctions.kllValue(col("sk"), 0.95))
      .head()
    assert(fromSidecars.get == Seq(direct.getDouble(0), direct.getDouble(1),
      direct.getDouble(2), direct.getDouble(3)),
      s"sidecar-merged ${fromSidecars.get} vs direct $direct")
    // exact-mode sanity: p50 of 0,2.5,...,197.5 (INCLUSIVE) is 97.5
    assert(fromSidecars.get(1) == 97.5)
    // unconfigured column / out-of-range p
    assert(t.approxQuantiles("id", Seq(0.5)).isEmpty,
      "id is theta-indexed, not kll-indexed")
    intercept[IllegalArgumentException] { t.approxQuantiles("v", Seq(1.5)) }
  }

  test("theta sidecars intersect across versions: retention through an overwrite") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableSketch(thetaColumns = Seq("id"))
    // v1 holds ids 0..99; v2 REPLACES with 50..149 → overlap 50..99
    t.append((0L until 100L).map(i => (i, s"a$i")).toDF("id", "name").repartition(2))
    t.overwrite((50L until 150L).map(i => (i, s"b$i")).toDF("id", "name").repartition(2))
    val ov = t.approxKeyOverlap("id", v1 = 1, v2 = 2)
    assert(ov.isDefined)
    // lgK=12 exact mode at 100 distincts/version: exactly 50
    assert(ov.get == 50L, s"overlap ${ov.get} vs exact 50")
    // self-overlap at head = the head's distinct count
    assert(t.approxKeyOverlap("id").contains(100L))
    // cross-TABLE overlap through `other`
    val u = VersionedTable(spark, tmp())
    u.enableSketch(thetaColumns = Seq("id"))
    u.append((140L until 200L).map(i => (i, s"c$i")).toDF("id", "name").coalesce(1))
    assert(t.approxKeyOverlap("id", other = u).contains(10L),
      "head ids 50..149 vs 140..199 share exactly 10")
  }

  test("coverage is sound-only: pre-enablement files disable the answer") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.append((0L until 20L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    t.enableSketch(kllColumns = Seq("v"), thetaColumns = Seq("id"))
    t.append((20L until 40L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    // the head still references the pre-enablement file → no answer
    assert(t.approxQuantiles("v", Seq(0.5)).isEmpty)
    assert(t.thetaSketch("id").isEmpty)
    // an overwrite leaves only covered files → answers again
    t.overwrite((0L until 30L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    assert(t.approxQuantiles("v", Seq(0.5)).contains(Seq(14.0)))
    assert(t.approxKeyOverlap("id").contains(30L))
  }

  test("vacuum takes dead files' kll/theta sidecars with them; live ones survive") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableSketch(kllColumns = Seq("v"), thetaColumns = Seq("id"))
    t.append((0L until 10L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    t.overwrite((10L until 20L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    def sidecars(): Seq[String] = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(t.dir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.contains(".kll-") || n.contains(".theta-")).toSeq
      } finally s.close()
    }
    assert(sidecars().size == 4, s"2 files x 2 sidecars expected: ${sidecars()}")
    t.vacuum(retainVersions = 1)
    assert(sidecars().size == 2,
      s"the dead v1 file must take its sidecars: ${sidecars()}")
    // the survivor still answers
    assert(t.approxQuantiles("v", Seq(0.5)).contains(Seq(14.0)))
  }

  test("/describe serves p50/p95 from the sidecars, zero data scan") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableSketch(kllColumns = Seq("v"))
    t.append((0L until 50L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val json = t.describeJson()
    assert(json.contains("\"p50_approx\""), json)
    assert(json.contains("\"p95_approx\""), json)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = mapper.readTree(json)
    import scala.jdk.CollectionConverters._
    val vCol = n.get("columns").elements().asScala
      .find(_.get("name").asText == "v").get
    // 0..49, exact mode: inclusive p50 is 24, p95 is 47
    assert(vCol.get("p50_approx").asDouble == 24.0)
    assert(vCol.get("p95_approx").asDouble == 47.0)
    // non-kll column carries no quantile fields
    val idCol = n.get("columns").elements().asScala
      .find(_.get("name").asText == "id").get
    assert(!idCol.has("p50_approx"))
  }

  test("OPTIMIZE restores sketch coverage over pre-enablement files") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    // TWO pre-enablement files (compact no-ops on a single small file)
    t.append((0L until 15L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    t.append((15L until 30L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    t.enableSketch(kllColumns = Seq("v"), thetaColumns = Seq("id"))
    assert(t.approxQuantiles("v", Seq(0.5)).isEmpty,
      "premise: the pre-enablement files block the answer")
    // compaction rewrites every file through the stats job → sidecars
    t.compact(targetBytes = 1L << 30)
    assert(t.approxQuantiles("v", Seq(0.5)).contains(Seq(14.0)))
    assert(t.approxKeyOverlap("id").contains(30L))
  }

  test("CBO gets a KLL-fed equi-height histogram: skew-aware, no ANALYZE") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    // histogram needs BOTH sidecar families: KLL for bin bounds, NDV
    // for the per-bin distinct estimate
    t.enableSketch(kllColumns = Seq("v"))
    t.enableNdv(Seq("v"))
    // heavily skewed: 900 values in [0,1), 100 in [100,101) — a
    // uniform [min,max] assumption would misplace every quantile
    val skewed = (0 until 900).map(i => (i.toLong, i / 900.0)) ++
      (0 until 100).map(i => (900L + i, 100.0 + i / 100.0))
    t.append(skewed.toDF("id", "v").repartition(2))
    val rel = t.scan().queryExecution.logical.collectFirst {
      case r: graft.plans.VTableRelation => r
    }.get
    val stats = rel.computeStats()
    val vAttr = rel.output.find(_.name == "v").get
    val cs = stats.attributeStats(vAttr)
    assert(cs.histogram.isDefined, "kll+ndv coverage must attach a histogram")
    val h = cs.histogram.get
    // equi-height: height * bins == non-null count
    assert(math.round(h.height * h.bins.length) == 1000L)
    // bins are monotone and track the skew: the 90th-percentile
    // boundary still sits in the dense [0,1) mass, not midway to 100
    val bounds = h.bins.map(_.lo) :+ h.bins.last.hi
    assert(bounds.zip(bounds.tail).forall { case (a, b) => a <= b })
    val p90bin = h.bins((h.bins.length * 9) / 10 - 1)
    assert(p90bin.hi <= 1.0,
      s"90% of mass is below 1.0 but bin ends at ${p90bin.hi}")
    assert(h.bins.last.hi >= 100.0)
    // id column: kll-unconfigured → no histogram, but stats still flow
    val idAttr = rel.output.find(_.name == "id").get
    assert(stats.attributeStats(idAttr).histogram.isEmpty)
  }

  test("a shallow clone answers from the source's sidecars once it opts in") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sketch-clone")
    val t = VersionedTable(spark, s"$root/src")
    t.enableSketch(kllColumns = Seq("v"), thetaColumns = Seq("id"))
    t.append((0L until 50L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val c = t.cloneTo(s"$root/clone")
    // index CONFIG does not carry (same contract as bloom/NDV): the
    // clone answers nothing until it opts in itself ...
    assert(c.approxQuantiles("v", Seq(0.5)).isEmpty)
    c.enableSketch(kllColumns = Seq("v"), thetaColumns = Seq("id"))
    // ... and then the SOURCE files' sidecars resolve in place through
    // the clone's external references — zero-copy metadata answers
    assert(c.approxQuantiles("v", Seq(0.5)).contains(Seq(24.0)))
    assert(c.approxKeyOverlap("id", other = t).contains(50L),
      "clone vs source share all 50 keys")
  }

  test("a stream-fed table serves metadata quantiles: sidecars ride the sink's commits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sketch-stream")
    val tableDir = s"$root/t"
    // enable BEFORE the stream starts: every epoch's commit then runs
    // the one-pass stats job and lands kll/theta sidecars
    VersionedTable(spark, tableDir).enableSketch(
      kllColumns = Seq("v"), thetaColumns = Seq("id"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val q = graft.streaming.VTableStreamSink(tableDir, s"$root/chk")
      .start(input.toDS().toDF("id", "v"))
    try {
      input.addData((0L until 30L).map(i => (i, i.toDouble)): _*)
      q.processAllAvailable()
      input.addData((30L until 50L).map(i => (i, i.toDouble)): _*)
      q.processAllAvailable()
      val t = VersionedTable(spark, tableDir)
      // 0..49 exact mode: inclusive p50 = 24
      assert(t.approxQuantiles("v", Seq(0.5)).contains(Seq(24.0)),
        "a stream-fed table must answer quantiles from metadata")
      assert(t.approxKeyOverlap("id").contains(50L))
      // epoch 1's snapshot answers its own-era question too
      assert(t.approxQuantiles("v", Seq(0.5), version = 1).contains(Seq(14.0)))
    } finally q.stop()
  }

  test("table_stats TVF: per-column best-effort metadata stats incl. quantiles") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableSketch(kllColumns = Seq("v"))
    t.enableNdv(Seq("id"))
    t.append((0L until 50L).map(i => (i, i.toDouble, s"s$i")).toDF("id", "v", "name")
      .coalesce(1))
    t.append((50L until 80L).map(i => (i, i.toDouble, s"s$i")).toDF("id", "v", "name")
      .coalesce(1))
    graft.functions.GraftFunctions.register(spark)
    val rows = spark.sql(s"SELECT * FROM table_stats('${t.dir}')").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("id", "v", "name"))
    assert(rows("v").getAs[Long]("n_rows") == 80L)
    assert(rows("v").getAs[Long]("n_nulls") == 0L)
    // kll coverage → quantiles; 0..79 exact mode: inclusive p50 = 39
    assert(rows("v").getAs[Double]("p50_approx") == 39.0)
    assert(rows("id").isNullAt(rows("id").fieldIndex("p50_approx")),
      "no kll sidecar on id → null quantiles, not a refusal")
    assert(rows("id").getAs[Long]("n_distinct") == 80L)
    // strings: exact null counts, no numeric bounds served
    assert(rows("name").isNullAt(rows("name").fieldIndex("min_val")))
    // version pin sees the old snapshot
    val v1 = spark.sql(s"SELECT * FROM table_stats('${t.dir}', 1)").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(v1("v").getAs[Long]("n_rows") == 50L)
    assert(v1("v").getAs[Double]("p50_approx") == 24.0)
  }

  test("sketch columns refuse rename (sidecar files are name-keyed)") {
    import spark.implicits._
    val t = VersionedTable(spark, tmp())
    t.enableSketch(kllColumns = Seq("v"))
    t.append((0L until 5L).map(i => (i, i.toDouble)).toDF("id", "v").coalesce(1))
    val e = intercept[IllegalArgumentException] { t.renameColumn("v", "w") }
    assert(e.getMessage.contains("sidecar"), e.getMessage)
  }
}
