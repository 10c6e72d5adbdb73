package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.VersionedTable

/** Commits with no bloom/NDV index derive per-file stats from the
  * parquet footers the write already produced (no second data pass).
  * These tests pin the contract: footer-derived stats must be
  * BEHAVIORALLY indistinguishable from the aggregation-job stats —
  * pruned reads equal plain filtered reads on corpora built to break
  * the guards (NaN, signed zeros, astral-plane strings, wide strings
  * past the truncation cap, nulls, an all-null column), and the
  * metadata fast paths (COUNT(*), COUNT(col), MIN/MAX) stay exact.
  */
class FooterStatsSpec extends SparkSpecBase {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-fstats").toString + s"/$name"

  /** Nasty corpus: longs with nulls, doubles with NaN and ±0.0,
    * strings incl. astral plane + wide (> truncation cap), an
    * all-null column.
    */
  private def nasty(seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val astral = Array("😀", "𪘀", "z𐀀", "ascii", "épée", "中文")
    val rows = (0 until 400).map { i =>
      val l: java.lang.Long = if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(rnd.nextLong() % 1000)
      val d: java.lang.Double =
        if (rnd.nextInt(20) == 0) java.lang.Double.valueOf(Double.NaN)
        else if (rnd.nextInt(10) == 0) java.lang.Double.valueOf(if (rnd.nextBoolean()) 0.0 else -0.0)
        else java.lang.Double.valueOf(rnd.nextGaussian())
      val s: String =
        if (rnd.nextInt(15) == 0) null
        else if (rnd.nextInt(10) == 0) astral(rnd.nextInt(astral.length)) * (1 + rnd.nextInt(40))
        else rnd.alphanumeric.take(1 + rnd.nextInt(120)).mkString
      Row(i.toLong, l, d, s, null)
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("k", LongType, nullable = true),
      StructField("x", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("dead", StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  test("footer-stats pruned reads ≡ plain filtered reads on hostile corpora") {
    (1 to 3).foreach { seed =>
      val t = VersionedTable(spark, tmp(s"beh$seed"))
      // 3 single-file commits → footer stats per file (no index config)
      (0 until 3).foreach(j => t.append(nasty(seed * 10 + j).coalesce(1)))
      val full = t.read()
      def same(p: org.apache.spark.sql.Column): Unit = {
        val pruned = t.readWhere(p).collect().map(_.toString).sorted.toSeq
        val plain = full.where(p).collect().map(_.toString).sorted.toSeq
        assert(pruned == plain, s"seed=$seed predicate=$p")
      }
      same(col("k") === 37L)
      same(col("k").between(-200L, 150L))
      same(col("x") > 0.0)
      same(col("x") <= -0.0)
      same(col("x") === 0.0)
      same(col("s") === "😀")
      same(col("s") >= "z")
      same(col("s") < "A")
      same(col("s").isNull)
      same(col("dead").isNull)
      same(col("id").isin(5L, 399L, 4000L))
    }
  }

  test("metadata COUNT/MIN/MAX/COUNT(col) stay exact from footer stats") {
    val t = VersionedTable(spark, tmp("meta"))
    (0 until 2).foreach(j => t.append(nasty(77 + j).coalesce(1)))
    t.scan().createOrReplaceTempView("__graft_fstats_meta")
    val q = spark.sql(
      "SELECT count(*) AS n, count(k) AS nk, count(dead) AS nd, min(id) AS lo, max(id) AS hi FROM __graft_fstats_meta")
    val r = q.head()
    val e = t.read().agg(count(lit(1)), count(col("k")), count(col("dead")),
      min("id"), max("id")).head()
    assert(r.getLong(0) == e.getLong(0) && r.getLong(1) == e.getLong(1) &&
      r.getLong(2) == e.getLong(2) && r.getLong(3) == e.getLong(3) &&
      r.getLong(4) == e.getLong(4))
    // the metadata aggregate planned no scan
    import org.apache.spark.sql.execution.FileSourceScanExec
    q.collect()
    val scans = q.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.isEmpty, "footer-stats metadata aggregate must not scan files")
  }

  test("footer and aggregation paths publish identical table-level stats") {
    val df = nasty(5).filter(col("x").isNotNull && !isnan(col("x"))) // NaN col entry drops in both
    val plainT = VersionedTable(spark, tmp("plain"))
    plainT.append(df.coalesce(1))
    val aggT = VersionedTable(spark, tmp("agg"))
    aggT.enableNdv(Seq("id")) // any index config forces the agg-job path
    aggT.append(df.coalesce(1))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val a = om.readTree(plainT.describeJson())
    val b = om.readTree(aggT.describeJson())
    assert(a.get("rows") == b.get("rows"))
    import scala.jdk.CollectionConverters._
    val byName = (n: com.fasterxml.jackson.databind.JsonNode) =>
      n.get("columns").elements().asScala.map(c => c.get("name").asText() -> c).toMap
    val (ca, cb) = (byName(a), byName(b))
    Seq("id", "k", "x", "s").foreach { c =>
      assert(ca(c).get("non_null") == cb(c).get("non_null"), s"non_null($c)")
      // numeric bounds identical; string bounds share the truncation
      // contract so they match too
      assert(ca(c).get("min") == cb(c).get("min"), s"min($c): ${ca(c)} vs ${cb(c)}")
      assert(ca(c).get("max") == cb(c).get("max"), s"max($c): ${ca(c)} vs ${cb(c)}")
    }
  }

  test("multi-row-group files merge footer stats soundly") {
    // tiny row groups force several blocks per file
    val t = VersionedTable(spark, tmp("rg"))
    withParquetConf("parquet.block.size" -> (64 * 1024).toString) {
      val wide = spark.range(20000).select(col("id"),
        concat(lit("v"), lpad(col("id").cast("string"), 200, "0")).as("pad"))
      t.append(wide.coalesce(1))
    }
    val q = t.readWhere(col("id").between(5000L, 5002L))
    assert(q.count() == 3)
    assert(t.scan().groupBy().agg(min("id"), max("id")).head() == Row(0L, 19999L))
  }

  private def withParquetConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) =>
      k -> Option(spark.sparkContext.hadoopConfiguration.get(k)) }
    pairs.foreach { case (k, v) => spark.sparkContext.hadoopConfiguration.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.sparkContext.hadoopConfiguration.set(k, v)
      case (k, None)    => spark.sparkContext.hadoopConfiguration.unset(k)
    }
  }
}
