package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.service.QueryService
import graft.sources.Catalog

class SourcesSpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-test").toString

  test("csv/json/orc round-trip through Catalog providers") {
    val cat = new Catalog(spark)
    val nation = tables.nation
    val base = tmp()
    for (fmt <- Seq("csv", "json", "orc")) {
      val path = s"$base/$fmt"
      val w = nation.write.mode("overwrite")
      fmt match {
        case "csv" => w.option("header", "true").csv(path)
        case "json" => w.json(path)
        case "orc" => w.orc(path)
      }
      val back = cat.read(fmt, path)
      assert(back.count() == 25, fmt)
      val names = back.select("n_name").collect().map(_.getString(0)).toSet
      val orig = nation.select("n_name").collect().map(_.getString(0)).toSet
      assert(names == orig, fmt)
    }
  }

  test("permissive ingest quarantines corrupt records instead of failing the batch") {
    import org.apache.spark.sql.functions.col
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      """{"id": 1, "name": "ok"}
        |{"id": 2, "name": "fine"}
        |{"id": oops not json
        |""".stripMargin.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val cat = new Catalog(spark)
    // the "schema" option pins the DDL (incl. the quarantine column);
    // PERMISSIVE mode lands malformed lines there instead of raising
    val df = cat.read("json", dir, Map(
      "schema" -> "id BIGINT, name STRING, _corrupt_record STRING",
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> "_corrupt_record")).cache()
    try {
      assert(df.count() == 3)
      assert(df.filter(col("_corrupt_record").isNull).count() == 2)
      val bad = df.filter(col("_corrupt_record").isNotNull).collect()
      assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record").contains("oops"))
      // same schema option on csv pins types without inference
      val csvDir = tmp()
      java.nio.file.Files.write(java.nio.file.Paths.get(csvDir, "part-0.csv"),
        "id,name\n1,ok\n2,fine\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val csv = cat.read("csv", csvDir, Map("schema" -> "id BIGINT, name STRING"))
      assert(csv.schema.map(_.dataType.simpleString) == Seq("bigint", "string"))
      assert(csv.count() == 2)
    } finally { df.unpersist(); () }
  }

  test("text round-trip: raw corpus lines through Catalog read and write") {
    val cat = new Catalog(spark)
    val path = tmp() + "/raw_docs"
    // land the documents' text as a raw dump (one line per doc — the
    // synthetic corpus is newline-free), then read it back
    cat.write(tables.documents.select(col("text")), "text", path)
    val back = cat.read("text", path)
    assert(back.schema.fieldNames.toSeq == Seq("value"))
    assert(back.count() == tables.documents.count())
    // wholetext reads each file as ONE row
    val whole = cat.read("text", path, Map("wholetext" -> "true"))
    assert(whole.count() < back.count())
    // write side rejects multi-column frames like DataFrameWriter.text
    intercept[org.apache.spark.sql.AnalysisException] {
      cat.write(tables.nation, "text", tmp() + "/bad")
    }
    ()
  }

  test("binaryFile ingest: media files arrive as (path, length, content) rows") {
    val cat = new Catalog(spark)
    val dir = tmp() + "/media"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.bin"),
      Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.wav"),
      Array[Byte](9, 8, 7))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "skip.txt"),
      "not media".getBytes)
    val all = cat.read("binaryFile", dir)
    assert(all.count() == 3)
    // extension filtering stays in the source (pathGlobFilter), so
    // non-media files never reach the decode stage
    val wav = cat.read("binaryFile", dir, Map("pathGlobFilter" -> "*.wav"))
    val row = wav.select("path", "length", "content").collect()
    assert(row.length == 1)
    assert(row(0).getAs[Long]("length") == 3L)
    assert(row(0).getAs[Array[Byte]]("content").toSeq == Seq[Byte](9, 8, 7))
  }

  test("unknown format raises a helpful error") {
    val cat = new Catalog(spark)
    val e = intercept[IllegalArgumentException](cat.read("csv2", "/tmp/x"))
    assert(e.getMessage.contains("csv2") && e.getMessage.contains("supported"))
  }

  test("partitioned write prunes partitions on read") {
    val base = tmp() + "/orders_by_status"
    tables.orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(base)
    val pruned = spark.read.parquet(base).filter(col("o_orderstatus") === "O")
    // partition pruning happens in the scan's PartitionFilters (the
    // logical inputFiles listing is pre-pruning)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderstatus"),
      s"no partition filter in:\n$plan")
    val expected = tables.orders.filter(col("o_orderstatus") === "O").count()
    assert(pruned.count() == expected)
  }

  test("QueryService registers sources, runs SQL, caches by name") {
    val svc = new QueryService(spark)
    val base = tmp()
    tables.region.write.mode("overwrite").parquet(s"$base/region_svc")
    svc.registerSource("region_svc", "parquet", s"$base/region_svc")
    val df = svc.sql("SELECT count(*) AS n FROM region_svc")
    assert(df.head().getLong(0) == 5)
    svc.submit("asia_only", "SELECT * FROM region_svc WHERE r_name = 'ASIA'")
    assert(svc.sql("SELECT * FROM asia_only").count() == 1)
    svc.cache("asia_only")
    assert(spark.catalog.isCached("asia_only"))
    svc.uncache("asia_only")
    assert(!spark.catalog.isCached("asia_only"))
    assert(svc.listTables().contains("region_svc"))
  }

  test("sqlJson returns bounded JSON rows (the REST response shape)") {
    val svc = new QueryService(spark)
    tables.nation.createOrReplaceTempView("nation_json")
    val rows = svc.sqlJson("SELECT n_nationkey, n_name FROM nation_json ORDER BY n_nationkey", limit = 3)
    assert(rows.length == 3)
    assert(rows.head.startsWith("{") && rows.head.contains("\"n_nationkey\":0"))
    // null fields keep their key (consistent row shape for consumers)
    val withNull = svc.sqlJson(
      "SELECT n_nationkey, CASE WHEN n_nationkey = 0 THEN NULL ELSE n_name END AS maybe " +
        "FROM nation_json ORDER BY n_nationkey", limit = 1)
    assert(withNull.head.contains("\"maybe\":null"), withNull.head)
  }

  test("explain endpoint returns the physical plan without executing") {
    val svc = new QueryService(spark)
    tables.lineitem.createOrReplaceTempView("li_explain")
    val plan = svc.explain(
      "SELECT l_returnflag, sum(l_quantity) FROM li_explain " +
        "WHERE l_quantity > 10 GROUP BY l_returnflag")
    assert(plan.contains("Physical Plan"))
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"))
  }

  test("jdbc provider builds a reader plan even with a bogus driver") {
    val cat = new Catalog(spark)
    // constructing the JDBC read fails only at connect time with no
    // driver; the provider path itself must resolve the format
    val e = intercept[Throwable] {
      cat.read("jdbc", "jdbc:postgresql://nohost/db",
        Map("dbtable" -> "t", "driver" -> "no.such.Driver")).count()
    }
    assert(e != null)
  }

  test("Catalog.write lands data in each format, including vtable append") {
    val cat = new Catalog(spark)
    val base = tmp()
    cat.write(tables.region, "parquet", s"$base/r_pq")
    assert(cat.read("parquet", s"$base/r_pq").count() == 5)
    cat.write(tables.region, "vtable", s"$base/r_vt", mode = "append")
    cat.write(tables.region, "vtable", s"$base/r_vt", mode = "append")
    assert(cat.read("vtable", s"$base/r_vt").count() == 10)
    assert(cat.read("vtable", s"$base/r_vt", Map("version" -> "1")).count() == 5)
    // default mode=overwrite REPLACES the snapshot (v3), honoring the
    // signature's contract instead of silently appending
    cat.write(tables.region, "vtable", s"$base/r_vt")
    assert(cat.read("vtable", s"$base/r_vt").count() == 5)
    intercept[IllegalArgumentException](
      cat.write(tables.region, "vtable", s"$base/r_vt", mode = "ignore"))
    intercept[IllegalArgumentException](cat.write(tables.region, "nope", base))
  }

  test("jdbc round-trip executes against embedded Derby") {
    // Derby ships in the Spark jars directory (the Hive metastore
    // backend), so the JDBC provider can be exercised at EXECUTION,
    // not just plan construction: write nation out, read it back.
    val url = "jdbc:derby:memory:graftdb;create=true"
    val props = Map(
      "dbtable" -> "nation_jdbc",
      "driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    tables.nation.select("n_nationkey", "n_name")
      .write.format("jdbc")
      .option("url", url).options(props).mode("overwrite").save()
    val back = new Catalog(spark).read("jdbc", url, props)
    assert(back.count() == 25)
    val names = back.select("n_name").collect().map(_.getString(0).trim).toSet
    val orig = tables.nation.select("n_name").collect().map(_.getString(0)).toSet
    assert(names == orig)
  }

  test("federated query: JDBC dim scan broadcasts, answer matches all-parquet") {
    val fed = graft.sources.Federated.qFederated(tables)
    // Plan shape: the external dim arrives through a JDBC row scan and
    // joins broadcast — the facts never shuffle toward the warehouse.
    val plan = fed.queryExecution.executedPlan.toString
    assert(plan.contains("Scan JDBCRelation"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // Faithfulness: federation may not change the answer.
    val direct = tables.orders.select("o_custkey", "o_totalprice")
      .join(tables.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(tables.nation.select("n_nationkey", "n_name"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"),
        graft.operators.Rnd.round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("n_name")
    assert(fed.collect().toSeq == direct.collect().toSeq)
  }
}
