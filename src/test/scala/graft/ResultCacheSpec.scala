package graft

import java.nio.file.Files

import graft.service.{QueryService, ResultCache}
import graft.sources.VersionedTable

class ResultCacheSpec extends SparkSpecBase {

  private def svc(): QueryService = new QueryService(spark)

  test("identical and re-spelled statements share one entry; literals don't") {
    import spark.implicits._
    val s = svc()
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").createOrReplaceTempView("rc_t1")
    val (r1, h1) = s.sqlJsonCached("SELECT id FROM rc_t1 ORDER BY id")
    val (r2, h2) = s.sqlJsonCached("select   ID from RC_T1   order by id;")
    assert(!h1 && h2, "re-spelled statement must hit the same entry")
    assert(r1 == r2)
    // a string literal differing only in case is a DIFFERENT query
    val (_, h3) = s.sqlJsonCached("SELECT id FROM rc_t1 WHERE v = 'X' ORDER BY id")
    val (_, h4) = s.sqlJsonCached("SELECT id FROM rc_t1 WHERE v = 'x' ORDER BY id")
    assert(!h3 && !h4, "literal case must split entries")
  }

  test("a vtable commit invalidates dependent entries automatically") {
    import spark.implicits._
    val s = svc()
    val dir = Files.createTempDirectory("graft-rc").toString + "/t"
    val vt = VersionedTable(spark, dir)
    vt.append(Seq((1L, "a")).toDF("id", "name"))
    s.registerSource("rc_vt", "vtable", dir)
    val q = "SELECT count(*) AS n FROM rc_vt"
    val (r1, _) = s.sqlJsonCached(q)
    val (r1b, hot) = s.sqlJsonCached(q)
    assert(hot && r1 == r1b)
    vt.append(Seq((2L, "b")).toDF("id", "name"))
    // the view still reads version 1's files (registration pinned the
    // snapshot), so re-register — the service's refresh signal — and
    // the FINGERPRINT (not the entry) is what must have moved
    s.registerSource("rc_vt", "vtable", dir)
    val (r2, h2) = s.sqlJsonCached(q)
    assert(!h2, "a committed append must invalidate the cached count")
    assert(r1.head.contains("1") && r2.head.contains("2"))
  }

  test("submit bumps the named view's nonce") {
    import spark.implicits._
    val s = svc()
    Seq(1L, 2L, 3L).toDF("id").createOrReplaceTempView("rc_base")
    s.submit("rc_view", "SELECT id FROM rc_base WHERE id <= 2")
    val q = "SELECT count(*) AS n FROM rc_view"
    val (r1, _) = s.sqlJsonCached(q)
    s.submit("rc_view", "SELECT id FROM rc_base")
    val (r2, h2) = s.sqlJsonCached(q)
    assert(!h2, "re-submitting a name must invalidate queries over it")
    assert(r1 != r2)
  }

  test("non-deterministic statements bypass the cache") {
    val s = svc()
    val q = "SELECT rand() AS r"
    val (_, h1) = s.sqlJsonCached(q)
    val (_, h2) = s.sqlJsonCached(q)
    assert(!h1 && !h2)
    assert(s.results.stats == ((0L, 0L)), "bypass must not count as hit or miss")
  }

  test("pages slice the cached prefix; past an incomplete prefix goes live") {
    import spark.implicits._
    val s = svc()
    (1L to 20L).toDF("id").createOrReplaceTempView("rc_wide")
    val rc = new ResultCache(s, capacity = 4, rowCap = 5)
    val q = "SELECT id FROM rc_wide ORDER BY id"
    val (p1, h1) = rc.sqlJson(q, 3, 0)
    assert(!h1 && p1.size == 3)
    val (p2, h2) = rc.sqlJson(q, 2, 3)
    assert(h2, "page within the cached prefix must hit")
    assert(p2.map(r => r.replaceAll("[^0-9]", "")) == Seq("4", "5"))
    // offset+limit reaches past the 5-row incomplete prefix → live path
    val (p3, h3) = rc.sqlJson(q, 5, 3)
    assert(!h3 && p3.size == 5)
    assert(p3.map(r => r.replaceAll("[^0-9]", "")) == (4 to 8).map(_.toString))
  }

  test("normalization keeps quoted spans byte-exact") {
    val s = svc()
    val rc = s.results
    assert(rc.normalize("SELECT  'A  B'  FROM   T") == "select 'A  B' from t")
    assert(rc.normalize("select `Weird  Col` from t;") == "select `Weird  Col` from t")
  }
}
