package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The production injection path: extensions wired through the
  * `spark.sql.extensions` config STRING (cluster spark-defaults),
  * not a builder call — a separate session proves the class-name
  * route resolves and registers the SQL functions.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.functions.GraftExtensions registers SQL functions") {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val fresh = s.newSession() // isolate from any shared-session state
    try {
      val r = fresh.sql(
        "SELECT cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c, " +
          "token_count(' a b  c ') AS n, " +
          "hamming64(7, 0) AS h").head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getInt(1) == 3)
      assert(r.getInt(2) == 3)
    } finally ()
  }

  test("canonical_url pins the dedup identity on adversarial URLs") {
    def c(u: String): String = graft.functions.HashImpl
      .canonicalUrl(org.apache.spark.unsafe.types.UTF8String.fromString(u)).toString
    // case, www, default port, trailing slash, fragment, tracking params
    assert(c("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&gclid=1#frag") ==
      "https://example.com/A/b")
    // path case is PRESERVED (paths are case-sensitive resources)
    assert(c("https://example.com/A") != c("https://example.com/a"))
    // param ORDER is not identity; non-tracking params survive, sorted
    assert(c("https://e.com/p?b=2&a=1") == c("https://e.com/p?a=1&b=2"))
    assert(c("https://e.com/p?a=1&utm_campaign=z&b=2") == "https://e.com/p?a=1&b=2")
    // scheme is identity: http and https do NOT merge
    assert(c("http://e.com/p") != c("https://e.com/p"))
    // http strips ITS default port, not https's
    assert(c("http://e.com:80/p") == "http://e.com/p")
    assert(c("http://e.com:443/p") == "http://e.com:443/p")
    // bare host, root slash, and multiple trailing slashes all collapse
    assert(c("https://e.com") == c("https://e.com/") && c("https://e.com") == c("https://e.com///"))
    // a '?' before any '/' still parses as the query
    assert(c("https://e.com?utm_source=x") == "https://e.com")
    // non-http(s) passes through trimmed, untouched
    assert(c("  mailto:a@b.c ") == "mailto:a@b.c")
    assert(c("ftp://E.com/X") == "ftp://E.com/X")
    // codegen path (SQL) agrees with the kernel
    val viaSql = TestSpark.spark.sql(
      "SELECT canonical_url('HTTPS://WWW.E.com:443/p/?utm_source=1&z=2&a=3#x') AS u")
      .head().getString(0)
    assert(viaSql == "https://e.com/p?a=3&z=2")
  }
}
