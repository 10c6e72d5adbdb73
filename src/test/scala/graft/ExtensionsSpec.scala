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
}
