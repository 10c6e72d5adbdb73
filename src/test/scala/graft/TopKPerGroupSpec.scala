package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup

/** The custom physical operator must be row-identical to the window
  * spelling (with a total ordering), and must actually plan as two
  * bounded-heap passes with no window/sort.
  */
class TopKPerGroupSpec extends SparkSpecBase {

  import spark.implicits._

  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
      .filter(col("__rn") <= k).drop("__rn")

  test("matches row_number()<=k across ties, small groups, and k>group") {
    // 40 groups; duplicate v values force tiebreaking through id;
    // group 0 has 1 row (< k), group 1 exactly k rows
    val rows = (0 until 2000).map { i =>
      val g = if (i == 0) 0 else 1 + (i % 39)
      (g.toLong, (i * 2654435761L % 97).toDouble, i.toLong)
    }
    val df = rows.toDF("g", "v", "id")
    val k = 5
    val got = TopKPerGroup(df, Seq("g"), Seq(col("v").desc, col("id").asc), k)
    assert(got.collect().toSet == windowed(df, k).collect().toSet)
    // every group retains min(k, |group|) rows
    val sizes = got.groupBy("g").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes(0L) == 1L)
    assert(sizes.filter(_._1 > 0).values.forall(_ == k.toLong))
  }

  test("plans as partial+final heap passes: no window, no sort, one exchange") {
    val df = (0 until 100).map(i => (i % 7, i.toDouble, i)).toDF("g", "v", "id")
    val got = TopKPerGroup(df, Seq("g"), Seq(col("v").desc, col("id").asc), 3)
    got.collect()
    // AQE wraps the final plan, so assert on the rendered tree: one
    // partial (", true") and one final (", false") TopKPerGroup pass
    // around a hash exchange, and neither a window nor a sort anywhere
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup ") && plan.contains(", true")
      && plan.contains(", false"), s"want partial+final heap passes:\n$plan")
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    assert(!plan.contains("Sort"), s"sort crept in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"no exchange between passes:\n$plan")
  }

  test("ascending order and multi-column grouping work") {
    val df = Seq((1, 1, 9.0, 1L), (1, 1, 2.0, 2L), (1, 2, 5.0, 3L),
      (2, 1, 7.0, 4L), (2, 1, 8.0, 5L)).toDF("a", "b", "v", "id")
    val got = TopKPerGroup(df.withColumnRenamed("a", "g")
        .withColumn("g2", col("b")), Seq("g", "g2"),
      Seq(col("v").asc, col("id").asc), 1)
    val expect = Set((1, 1, 2.0, 2L), (1, 2, 5.0, 3L), (2, 1, 7.0, 4L))
    assert(got.select("g", "g2", "v", "id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet == expect)
  }

  test("rejects computed ordering expressions and unknown columns") {
    val df = Seq((1, 2.0, 3L)).toDF("g", "v", "id")
    intercept[IllegalArgumentException] {
      TopKPerGroup(df, Seq("g"), Seq((col("v") * 2).asc), 1)
    }
    intercept[IllegalArgumentException] {
      TopKPerGroup(df, Seq("nope"), Seq(col("v").asc), 1)
    }
    intercept[IllegalArgumentException] {
      TopKPerGroup(df, Seq("g"), Seq(col("v").asc), 0)
    }
  }
}
