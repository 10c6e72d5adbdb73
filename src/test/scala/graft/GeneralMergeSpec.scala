package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.service.QueryService
import graft.sources.VersionedTable

/** Randomized property gate for the general MERGE lowering: random
  * clause combinations over random data, compared row-by-row against
  * a plain in-memory MERGE interpreter. The SQL text and the model
  * are generated from the SAME clause descriptors, so any divergence
  * is a lowering bug (branch membership, first-match order, defaults,
  * batch assembly), not a generator mismatch. Keys are unique on both
  * sides by construction — the cardinality-violation paths have their
  * own deterministic tests in SqlDmlSpec.
  */
class GeneralMergeSpec extends SparkSpecBase {

  /** One WHEN clause: where it applies, its SQL text, the model's
    * condition over (target v, source v, key), and its action —
    * Some(newV) = upsert that value, None = delete the row.
    */
  private case class Clause(branch: String, sql: String,
      cond: (Option[Double], Option[Double], Long) => Boolean,
      act: (Option[Double], Option[Double], Long) => Option[Double])

  private val matchedPool = Seq(
    Clause("matched", "WHEN MATCHED AND s.v > 50 THEN DELETE",
      (_, sv, _) => sv.exists(_ > 50), (_, _, _) => None),
    Clause("matched", "WHEN MATCHED AND t.v < 30 THEN UPDATE SET v = t.v + s.v",
      (tv, _, _) => tv.exists(_ < 30), (tv, sv, _) => Some(tv.get + sv.get)),
    Clause("matched", "WHEN MATCHED THEN UPDATE SET v = s.v",
      (_, _, _) => true, (_, sv, _) => sv))

  private val notMatchedPool = Seq(
    Clause("notMatched", "WHEN NOT MATCHED AND s.v > 20 THEN INSERT (k, v) VALUES (s.k, s.v)",
      (_, sv, _) => sv.exists(_ > 20), (_, sv, _) => sv),
    Clause("notMatched", "WHEN NOT MATCHED THEN INSERT *",
      (_, _, _) => true, (_, sv, _) => sv))

  private val bySourcePool = Seq(
    Clause("bySource", "WHEN NOT MATCHED BY SOURCE AND t.k % 3 = 0 THEN DELETE",
      (_, _, k) => k % 3 == 0, (_, _, _) => None),
    Clause("bySource", "WHEN NOT MATCHED BY SOURCE AND t.v > 40 THEN UPDATE SET v = -1.0",
      (tv, _, _) => tv.exists(_ > 40), (_, _, _) => Some(-1.0)))

  /** First matching clause of the branch, SQL's order semantics. */
  private def applyClauses(clauses: Seq[Clause],
      tv: Option[Double], sv: Option[Double], k: Long): Option[Option[Double]] =
    clauses.find(_.cond(tv, sv, k)).map(_.act(tv, sv, k))

  test("random clause sets match a row-wise MERGE interpreter") {
    (0 until 5).foreach { trial =>
      val rnd = new scala.util.Random(8800 + trial)
      // clause selection: 0-2 matched (ordered sample), 0-1 of each
      // other branch, at least one clause overall
      def pick[A](pool: Seq[A], n: Int): Seq[A] =
        rnd.shuffle(pool).take(n)
      var matched = pick(matchedPool, rnd.nextInt(3))
      var notMatched = pick(notMatchedPool, rnd.nextInt(2))
      var bySource = pick(bySourcePool, rnd.nextInt(2))
      if (matched.isEmpty && notMatched.isEmpty && bySource.isEmpty)
        matched = Seq(matchedPool.last)

      // unique keys both sides; values land around the clause
      // thresholds so every condition exercises both outcomes
      val targetRows = (1L to 20L).map(k => k -> (rnd.nextInt(80) + 1).toDouble).toMap
      val sourceRows = rnd.shuffle((1L to 30L).toList).take(12)
        .map(k => k -> (rnd.nextInt(80) + 1).toDouble).toMap

      val dir = Files.createTempDirectory(s"graft-gm$trial").toString + "/t"
      val vt = VersionedTable(spark, dir)
      import spark.implicits._
      vt.append(targetRows.toSeq.toDF("k", "v"))
      val view = s"gm_t_$trial"
      val srcView = s"gm_s_$trial"
      vt.scan().createOrReplaceTempView(view)
      sourceRows.toSeq.toDF("k", "v").createOrReplaceTempView(srcView)

      val stmt = s"MERGE INTO $view t USING $srcView s ON t.k = s.k " +
        (matched ++ notMatched ++ bySource).map(_.sql).mkString(" ")
      new QueryService(spark).sql(stmt).collect()

      // the model: every key in either world, branch by membership
      val expected = (targetRows.keySet ++ sourceRows.keySet).toSeq.flatMap { k =>
        val tv = targetRows.get(k)
        val sv = sourceRows.get(k)
        val outcome = (tv, sv) match {
          case (Some(_), Some(_)) => applyClauses(matched, tv, sv, k)
          case (None, Some(_))    => applyClauses(notMatched, tv, sv, k)
          case (Some(_), None)    => applyClauses(bySource, tv, sv, k)
          case _                  => None
        }
        outcome match {
          case Some(Some(newV))      => Seq(k -> newV)       // acted: upsert
          case Some(None)            => Seq.empty            // acted: delete
          case None if tv.isDefined  => Seq(k -> tv.get)     // no clause: keep
          case None                  => Seq.empty            // source-only no-op
        }
      }.toMap

      val got = vt.read().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expected,
        s"trial $trial diverged\nstmt: $stmt\n" +
          s"only-model: ${(expected.toSet -- got.toSet).toSeq.sortBy(_._1)}\n" +
          s"only-table: ${(got.toSet -- expected.toSet).toSeq.sortBy(_._1)}")
    }
  }
}
