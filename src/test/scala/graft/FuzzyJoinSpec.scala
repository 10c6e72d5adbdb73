package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** Prefix-filtered edit-distance join: lossless vs brute force on
  * adversarial shapes, plan shape, and the contract mutation
  * (SURVEY §2.1).
  */
class FuzzyJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("lossless vs brute force on repeated-gram, short, and empty strings at d=2") {
    val a = Seq(
      (1L, "aaaaaa"),       // one distinct gram — the set-semantics edge
      (2L, "abcdefgh"),
      (3L, "ab"),           // shorter than q: no grams at all
      (4L, ""),             // empty
      (5L, "xyzxyzxyz"),
      (6L, "mississippi")).toDF("id", "s")
    val b = Seq(
      (11L, "aaabaa"),      // ed 1 from aaaaaa (substitution)
      (12L, "abcdefgh"),    // exact
      (13L, "abzdefgh"),    // ed 1
      (14L, "b"),           // ed 1 from "ab", 1 from ""
      (15L, "xyzxyzxy"),    // ed 1 deletion
      (16L, "mississippe"), // ed 1
      (17L, "zzzzzzzz"),    // far from everything
      (18L, "abcd")).toDF("id", "s")
    val got = pairs(FuzzyJoin.edJoin(a, b, maxDist = 2))
    val want = pairs(FuzzyJoin.edJoinBrute(a, b, maxDist = 2))
    assert(got == want,
      s"missing=${(want -- got).mkString(",")} extra=${(got -- want).mkString(",")}")
    // and the adversarial hits are actually in there
    assert(want.contains((1L, 11L, 1)) && want.contains((3L, 14L, 1)) &&
      want.contains((4L, 14L, 1)) && want.contains((5L, 15L, 1)))
  }

  test("lossless at d=2 in the below-pick-floor window (q <= len < q*(d+1)): multi-edit pairs with zero shared grams") {
    // the counterexample family the pick guarantee can't cover: both
    // sides long enough to HAVE grams (len >= q) but too short to own
    // q*d+1 occurrences (len < q*(d+1) = 9), with d=2 edits placed to
    // destroy EVERY q-gram — these must ride the length-band path
    val a = Seq(
      (1L, "abcdefgh"),  // len 8, the advisor's exact counterexample
      (2L, "abcdef"),    // len 6
      (3L, "abcde"),     // len 5
      (4L, "abcd"),      // len 4
      (5L, "abc")).toDF("id", "s") // len 3 — minimum with a gram
    val b = Seq(
      (11L, "abXdeYgh"), // ed 2 from abcdefgh, zero shared 3-grams
      (12L, "aXcdYf"),   // ed 2 from abcdef, zero shared 3-grams
      (13L, "aXcYe"),    // ed 2 from abcde
      (14L, "aXcY"),     // ed 2 from abcd
      (15L, "aXY"),      // ed 2 from abc
      (16L, "abXdeYghZ"),// len 9: ed 3 from a1 — must NOT match at d=2
      (17L, "qqqqqqqq")).toDF("id", "s")
    val got = pairs(FuzzyJoin.edJoin(a, b, maxDist = 2))
    val want = pairs(FuzzyJoin.edJoinBrute(a, b, maxDist = 2))
    assert(got == want,
      s"missing=${(want -- got).mkString(",")} extra=${(got -- want).mkString(",")}")
    assert(want.contains((1L, 11L, 2)) && want.contains((2L, 12L, 2)) &&
      want.contains((3L, 13L, 2)) && want.contains((4L, 14L, 2)) &&
      want.contains((5L, 15L, 2)))
  }

  test("lossless at d=2 on dense random mutations spanning the pick-floor boundary") {
    // randomized-but-seeded sweep: lengths 3..14 cross gramFloor=9 on
    // both sides; mutations are 0..2 random substitutions/deletions/
    // insertions so pairs land on both sides of the threshold
    val rnd = new scala.util.Random(42)
    val alpha = "abcd" // tiny alphabet → dense collisions
    def randStr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val base = (1L to 60L).map(i => (i, randStr(3 + rnd.nextInt(12))))
    def mutate(s: String): String = {
      var cur = s
      (1 to rnd.nextInt(3)).foreach { _ =>
        if (cur.isEmpty) cur = alpha(rnd.nextInt(alpha.length)).toString
        else rnd.nextInt(3) match {
          case 0 => val i = rnd.nextInt(cur.length) // substitute
            cur = cur.updated(i, alpha(rnd.nextInt(alpha.length)))
          case 1 => val i = rnd.nextInt(cur.length) // delete
            cur = cur.take(i) + cur.drop(i + 1)
          case _ => val i = rnd.nextInt(cur.length + 1) // insert
            cur = cur.take(i) + alpha(rnd.nextInt(alpha.length)) + cur.drop(i)
        }
      }
      cur
    }
    val a = base.toDF("id", "s")
    val b = base.map { case (i, s) => (i + 1000L, mutate(s)) }.toDF("id", "s")
    val got = pairs(FuzzyJoin.edJoin(a, b, maxDist = 2))
    val want = pairs(FuzzyJoin.edJoinBrute(a, b, maxDist = 2))
    assert(got == want,
      s"missing=${(want -- got).mkString(",")} extra=${(got -- want).mkString(",")}")
    assert(want.nonEmpty)
  }

  test("lossless at d=2 across the deletion/gram regime boundary (len straddles DeletionMaxLen)") {
    // strings on both sides of the 32-char split, incl. pairs that
    // STRADDLE it (a short, b long and vice versa) — the deletion
    // branch must cover every short-a pair and the gram branch every
    // long-a pair, with no seam
    val base = "abcdefghijklmnopqrstuvwxyz01234" // 31 chars (short side)
    val long = base + "XYZAB" // 36 chars (gram side)
    val a = Seq(
      (1L, base),                         // 31: deletion regime
      (2L, base + "5"),                   // 32: gram regime, boundary
      (3L, long),                         // 36: gram regime
      (4L, base.take(30))).toDF("id", "s")
    val b = Seq(
      (11L, base.take(29) + "Q34"),       // ed 2 from base (len 32: straddles)
      (12L, base + "56"),                 // 33: ed 1 from a2
      (13L, long.take(33) + "ZZZ"),       // ed 3 from a3: excluded
      (14L, base.take(12) + "QQ" + base.drop(14)), // ed 2 from base, len 31
      (15L, long.dropRight(2) + "BA")).toDF("id", "s") // ed 2 from long
    val got = pairs(FuzzyJoin.edJoin(a, b, maxDist = 2))
    val want = pairs(FuzzyJoin.edJoinBrute(a, b, maxDist = 2))
    assert(got == want,
      s"missing=${(want -- got).mkString(",")} extra=${(got -- want).mkString(",")}")
    // straddling pairs present on both sides of the split
    assert(want.contains((1L, 11L, 1)) && want.contains((2L, 12L, 1)) &&
      want.contains((3L, 15L, 2)) && want.contains((1L, 14L, 2)) &&
      want.contains((4L, 11L, 2)))
  }

  test("lossless at d=2 with raised gram width q=12: lengths in [DeletionMaxLen, 3q) stay covered") {
    // with q = 12 the pick floor 3q = 36 exceeds DeletionMaxLen = 32;
    // the split must widen so left strings in [32, 36) ride the
    // deletion branch — pre-fix they fell in NEITHER branch and their
    // pairs silently vanished. The pair below has ZERO shared 12-grams
    // (edits at 1-based positions 12 and 23 touch every gram of a
    // 33-char string), so only the deletion branch can find it.
    val s33 = "abcdefghijklmnopqrstuvwxyz0123456" // 33 chars
    val s33m = s33.updated(11, 'X').updated(22, 'Y') // ed 2, no shared grams
    val s40 = "abcdefghijklmnopqrstuvwxyz01234567890123" // 40: gram regime at q=12
    val a = Seq((1L, s33), (2L, s40), (3L, "short")).toDF("id", "s")
    val b = Seq((11L, s33m), (12L, s40.dropRight(2) + "XY"),
      (13L, "shoXY"), (14L, "far away string")).toDF("id", "s")
    val got = pairs(FuzzyJoin.edJoin(a, b, maxDist = 2, q = 12))
    val want = pairs(FuzzyJoin.edJoinBrute(a, b, maxDist = 2))
    assert(got == want,
      s"missing=${(want -- got).mkString(",")} extra=${(got -- want).mkString(",")}")
    assert(want.contains((1L, 11L, 2)) && want.contains((2L, 12L, 2)) &&
      want.contains((3L, 13L, 2)))
  }

  test("lossless vs brute force on a real part-name slice with the contract mutation at d=1") {
    val slice = tables.part.filter(col("p_partkey") <= 150)
    val clean = slice.select(col("p_partkey").as("id"), col("p_name").as("s"))
    val dirty = slice.select((col("p_partkey") + lit(1000000L)).as("id"),
      when(col("p_partkey") % 3 === 0,
        concat(substring(col("p_name"), 1, 2), expr("substr(p_name, 4)")))
        .when(col("p_partkey") % 3 === 1, col("p_name"))
        .otherwise(concat(substring(col("p_name"), 1, 4), lit("x"),
          expr("substr(p_name, 6)"))).as("s"))
    val got = pairs(FuzzyJoin.edJoin(clean, dirty, maxDist = 1))
    assert(got == pairs(FuzzyJoin.edJoinBrute(clean, dirty, maxDist = 1)))
    // every mutated row must find its origin (all mutations are ed<=1)
    val n = slice.count()
    val selfPairs = got.filter { case (aId, bId, _) => bId - 1000000L == aId }
    assert(selfPairs.size == n, s"${selfPairs.size} of $n mutations matched its origin")
  }

  test("plan: candidate generation is equi-join only — no cartesian, no nested loop") {
    val q = FuzzyJoin.qEditJoin(tables)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }

  test("maxDist=0 degenerates to exact string match") {
    val a = Seq((1L, "same"), (2L, "other")).toDF("id", "s")
    val b = Seq((11L, "same"), (12L, "othex")).toDF("id", "s")
    assert(pairs(FuzzyJoin.edJoin(a, b, maxDist = 0)) == Set((1L, 11L, 0)))
  }
}
