package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Randomized bound-holding properties for the sketch sidecars: over
  * arbitrary append/overwrite histories and value distributions, the
  * sidecar-merged answers must stay within their sketches' published
  * error envelopes of the exact answers computed from the same
  * snapshot — at EVERY committed version, not just the head. Guards
  * the merge plumbing (per-file build → driver-side union) against
  * silent precision loss, the failure mode exact-mode unit tests
  * can't see.
  */
class SketchSidecarProps extends SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-sketch-prop").toString + "/t"

  test("merged KLL quantiles and theta overlaps hold their bounds over random histories") {
    import spark.implicits._
    (0 until 3).foreach { trial =>
      val rnd = new scala.util.Random(4200 + trial)
      val t = VersionedTable(spark, tmp())
      t.enableSketch(kllColumns = Seq("v"), thetaColumns = Seq("id"))
      // value generator per trial: uniform, heavy-skew, or clustered —
      // KLL's rank bound is distribution-free, so all must pass
      def gen(): Double = trial match {
        case 0 => rnd.nextDouble() * 1000.0
        case 1 => if (rnd.nextInt(10) == 0) 1000.0 + rnd.nextDouble() else rnd.nextDouble()
        case _ => (rnd.nextInt(7) * 100).toDouble + rnd.nextDouble()
      }
      var keyBase = 0L
      (0 until 4).foreach { step =>
        val n = 500 + rnd.nextInt(4000)
        val rows = (0L until n.toLong).map(i => (keyBase + i, gen()))
        val df = rows.toDF("id", "v").repartition(1 + rnd.nextInt(4))
        if (step > 0 && rnd.nextInt(4) == 0) t.overwrite(df) else t.append(df)
        keyBase += rnd.nextInt(n) // later steps overlap earlier key ranges
        ()
      }
      (1 to t.currentVersion).foreach { v =>
        val snap = t.read(v).cache()
        val exactN = snap.count()
        // KLL: normalized rank error at k=200 is ~1.65% (99% conf);
        // audit with 3% + 1 like the contract query
        val qs = t.approxQuantiles("v", Seq(0.5, 0.95), v).get
        Seq(0.5 -> qs(0), 0.95 -> qs(1)).foreach { case (p, est) =>
          val le = snap.filter(col("v") <= est).count()
          val lt = snap.filter(col("v") < est).count()
          val eps = exactN * 0.03 + 1
          assert(le >= exactN * p - eps && lt <= exactN * p + eps,
            s"trial $trial v$v p$p: est $est ranks [$lt,$le] of $exactN")
        }
        snap.unpersist()
        ()
      }
      // theta: overlap of every version pair vs exact intersect;
      // lgK=12 → ~1.6% relative error per sketch, intersections
      // compound — allow 5% ∨ 3 like the contract query
      val versions = 1 to t.currentVersion
      for (a <- versions; b <- versions if a < b) {
        val est = t.approxKeyOverlap("id", v1 = a, v2 = b).get
        val exact = t.read(a).select("id").intersect(t.read(b).select("id")).count()
        assert(math.abs(est - exact) <= math.max(exact * 0.05, 3.0),
          s"trial $trial overlap($a,$b): est $est vs exact $exact")
      }
    }
  }
}
