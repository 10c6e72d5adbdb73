package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.functions.{BloomAgg, GraftFunctions, HashImpl}
import graft.operators.Decontam

/** Bloom filter sketch: the distributed build (BloomAgg) and the
  * codegen'd probe (bloom_contains) — and the contract that makes the
  * pair useful as a pre-filter: NO false negatives ever, false
  * positives bounded near the configured rate.
  */
class BloomSpec extends SparkSpecBase {

  test("no false negatives across a partitioned, merged build") {
    import spark.implicits._
    val items = (1L to 5000L).map(i => HashImpl.mix64(i))
    // 8 partitions → per-partition partials merge by OR; any lost bit
    // would surface as a false negative here
    val bloom = items.toDF("h").repartition(8).as[Long](Encoders.scalaLong)
      .select(new BloomAgg(5000, 0.01).toColumn).head()
    val probed = items.toDF("h")
      .filter(GraftFunctions.bloomContains(lit(bloom), col("h")))
      .count()
    assert(probed == items.size, s"lost ${items.size - probed} inserted items")
  }

  test("false-positive rate stays near the configured target") {
    import spark.implicits._
    val inserted = (1L to 5000L).map(i => HashImpl.mix64(i))
    val bloom = inserted.toDF("h").as[Long](Encoders.scalaLong)
      .select(new BloomAgg(5000, 0.01).toColumn).head()
    // disjoint probe population (different seed space)
    val probes = (1L to 20000L).map(i => HashImpl.mix64(-i))
    val fp = probes.toDF("h")
      .filter(GraftFunctions.bloomContains(lit(bloom), col("h")))
      .count()
    val rate = fp.toDouble / probes.size
    // generous 3x headroom over the 1% design point — the assertion
    // guards sizing-math regressions, not statistical noise
    assert(rate < 0.03, s"fp rate $rate vs configured 0.01")
  }

  test("sketch stays small: 1% fpp is ~1.2 bytes per item") {
    import spark.implicits._
    val bloom = (1L to 1000L).toDF("h").as[Long](Encoders.scalaLong)
      .select(new BloomAgg(1000, 0.01).toColumn).head()
    assert(bloom.length < 1000 * 2 + 16, s"sketch ${bloom.length}B for 1000 items")
  }

  test("bloom-prefiltered decontamination equals the exact plan") {
    val exact = Decontam.qDecontaminate(tables).collect().toSeq
    val bloomed = Decontam.qDecontaminateBloom(tables).collect().toSeq
    assert(bloomed == exact,
      s"bloom variant diverged: ${bloomed.take(3)} vs ${exact.take(3)}")
  }
}
