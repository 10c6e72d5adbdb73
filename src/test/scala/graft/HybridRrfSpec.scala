package graft

import org.apache.spark.sql.functions.col

import graft.operators.Similarity
import graft.sources.Tables

/** Reciprocal Rank Fusion semantics on a controlled corpus: the fused
  * score must reward documents BOTH arms rank, admit documents either
  * single arm finds, and compute exactly 1/(K+rank) per arm.
  */
class HybridRrfSpec extends SparkSpecBase {

  private lazy val corpus: Tables = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hybrid").toString
    Seq(
      // the query seed (6 tokens ≥ the 5-gram floor)
      (1L, "alpha beta gamma delta epsilon zeta"),
      // exact copy: rank 1 in BOTH arms
      (10L, "alpha beta gamma delta epsilon zeta"),
      // shares the leading 5-gram: both arms again, behind the copy
      (20L, "alpha beta gamma delta epsilon omega"),
      // disjoint vocabulary: NO shared shingle (lexical arm blind),
      // hash-embedding cosine still defined → dense-only candidate
      (30L, "one two three four five six"),
      (31L, "seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  test("a doc both arms rank first fuses to exactly 1/(K+1) + 1/(K+1)") {
    val out = Similarity.qHybridRrf(corpus, queryIds = Seq(1L), k = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.head._1 == 10L, s"the exact copy must fuse to rank 1: ${out.toSeq}")
    val expected = math.floor((1.0 / 61 + 1.0 / 61) * 1e6 + 0.5) / 1e6
    assert(out.head._2 == expected,
      s"rrf of a double rank-1 must be 2/(K+1) rounded: ${out.head._2} vs $expected")
    assert(out.head._3 == 1)
  }

  test("single-arm documents still surface, below double-arm ones") {
    val out = Similarity.qHybridRrf(corpus, queryIds = Seq(1L), k = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    // 20 shares a shingle AND embeds close: two arms → beats the
    // dense-only strangers
    assert(out.contains(20L))
    assert(out.contains(30L) && out.contains(31L),
      s"dense-only docs must still fuse in: $out")
    assert(out(20L) > out(30L) && out(20L) > out(31L),
      s"a two-arm doc must outrank dense-only ones: $out")
    // a dense-only doc's score is exactly one arm's term: 1/(60+rank)
    // for SOME integer rank ≥ 1
    Seq(30L, 31L).foreach { d =>
      val inv = 1.0 / out(d)
      val rank = math.round(inv - 60).toInt
      val expected = math.floor(1.0 / (60 + rank) * 1e6 + 0.5) / 1e6
      assert(rank >= 1 && out(d) == expected,
        s"doc $d score ${out(d)} is not a pure single-arm RRF term")
    }
  }

  test("fusion against the real corpus returns k dense ranks per query") {
    val out = Similarity.qHybridRrf(tables).collect()
    assert(out.length == 30)
    Seq(1L, 2L, 3L).foreach { q =>
      val ranks = out.filter(_.getLong(0) == q).map(_.getInt(3)).toSeq
      assert(ranks.sorted == (1 to 10), s"query $q ranks: $ranks")
    }
  }
}
