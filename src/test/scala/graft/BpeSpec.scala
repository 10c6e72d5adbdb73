package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.operators.TextAnalysis

class BpeSpec extends SparkSpecBase {

  test("driver trainer learns the textbook merges on a toy dictionary") {
    // 'abab'×10 + 'ab'×5: (a,b) dominates (25), then (ab,ab) in the
    // merged word (10)
    val m = Bpe.train(Seq("abab" -> 10L, "ab" -> 5L), numMerges = 4)
    assert(m.merges.head == ("a", "b"), m.merges)
    assert(m.merges.contains(("ab", "ab")), m.merges)
    assert(m.countTokens("abab ab") == 2) // each word fully merged
    assert(m.countTokens("") == 0)
    // unseen symbols never merge: 'xyz' stays 3 single chars
    assert(m.countTokens("xyz") == 3)
  }

  test("training is deterministic: same corpus, same vocabulary") {
    val a = Bpe.trainOn(tables.documents, numMerges = 64, dictSize = 512)
    val b = Bpe.trainOn(tables.documents, numMerges = 64, dictSize = 512)
    assert(a.merges == b.merges)
    assert(a.merges.nonEmpty)
  }

  test("corpus counts: every word >= 1 token, dictionary words compress") {
    val rows = TextAnalysis.qBpeTokens(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bpe, ws) = (r.getAs[Int]("n_bpe"), r.getAs[Int]("n_ws"))
      assert(bpe >= ws, s"doc ${r.get(0)}: $bpe bpe < $ws words")
    }
    // the trained vocab compresses the corpus far below character
    // level: dictionary words collapse toward one token each
    val totBpe = rows.map(_.getAs[Int]("n_bpe").toLong).sum
    val totWs = rows.map(_.getAs[Int]("n_ws").toLong).sum
    assert(totBpe < totWs * 2, s"bpe $totBpe vs ws $totWs — no compression learned")
  }

  test("encodeIds emits the deterministic vocabulary, unk for unseen chars") {
    val m = Bpe.train(Seq("abab" -> 10L, "ab" -> 5L), numMerges = 4)
    // vocabulary: alphabet sorted (a=0, b=1), then merges in rank
    // order on first appearance ('ab'=2, 'abab'=3); unk reserves 4
    assert(m.vocab == Map("a" -> 0, "b" -> 1, "ab" -> 2, "abab" -> 3))
    assert(m.unkId == 4)
    assert(m.encodeIds("abab ab").toSeq == Seq(3, 2))
    assert(m.encodeIds("ba").toSeq == Seq(1, 0)) // no (b,a) merge learned
    assert(m.encodeIds("xa").toSeq == Seq(4, 0)) // unseen char → unk
    assert(m.encodeIds("").isEmpty)
    // counts and ids agree by construction
    assert(m.countTokens("abab ab ba xa") == m.encodeIds("abab ab ba xa").length)
  }

  test("bpe_encode SQL function: size(ids) == bpe_count, in-vocab ids") {
    val m = Bpe.trainOn(tables.documents, numMerges = 64, dictSize = 512)
    Bpe.register("spec-encode", m)
    try {
      tables.documents.limit(20).createOrReplaceTempView("__graft_bpe_enc")
      val rows = spark.sql(
        """SELECT bpe_encode(text, 'spec-encode') AS ids,
          |       bpe_count(text, 'spec-encode') AS n
          |FROM __graft_bpe_enc""".stripMargin).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val ids = r.getSeq[Int](r.fieldIndex("ids"))
        assert(ids.length == r.getAs[Int]("n"))
        assert(ids.forall(id => id >= 0 && id <= m.unkId))
      }
    } finally Bpe.unregister("spec-encode")
  }

  test("base symbols are codepoints: a supplementary-plane char is ONE symbol") {
    // "🎉" is U+1F389 — two UTF-16 code units, one codepoint. A model
    // trained without it must count it as exactly one (unk) symbol,
    // never an unpaired surrogate pair — and the alphabet of a model
    // trained ON it holds the full character, matching what the
    // DuckDB oracle's character-indexed replay splits to.
    val party = new String(Character.toChars(0x1F389))
    val m = Bpe.train(Seq("ab" -> 10L), numMerges = 4)
    Bpe.register("spec-cp", m)
    try {
      import spark.implicits._
      val n = Seq(s"x${party}y").toDF("text")
        .select(Bpe.tokenCount("spec-cp", org.apache.spark.sql.functions.col("text")))
        .head().getInt(0)
      assert(n == 3, s"x + emoji + y must be 3 symbols, got $n")
    } finally Bpe.unregister("spec-cp")
    val m2 = Bpe.train(Seq(s"$party$party" -> 10L), numMerges = 4)
    assert(m2.alphabet == IndexedSeq(party),
      s"alphabet must hold the whole codepoint: ${m2.alphabet}")
    assert(m2.merges.headOption.contains((party, party)))
  }

  test("the SQL surface resolves a registered model at analysis time") {
    val m = Bpe.train(Seq("spark" -> 100L), numMerges = 8)
    Bpe.register("spec-model", m)
    tables.documents.limit(5).createOrReplaceTempView("__graft_bpe_docs")
    val n = spark.sql(
      "SELECT bpe_count(text, 'spec-model') AS n FROM __graft_bpe_docs")
      .collect().map(_.getInt(0))
    assert(n.length == 5 && n.forall(_ > 0))
    val err = intercept[Exception] {
      spark.sql("SELECT bpe_count('x', 'nope') AS n").collect()
    }
    assert(err.getMessage.contains("nope"), err.getMessage)
  }

  test("decode inverts encode on the training corpus; unk decodes visibly") {
    // the oracle hash-compares per-doc flags, which would also match
    // if BOTH engines computed false — this pins the flags themselves
    val rows = graft.operators.TextAnalysis.qBpeRoundtrip(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("roundtrip_ok"),
        s"doc ${r.getLong(0)} failed the encode→decode round-trip")
      assert(r.getAs[Int]("n_tokens") > 0)
    }
    // unseen characters encode to unk and decode to U+FFFD — visible,
    // never silently dropped
    val (id, m) = graft.operators.TextAnalysis.corpusModel(tables)
    val ids = m.encodeIds("中文")
    assert(ids.forall(_ == m.unkId))
    assert(m.decodeIds(ids) == "��")
    // SQL path agrees with the kernel
    import spark.implicits._
    val viaSql = Seq("key agg row").toDF("text")
      .select(graft.functions.Bpe.decode(id,
        graft.functions.Bpe.encode(id, org.apache.spark.sql.functions.col("text"))))
      .head().getString(0)
    assert(viaSql == "keyaggrow")
  }
}
