package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.sources.Tables

/** Sub-document (chunk/"line") dedup semantics on a corpus built to
  * exercise keep-first: shared spans keep exactly their first
  * occurrence (lowest doc_id, then position), unique spans survive
  * untouched, fully-duplicated documents vanish.
  */
class LineDedupSpec extends SparkSpecBase {

  private lazy val tinyTables: Tables = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-linededup").toString
    Seq(
      // doc 1: all unique — must come back verbatim
      (1L, "a b c d e f", "en", "web", 11),
      // doc 2: first chunk "a b c" duplicates doc 1's — must be cut
      (2L, "a b c x y z", "en", "web", 11),
      // doc 3: both chunks already seen — document disappears entirely
      (3L, "a b c x y z", "en", "web", 11),
      // doc 4: duplicate chunk in the MIDDLE; surrounding chunks keep
      // their document order after reassembly
      (4L, "p q r a b c s t u", "en", "web", 17)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  test("keep-first: shared chunks survive only in their first document") {
    val rows = Dedup.qLineDedup(tinyTables).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(rows(1L) == (("a b c d e f", 2, 2)), s"doc 1 changed: ${rows(1L)}")
    assert(rows(2L) == (("x y z", 2, 1)), s"doc 2 kept a duplicate: ${rows(2L)}")
    assert(!rows.contains(3L), "fully-duplicated doc 3 must vanish")
    assert(rows(4L) == (("p q r s t u", 3, 2)),
      s"doc 4 order/cut wrong: ${rows(4L)}")
  }

  test("a corpus with no cross-document repetition is the identity") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-linededup2").toString
    Seq((10L, "m n o p q r", "en", "web", 11),
        (11L, "s t u v w x", "en", "web", 11),
        // zero-token doc: must vanish, not fabricate chunks (Spark's
        // sequence(0,-1) is descending, not empty — guarded in the op)
        (12L, "", "en", "web", 0))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Dedup.qLineDedup(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(10L -> "m n o p q r", 11L -> "s t u v w x"))
  }
}
