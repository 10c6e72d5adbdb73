package graft

import graft.multimodal.Media

class MultimodalSpec extends SparkSpecBase {

  test("media table carries binary payload + typed metadata") {
    val m = Media.mediaTable(tables)
    assert(m.schema("payload").dataType.typeName == "binary")
    val meta = m.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSet == Set("media_type", "width", "height", "codec"))
    assert(m.count() == tables.documents.count())
  }

  test("feature extraction is deterministic and schema-stable") {
    val f1 = Media.qMediaFeatures(tables).collect()
    val f2 = Media.qMediaFeatures(tables).collect()
    assert(f1.sameElements(f2))
    assert(f1.forall { r =>
      val ent = r.getAs[Double]("byte_entropy")
      ent >= 0.0 && ent <= 8.0 && r.getAs[Int]("n_bytes") > 0
    })
  }

  test("fake decoder produces exactly width*height pixels") {
    val px = Media.FakeDecoder.decode("hello".getBytes, 8, 4)
    assert(px.length == 32)
    assert(Media.FakeDecoder.decode(Array.emptyByteArray, 3, 3).forall(_ == 0))
  }

  test("nearest-neighbor resize preserves corner pixels and target shape") {
    val px = Array.tabulate(16)(i => i.toByte) // 4x4 ramp
    val up = Media.FakeDecoder.resize(px, 4, 4, 8, 8)
    assert(up.length == 64)
    assert(up(0) == px(0) && up(63) == px(15)) // corners map to corners
    val down = Media.FakeDecoder.resize(px, 4, 4, 2, 2)
    assert(down.toSeq == Seq[Byte](0, 2, 8, 10)) // every other pixel
  }

  test("frame sampling stub is deterministic") {
    assert(Media.FakeDecoder.sampleFrames(10, 3) == Seq(0, 3, 6, 9))
    assert(Media.FakeDecoder.sampleFrames(5, 0) == Seq(0, 1, 2, 3, 4))
  }
}
