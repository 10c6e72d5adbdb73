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

  test("PCM s16le decode is exact on known byte patterns") {
    // samples: 0, +256, -32768, +32767
    val payload = Array[Byte](0, 0, 0, 1, 0, -128, -1, 127)
    val xs = Media.decodePcmS16le(payload)
    assert(xs.length == 4)
    assert(xs(0) == 0.0)
    assert(xs(1) == 256.0 / 32768.0)
    assert(xs(2) == -1.0)
    assert(math.abs(xs(3) - 32767.0 / 32768.0) < 1e-12)
  }

  test("audio features hand-check on a known alternating square wave") {
    import spark.implicits._
    // +16384, -16384 alternating → rms = peak = 0.5, zcr = 1.0
    val payload = Array.tabulate(200) { i =>
      if (i % 4 == 1) 64.toByte        // hi byte of +16384
      else if (i % 4 == 3) (-64).toByte // hi byte of -16384
      else 0.toByte
    }
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.lit(16000).as("sample_rate")))
    val r = Media.extractAudioFeatures(df).collect().head
    assert(r.getAs[Int]("n_samples") == 100)
    assert(math.abs(r.getAs[Double]("rms") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("peak") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("zero_cross_rate") - 1.0) < 1e-9)
    assert(r.getAs[Double]("duration_sec") == 100 / 16000.0)
  }

  test("audio query pipeline is deterministic with bounded features") {
    val a1 = Media.qAudioFeatures(tables).collect()
    val a2 = Media.qAudioFeatures(tables).collect()
    assert(a1.sameElements(a2))
    assert(a1.length == tables.documents.count())
    assert(a1.forall { r =>
      val rms = r.getAs[Double]("rms"); val zcr = r.getAs[Double]("zero_cross_rate")
      rms >= 0.0 && rms <= 1.0 && zcr >= 0.0 && zcr <= 1.0 &&
        r.getAs[Double]("peak") <= 1.0
    })
  }

  test("ImageCodec decodes PNG bit-exactly and reports codec dimensions") {
    val (w, h) = (21, 13)
    val px = graft.multimodal.ImageCodec.synthPixels(7L, w, h)
    val png = graft.multimodal.ImageCodec.encodePng(w, h, px)
    // PNG magic: a REAL container, not text bytes
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val d = graft.multimodal.ImageCodec.decode(png).get
    // dimensions come from the codec, not from carried metadata
    assert(d.width == w && d.height == h)
    // lossless: channel means match the source pixels exactly
    def mean(shift: Int) = px.map(p => (p >> shift) & 0xff).sum.toDouble / px.length
    assert(math.abs(d.meanR - mean(16)) < 1e-9)
    assert(math.abs(d.meanG - mean(8)) < 1e-9)
    assert(math.abs(d.meanB - mean(0)) < 1e-9)
    // corrupt payloads are None, not exceptions
    assert(graft.multimodal.ImageCodec.decode("not an image".getBytes).isEmpty)
  }

  test("multi-page TIFF frame sampling decodes only every stride-th frame") {
    val frames = (0 until 7).map(f =>
      graft.multimodal.ImageCodec.synthPixels(1000L + f, 16, 12))
    val clip = graft.multimodal.ImageCodec.encodeMultiTiff(16, 12, frames)
    assert(graft.multimodal.ImageCodec.frameCount(clip) == 7)
    val sampled = graft.multimodal.ImageCodec.sampleFrames(clip, 3)
    assert(sampled.size == 3) // frames 0, 3, 6
    // each sampled frame decodes to ITS page's pixels (frame identity)
    sampled.zip(Seq(0, 3, 6)).foreach { case (d, idx) =>
      val expect = frames(idx).map(p => (p >> 16) & 0xff).sum.toDouble / frames(idx).length
      assert(math.abs(d.meanR - expect) < 1e-9, s"frame $idx mismatch")
    }
  }

  test("animated GIF frame sampling: container round-trips, only stride-th frames decode") {
    import graft.multimodal.ImageCodec
    val frames = (0 until 7).map(f => ImageCodec.synthPixels(2000L + f, 16, 12))
    val clip = ImageCodec.encodeAnimatedGif(16, 12, frames)
    // real animated GIF: magic bytes + the reader's container index
    assert(clip.take(6).map(_.toChar).mkString.startsWith("GIF8"), "not a GIF")
    assert(ImageCodec.frameCount(clip) == 7)
    val sampled = ImageCodec.sampleFrames(clip, 3)
    assert(sampled.size == 3) // frames 0, 3, 6
    // frame IDENTITY through the palettized codec: each sampled frame
    // must be closest (in mean-luma) to ITS source frame, not a
    // neighbor — quantization shifts values but can't swap frames,
    // because synthPixels makes per-frame means far apart
    val srcLuma = frames.map(f =>
      f.map(p => (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
        (p & 0xff) * 114) / 1000).sum.toDouble / f.length)
    sampled.zip(Seq(0, 3, 6)).foreach { case (d, idx) =>
      val got = d.luma.map(_ & 0xff).sum.toDouble / d.luma.length
      val nearest = srcLuma.zipWithIndex.minBy { case (m, _) => math.abs(m - got) }._2
      assert(nearest == idx, s"sampled frame decoded nearest to $nearest, expected $idx")
    }
    // deterministic encode+decode: the replay oracle's ground
    assert(ImageCodec.encodeAnimatedGif(16, 12, frames)
      .sameElements(clip), "GIF encode must be deterministic")
    val fs = Media.qFrameSampleGif(tables).collect()
    assert(fs.nonEmpty)
    assert(fs.forall(r => r.getAs[Int]("n_frames") == 6 && r.getAs[Int]("n_sampled") == 3))
  }

  test("image query pipeline decodes real PNGs end to end") {
    val rows = Media.qImageFeatures(tables).collect()
    assert(rows.length == tables.documents.count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // the decoder's dimensions follow the corpus builder's formula
      assert(r.getAs[Int]("width") == (id % 24 + 8).toInt)
      assert(r.getAs[Int]("height") == (id % 18 + 6).toInt)
      val ent = r.getAs[Double]("luma_entropy")
      assert(ent >= 0.0 && ent <= 8.0)
    }
    val fs = Media.qFrameSample(tables).collect()
    assert(fs.nonEmpty)
    assert(fs.forall(r => r.getAs[Int]("n_frames") == 6 && r.getAs[Int]("n_sampled") == 3))
  }
}
