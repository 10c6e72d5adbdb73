package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Rnd.round // shadows functions.round: oracle-portable floor form
import graft.sources.Tables
import graft.util.OracleExports

/** Multimodal column plumbing (SURVEY.md §2.6).
  *
  * Media (image/audio/video) is carried as an opaque `binary` column
  * plus a typed metadata struct — the layout a 100 TB multimodal
  * corpus uses (parquet binary pages, metadata predicate pushdown for
  * partition/row-group pruning, bytes only deserialized inside the
  * decode stage).
  *
  * Decode is REAL for every format the JDK ships a codec for:
  * PNG/JPEG/BMP/GIF/TIFF stills via `ImageCodec` (javax.imageio,
  * headless, zero external deps), multi-page TIFF for the multi-frame
  * sampling path, and PCM s16le audio below. `FakeDecoder` remains as
  * the deterministic harness for plumbing tests and as the stand-in
  * shape for codecs the JDK does NOT carry (h264-style video —
  * genuinely environment-blocked). The Spark-side plumbing — schema,
  * batched `mapPartitions`, feature extraction, partition sizing — is
  * shared by both and tested (MultimodalSpec).
  */
object Media {

  /** Typed metadata carried alongside the payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("codec", StringType, nullable = false)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", metaSchema, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("byte_mean", DoubleType, nullable = false),
    StructField("byte_entropy", DoubleType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Deterministic fake decode: a real implementation would call the
    * codec here (e.g. JPEG → pixels); the fake derives "pixels" from
    * payload bytes so tests are reproducible byte-for-byte.
    */
  object FakeDecoder {
    /** "Decode" payload to a (width, height, grayscale bytes) frame. */
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(width * height, 1))
      var i = 0
      while (i < out.length) {
        out(i) = if (payload.isEmpty) 0 else payload(i % payload.length)
        i += 1
      }
      out
    }

    /** Deterministic stand-in for frame sampling: every `stride`-th
      * frame index of a fake `nFrames`-frame clip.
      */
    def sampleFrames(nFrames: Int, stride: Int): Seq[Int] =
      0 until nFrames by math.max(stride, 1)

    /** Nearest-neighbor resize of a grayscale frame — real (no codec
      * needed), the downstream shape a thumbnail/feature stage uses.
      */
    def resize(px: Array[Byte], w: Int, h: Int, w2: Int, h2: Int): Array[Byte] = {
      require(w > 0 && h > 0 && w2 > 0 && h2 > 0 && px.length >= w * h)
      val out = new Array[Byte](w2 * h2)
      var y = 0
      while (y < h2) {
        val sy = y * h / h2
        var x = 0
        while (x < w2) {
          out(y * w2 + x) = px(sy * w + x * w / w2)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Build a media table from `documents` — the text bytes stand in
    * for an encoded payload; metadata is derived deterministically.
    * (In production this is `spark.read.parquet` over a binary-column
    * corpus; the driver's testdata has no binary table.)
    */
  def mediaTable(t: Tables): DataFrame =
    t.documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image").as("media_type"),
        (pmod(col("doc_id"), lit(64)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 24).cast("int").as("height"),
        lit("fake").as("codec")).as("meta"))

  /** Batched decode + feature extraction over `mapPartitions`: one
    * decoder instance per partition (the real-world pattern — codec
    * contexts are expensive), rows streamed through it. Output is a
    * flat feature frame; downstream is ordinary DataFrame land.
    */
  /** (mean, Shannon entropy in bits) of a byte plane via one 256-bin
    * histogram pass — the kernel both the fake and the real decode
    * feature paths share.
    */
  private[multimodal] def histStats(bytes: Array[Byte]): (Double, Double) = {
    val counts = new Array[Long](256)
    var s = 0L
    var i = 0
    while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; s += (bytes(i) & 0xff); i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    var ent = 0.0
    var b = 0
    while (b < 256) {
      if (counts(b) > 0) { val p = counts(b) / n; ent -= p * math.log(p) }
      b += 1
    }
    (s / n, ent / math.log(2.0))
  }

  def extractFeatures(media: DataFrame): DataFrame = {
    val outEncoder = RowEncoder.encoderFor(featureSchema)
    media.select("doc_id", "payload", "meta.width", "meta.height")
      .mapPartitions { rows =>
        // per-partition decoder setup would go here
        rows.map { r =>
          val docId = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val w = r.getInt(2); val h = r.getInt(3)
          val (mean, ent) = histStats(FakeDecoder.decode(payload, w, h))
          Row(docId, payload.length, mean, ent, w, h)
        }
      }(outEncoder)
  }

  /** Feature pipeline as a query: media build → batched decode →
    * rounded features. DuckDB-oracled as a DECODED-PLANE REPLAY: the
    * decode stage (the only non-SQL step) exports its output plane —
    * per-pixel bytes plus the carried header — and the oracle
    * recomputes mean and Shannon entropy from those values in plain
    * SQL, so all feature arithmetic downstream of the decoder is
    * hash-gated (MultimodalSpec still pins the decode itself).
    */
  def qMediaFeatures(t: Tables): DataFrame = {
    val media = mediaTable(t)
    if (OracleExports.enabled) {
      val pxSchema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("n_bytes", IntegerType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("idx", IntegerType, nullable = false),
        StructField("b", IntegerType, nullable = false)))
      val enc = RowEncoder.encoderFor(pxSchema)
      OracleExports.export(
        media.select("doc_id", "payload", "meta.width", "meta.height")
          .mapPartitions { rows =>
            rows.flatMap { r =>
              val id = r.getLong(0)
              val payload = r.getAs[Array[Byte]](1)
              val w = r.getInt(2); val h = r.getInt(3)
              val px = FakeDecoder.decode(payload, w, h)
              px.iterator.zipWithIndex.map { case (bv, i) =>
                Row(id, payload.length, w, h, i, bv & 0xff)
              }
            }
          }(enc), "media_px")
    }
    extractFeatures(media)
      .select(col("doc_id"), col("n_bytes"),
        round(col("byte_mean"), 2).as("byte_mean"),
        round(col("byte_entropy"), 2).as("byte_entropy"),
        col("width"), col("height"))
      .orderBy("doc_id")
  }

  // ---- images (REAL decode via JDK ImageIO — PNG/JPEG/BMP/GIF/TIFF) ----

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("luma_mean", DoubleType, nullable = false),
    StructField("luma_entropy", DoubleType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** Synthetic image corpus with REAL PNG payloads: per-doc
    * deterministic pixel pattern → encoded inside the partition (the
    * corpus-builder shape — encode cost is distributed, the driver
    * never sees pixels). Dimensions vary per doc so the decoder's
    * reported size is meaningful.
    */
  def imageTable(t: Tables): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("codec", StringType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    t.documents.select(col("doc_id")).repartition(8)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          // floorMod: a negative doc_id must still give positive dims
          val w = math.floorMod(id, 24).toInt + 8
          val h = math.floorMod(id, 18).toInt + 6
          Row(id, ImageCodec.encodePng(w, h, ImageCodec.synthPixels(id, w, h)), "png")
        }
      }(enc)
  }

  /** Batched REAL decode + features: JDK ImageIO inside
    * `mapPartitions`, dimensions from the CODEC (not carried
    * metadata), luminance histogram entropy + per-channel means.
    * Undecodable payloads are dropped (corrupt-input policy: a
    * curation pipeline quarantines, it doesn't crash).
    */
  def extractImageFeatures(images: DataFrame): DataFrame = {
    val outEncoder = RowEncoder.encoderFor(imageFeatureSchema)
    images.select("doc_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val docId = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          ImageCodec.decode(payload).map { d =>
            val (lumaMean, ent) = histStats(d.luma)
            Row(docId, payload.length, d.width, d.height,
              lumaMean, ent, d.meanR, d.meanG, d.meanB)
          }
        }
      }(outEncoder)
  }

  /** Real-decode image pipeline as a contract query. DuckDB-oracled
    * as a DECODED-PLANE REPLAY: the codec exports the raw packed-RGB
    * plane per pixel, and the oracle re-derives the integer Rec.601
    * luma transform, the histogram entropy, and all four means from
    * those values in SQL — every arithmetic step downstream of
    * ImageIO is hash-gated (MultimodalSpec proves the decode itself
    * is the codec's, not the fake's).
    */
  def qImageFeatures(t: Tables): DataFrame = {
    val images = imageTable(t)
    if (OracleExports.enabled) {
      val pxSchema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("n_bytes", IntegerType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("idx", IntegerType, nullable = false),
        StructField("r", IntegerType, nullable = false),
        StructField("g", IntegerType, nullable = false),
        StructField("b", IntegerType, nullable = false)))
      val enc = RowEncoder.encoderFor(pxSchema)
      OracleExports.export(
        images.select("doc_id", "payload").mapPartitions { rows =>
          rows.flatMap { r =>
            val id = r.getLong(0)
            val payload = r.getAs[Array[Byte]](1)
            // same quarantine contract as the feature path: an
            // undecodable payload exports nothing and emits nothing
            ImageCodec.decodeRgb(payload).iterator.flatMap { case (w, h, rgb) =>
              rgb.iterator.zipWithIndex.map { case (p, i) =>
                Row(id, payload.length, w, h, i,
                  (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
              }
            }
          }
        }(enc), "img_px")
    }
    extractImageFeatures(images)
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        round(col("luma_mean"), 2).as("luma_mean"),
        round(col("luma_entropy"), 2).as("luma_entropy"),
        round(col("mean_r"), 2).as("mean_r"),
        round(col("mean_g"), 2).as("mean_g"),
        round(col("mean_b"), 2).as("mean_b"))
      .orderBy("doc_id")
  }

  val frameSampleSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_sampled", IntegerType, nullable = false),
    StructField("sampled_luma_mean", DoubleType, nullable = false)))

  /** Frame sampling over a REAL multi-frame container: per doc a
    * multi-page TIFF clip is built (distributed), then every
    * `stride`-th frame is decoded — unsampled frames are never
    * pixel-decoded, the property that matters when a clip is 10k
    * frames and the pipeline wants 1 in 100. Restricted to a 1-in-8
    * doc sample: clips are ~6× the encode cost of stills.
    */
  def qFrameSample(t: Tables, frames: Int = 6, stride: Int = 2): DataFrame =
    frameSampleQuery(t, frames, stride, residue = 0,
      ImageCodec.encodeMultiTiff, "frame_px")

  /** The ANIMATED-GIF twin of [[qFrameSample]] (`q_frame_sample_gif`):
    * identical sampling contract over the JDK's other multi-frame
    * container. The GIF codec PALETTIZES frames at encode (TIFF is
    * lossless), so the two queries' luma numbers differ — each oracle
    * replays its own decoded planes. A disjoint 1-in-8 doc slice
    * (residue 4) keeps the two fixtures from double-covering docs.
    */
  def qFrameSampleGif(t: Tables, frames: Int = 6, stride: Int = 2): DataFrame =
    frameSampleQuery(t, frames, stride, residue = 4,
      ImageCodec.encodeAnimatedGif, "frame_px_gif")

  private def frameSampleQuery(t: Tables, frames: Int, stride: Int,
      residue: Int, encode: (Int, Int, Seq[Array[Int]]) => Array[Byte],
      exportSub: String): DataFrame = {
    val outEncoder = RowEncoder.encoderFor(frameSampleSchema)
    if (OracleExports.enabled) {
      // decoded-plane replay export: the sampled frames' luma planes
      // plus the container's frame count, per doc. The oracle
      // recomputes n_sampled (distinct sampled indices), checks the
      // stride rule against n_frames, and re-derives the mean of
      // per-frame means in SQL.
      val pxSchema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("n_frames", IntegerType, nullable = false),
        StructField("frame_idx", IntegerType, nullable = false),
        StructField("idx", IntegerType, nullable = false),
        StructField("luma", IntegerType, nullable = false)))
      val enc = RowEncoder.encoderFor(pxSchema)
      OracleExports.export(
        t.documents.select(col("doc_id"))
          .filter(pmod(col("doc_id"), lit(8)) === residue).repartition(8)
          .mapPartitions { rows =>
            rows.flatMap { r =>
              val id = r.getLong(0)
              val w = 16; val h = 12
              val clip = encode(w, h,
                (0 until frames).map(f => ImageCodec.synthPixels(id * 131 + f, w, h)))
              val (nFrames, sampled) = ImageCodec.sampleFramesWithCount(clip, stride)
              val strideN = math.max(stride, 1)
              sampled.iterator.zipWithIndex.flatMap { case (d, k) =>
                d.luma.iterator.zipWithIndex.map { case (l, i) =>
                  Row(id, nFrames, k * strideN, i, l & 0xff)
                }
              }
            }
          }(enc), exportSub)
    }
    t.documents.select(col("doc_id")).filter(pmod(col("doc_id"), lit(8)) === residue)
      .repartition(8)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = 16; val h = 12
          val clip = encode(w, h,
            (0 until frames).map(f => ImageCodec.synthPixels(id * 131 + f, w, h)))
          // one container parse for count AND samples
          val (nFrames, sampled) = ImageCodec.sampleFramesWithCount(clip, stride)
          // mean luma over ALL sampled pixels (frames are equal-sized,
          // so this equals the mean of per-frame means) — the integer
          // sum is exact, so the DuckDB replay's avg() reproduces it
          // bit-identically; a mean-of-means float chain did not
          val lumaMean =
            if (sampled.isEmpty) 0.0
            else {
              var s = 0L; var n = 0L
              sampled.foreach { d =>
                d.luma.foreach(b => s += (b & 0xff)); n += d.luma.length
              }
              s.toDouble / n
            }
          Row(id, nFrames, sampled.size, lumaMean)
        }
      }(outEncoder)
      .select(col("doc_id"), col("n_frames"), col("n_sampled"),
        round(col("sampled_luma_mean"), 2).as("sampled_luma_mean"))
      .orderBy("doc_id")
  }

  // ---- audio (PCM s16le — REAL decode, no codec library needed) ----

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("duration_sec", DoubleType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("peak", DoubleType, nullable = false),
    StructField("zero_cross_rate", DoubleType, nullable = false),
    StructField("energy_var", DoubleType, nullable = false)))

  /** Interpret a payload as 16-bit little-endian PCM samples in
    * [-1, 1). Unlike image codecs this is a complete, real decoder —
    * PCM is just byte layout.
    */
  def decodePcmS16le(payload: Array[Byte]): Array[Double] = {
    val n = payload.length / 2
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val lo = payload(2 * i) & 0xff
      val hi = payload(2 * i + 1).toInt
      out(i) = ((hi << 8) | lo) / 32768.0
      i += 1
    }
    out
  }

  /** Audio corpus stand-in: document bytes as a PCM payload plus the
    * metadata an audio table carries (sample rate, channels).
    */
  def audioTable(t: Tables, sampleRate: Int = 16000): DataFrame =
    t.documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("audio").as("media_type"),
        lit(sampleRate).as("sample_rate"),
        lit(1).as("channels"),
        lit("pcm_s16le").as("codec")).as("meta"))

  /** Batched PCM decode + classic audio features — duration, RMS
    * energy, peak amplitude, zero-crossing rate, and the variance of
    * per-window energies (the 256-sample windowing every
    * MFCC/VAD-style pipeline starts from). Same `mapPartitions` batch
    * shape as the image path: bytes deserialize only inside the
    * decode stage, output is a flat feature frame.
    */
  def extractAudioFeatures(audio: DataFrame, window: Int = 256): DataFrame = {
    val outEncoder = RowEncoder.encoderFor(audioFeatureSchema)
    audio.select(col("doc_id"), col("payload"), col("meta.sample_rate"))
      .mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getLong(0)
          val xs = decodePcmS16le(r.getAs[Array[Byte]](1))
          val rate = r.getInt(2).toDouble
          val n = xs.length
          var sumSq = 0.0; var peak = 0.0; var crossings = 0L
          var i = 0
          while (i < n) {
            val x = xs(i)
            sumSq += x * x
            if (math.abs(x) > peak) peak = math.abs(x)
            if (i > 0 && (x >= 0) != (xs(i - 1) >= 0)) crossings += 1
            i += 1
          }
          // per-window energies → variance (activity profile); ceil so
          // the tail partial window counts (normalized by its length)
          val nw = math.max((n + window - 1) / window, 1)
          val en = new Array[Double](nw)
          var w = 0
          while (w < nw) {
            var e = 0.0
            var j = w * window
            val end = math.min(j + window, n)
            while (j < end) { e += xs(j) * xs(j); j += 1 }
            en(w) = e / math.max(end - w * window, 1)
            w += 1
          }
          val mean = en.sum / nw
          val variance = en.map(e => (e - mean) * (e - mean)).sum / nw
          Row(docId, n, n / rate,
            if (n == 0) 0.0 else math.sqrt(sumSq / n), peak,
            if (n <= 1) 0.0 else crossings.toDouble / (n - 1), variance)
        }
      }(outEncoder)
  }

  /** Audio feature pipeline as a query. DuckDB-oracled as a
    * DECODED-PLANE REPLAY: the PCM decode (the only non-SQL step)
    * exports its sample stream, and the oracle recomputes RMS, peak,
    * zero-crossing rate, and the windowed-energy variance from those
    * values in plain SQL — all feature arithmetic downstream of the
    * decoder is hash-gated (MultimodalSpec still hand-checks the
    * decode on known PCM buffers).
    */
  def qAudioFeatures(t: Tables): DataFrame = {
    val audio = audioTable(t)
    if (OracleExports.enabled) {
      val sSchema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("idx", IntegerType, nullable = false),
        StructField("x", DoubleType, nullable = false)))
      val enc = RowEncoder.encoderFor(sSchema)
      OracleExports.export(
        audio.select("doc_id", "payload").mapPartitions { rows =>
          rows.flatMap { r =>
            val id = r.getLong(0)
            decodePcmS16le(r.getAs[Array[Byte]](1)).iterator.zipWithIndex
              .map { case (x, i) => Row(id, i, x) }
          }
        }(enc), "audio_samples")
    }
    extractAudioFeatures(audio)
      .select(col("doc_id"), col("n_samples"),
        round(col("duration_sec"), 4).as("duration_sec"),
        round(col("rms"), 4).as("rms"),
        round(col("peak"), 4).as("peak"),
        round(col("zero_cross_rate"), 4).as("zero_cross_rate"),
        round(col("energy_var"), 6).as("energy_var"))
      .orderBy("doc_id")
  }
}
