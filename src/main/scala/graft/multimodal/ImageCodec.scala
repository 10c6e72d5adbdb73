package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}
import java.awt.image.BufferedImage

/** REAL image codec over the JDK's built-in `javax.imageio` (the
  * java.desktop module ships PNG/JPEG/BMP/GIF/TIFF readers — no
  * external library, works headless). This retires the round-3
  * "image decode is environment-blocked" stub for every format the
  * JDK carries; only proprietary video codecs (h264 etc.) remain
  * genuinely out of scope.
  *
  * Frame sampling runs over multi-page TIFF — a real multi-frame
  * container the JDK writes and reads natively — so the video-style
  * every-Nth-frame path exercises an actual container index, not a
  * fake.
  *
  * All methods are static and allocation-local: safe to call from
  * `mapPartitions` workers with no shared codec context.
  */
object ImageCodec {

  /** Decoded frame: real dimensions from the codec (not metadata),
    * luminance plane, and per-channel means.
    */
  final case class Decoded(width: Int, height: Int, luma: Array[Byte],
      meanR: Double, meanG: Double, meanB: Double)

  /** Deterministic RGB test pattern for synthetic corpora: pixel
    * (x, y) of doc `id` mixes the coordinates through a splitmix-style
    * hash, so every (id, x, y) has a stable, independent color.
    */
  def synthPixels(id: Long, w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var z = id * 0x9E3779B97F4A7C15L + (y.toLong << 32 | x.toLong)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        out(y * w + x) = ((z ^ (z >>> 31)) & 0xFFFFFF).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  private def toImage(w: Int, h: Int, rgb: Array[Int]): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, rgb, 0, w)
    img
  }

  /** Encode an RGB pixel array as PNG bytes (lossless — decode gives
    * back the exact pixels, which the spec asserts).
    */
  def encodePng(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(toImage(w, h, rgb), "png", bos)
    bos.toByteArray
  }

  /** Encode frames as one multi-page TIFF — the JDK's native
    * multi-frame container (`ImageWriter.writeToSequence`).
    */
  def encodeMultiTiff(w: Int, h: Int, frames: Seq[Array[Int]]): Array[Byte] =
    encodeSequence("tiff", w, h, frames)

  /** The shared sequence-writer lifecycle (prepare → per-frame
    * writeToSequence → end → flush → dispose) behind both multi-frame
    * encoders — one home so a lifecycle fix can't silently apply to
    * one container and not the other.
    */
  private def encodeSequence(format: String, w: Int, h: Int,
      frames: Seq[Array[Int]]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName(format).next()
    val bos = new ByteArrayOutputStream()
    val out = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(toImage(w, h, f), null, null), null))
      writer.endWriteSequence()
      out.flush()
      bos.toByteArray
    } finally {
      writer.dispose()
      out.close()
    }
  }

  /** Encode frames as one ANIMATED GIF — the JDK's other native
    * multi-frame container, via the same `writeToSequence` shape as
    * TIFF. The GIF writer palettizes each frame (256-color quantize,
    * deterministic for a given input), so encode→decode is NOT
    * pixel-lossless like TIFF — which the decoded-plane-replay oracle
    * absorbs by construction: every downstream number re-derives from
    * the DECODED planes, whatever the codec did to them. One more real
    * decode family at zero new dependencies, narrowing the declared
    * video gap (full-frame writes, so the reader's per-index `read(i)`
    * returns whole frames — no disposal compositing needed).
    */
  def encodeAnimatedGif(w: Int, h: Int, frames: Seq[Array[Int]]): Array[Byte] =
    encodeSequence("gif", w, h, frames)

  private def analyze(img: BufferedImage): Decoded = {
    val w = img.getWidth
    val h = img.getHeight
    // one bulk getRGB: per-pixel getRGB(x, y) pays a ColorModel
    // conversion per call — ~10× slower in the decode hot path
    val rgb = img.getRGB(0, 0, w, h, null, 0, w)
    val luma = new Array[Byte](w * h)
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var i = 0
    while (i < rgb.length) {
      val p = rgb(i)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      sr += r; sg += g; sb += b
      // integer Rec.601 luma
      luma(i) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
      i += 1
    }
    val n = (w * h).toDouble
    Decoded(w, h, luma, sr / n, sg / n, sb / n)
  }

  /** Decode any JDK-supported payload (PNG/JPEG/BMP/GIF/TIFF first
    * frame). None for bytes no installed reader accepts OR that a
    * reader chokes on mid-parse — JDK plugins throw RuntimeExceptions
    * (IllegalArgument, NegativeArraySize, ...) on corrupted headers,
    * not just IIOException, and the quarantine contract covers both.
    */
  /** Decode to the raw packed-RGB plane (w, h, ints) — the oracle
    * export surface: the DuckDB replay re-derives luma, entropy, and
    * channel means from these per-pixel values in SQL, so every
    * arithmetic step downstream of the codec is hash-gated.
    */
  def decodeRgb(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map(i =>
      (i.getWidth, i.getHeight, i.getRGB(0, 0, i.getWidth, i.getHeight, null, 0, i.getWidth)))
  }

  def decode(payload: Array[Byte]): Option[Decoded] = {
    // the quarantine catch covers ONLY the reader: a bug in our own
    // analyze must fail loudly, not silently drop the corpus as
    // "corrupt media"
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map(analyze)
  }

  /** Frame count of a multi-frame container (TIFF pages, GIF frames);
    * 1 for single-frame formats, 0 for undecodable bytes.
    */
  def frameCount(payload: Array[Byte]): Int =
    withReader(payload)(_.getNumImages(true)).getOrElse(0)

  /** Decode every `stride`-th frame of a multi-frame payload — the
    * video-pipeline sampling shape over a real container index (the
    * unsampled frames are never pixel-decoded).
    */
  def sampleFrames(payload: Array[Byte], stride: Int): Seq[Decoded] =
    sampleFramesWithCount(payload, stride)._2

  /** (total frame count, sampled decodes) in ONE container parse —
    * the per-row hot-path form (count + sample separately would open
    * and index the container twice).
    */
  def sampleFramesWithCount(payload: Array[Byte], stride: Int): (Int, Seq[Decoded]) =
    withReader(payload) { r =>
      val n = r.getNumImages(true)
      // only reader calls run inside the quarantine catch; analyze
      // (our own math) runs outside it, below
      (n, (0 until n by math.max(stride, 1)).map(r.read(_)))
    }.map { case (n, imgs) => (n, imgs.map(analyze)) }
      .getOrElse((0, Seq.empty))

  private def withReader[A](payload: Array[Byte])(f: javax.imageio.ImageReader => A)
      : Option[A] = {
    val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      val r = readers.next()
      r.setInput(in)
      // NonFatal, not just IOException: corrupted containers make JDK
      // readers throw runtime exceptions, and the quarantine contract
      // (None, never a task-killing throw) covers those too
      try Some(f(r))
      catch { case scala.util.control.NonFatal(_) => None }
      finally r.dispose()
    } finally in.close()
  }
}
