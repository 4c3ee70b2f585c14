package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import javax.imageio.stream.MemoryCacheImageOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Baseline JPEG codec: round-trip reconstruction error, BOTH-direction
  * cross-checks against the JDK's independent ImageIO codec (our encoder
  * must be readable by theirs, their encoder by our decoder), restart
  * markers, strict failure modes, and the distributed pipeline. JPEG is
  * lossy and T.81 permits small per-decoder IDCT rounding differences,
  * so cross-decoder comparisons use tight-but-nonzero tolerances. */
class JpegSpec extends AnyFunSuite with SparkTestBase {

  private def rgbOf(img: BufferedImage): Array[Byte] = {
    val out = new Array[Byte](img.getWidth * img.getHeight * 3)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      val o = (y * img.getWidth + x) * 3
      out(o) = ((p >> 16) & 0xff).toByte
      out(o + 1) = ((p >> 8) & 0xff).toByte
      out(o + 2) = (p & 0xff).toByte
    }
    out
  }

  private def maxAbsDiff(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length)
    a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff))).max
  }

  private def meanAbsDiff(a: Array[Byte], b: Array[Byte]): Double =
    a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff))).sum
      .toDouble / a.length

  private def imageioJpeg(img: BufferedImage, quality: Float)
      : Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    w.setOutput(new MemoryCacheImageOutputStream(bos))
    w.write(null, new IIOImage(img, null, null), p)
    w.dispose()
    bos.toByteArray
  }

  test("round trip: smooth synthetic fixtures reconstruct within small " +
      "quantization error at quality 90") {
    for (d <- Seq(0L, 1L, 5L, 12L, 40L)) {
      val (w, h, orig) = Jpeg.syntheticJpegRgb(d)
      val (dw, dh, back) = Jpeg.decodeJpeg(Jpeg.syntheticJpeg(d))
      assert((dw, dh) === ((w, h)), s"dims for d=$d")
      assert(meanAbsDiff(orig, back) <= 2.5, s"mean error for d=$d")
      assert(maxAbsDiff(orig, back) <= 20, s"max error for d=$d")
    }
  }

  test("our PROGRESSIVE encoder: spectral-selection script carries the " +
      "same coefficients as baseline (bit-identical decode, ours AND " +
      "the JDK's)") {
    val (w, h, rgb) = Jpeg.syntheticJpegRgb(23L)
    val seq = Jpeg.encodeJpeg(w, h, rgb, quality = 90)
    val prog = Jpeg.encodeJpegProgressive(w, h, rgb, quality = 90)
    assert(isProgressive(prog) && !isProgressive(seq))
    val (_, _, a) = Jpeg.decodeJpeg(seq)
    val (_, _, b) = Jpeg.decodeJpeg(prog)
    assert(java.util.Arrays.equals(a, b),
      "our two encodings decode differently")
    // the JDK agrees on both streams
    val ja = rgbOf(ImageIO.read(new ByteArrayInputStream(seq)))
    val jb = rgbOf(ImageIO.read(new ByteArrayInputStream(prog)))
    assert(java.util.Arrays.equals(ja, jb),
      "the JDK decodes our two encodings differently")
    assert(maxAbsDiff(a, ja) <= 2)
    // and the corpus fixture rule deals progressive payloads
    assert(isProgressive(Jpeg.syntheticJpeg(1L)))
    assert(isProgressive(Jpeg.syntheticJpeg(11L)))
  }

  test("our encoder's streams decode under the JDK's INDEPENDENT codec " +
      "to the same pixels (±IDCT rounding)") {
    for (d <- Seq(2L, 6L, 9L)) { // 6 % 5 == 1: a progressive fixture
      val bytes = Jpeg.syntheticJpeg(d)
      val (w, h, mine) = Jpeg.decodeJpeg(bytes)
      val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(theirs.getWidth === w && theirs.getHeight === h)
      assert(maxAbsDiff(mine, rgbOf(theirs)) <= 2,
        s"pixel disagreement vs ImageIO for d=$d")
    }
  }

  test("the JDK encoder's GRAYSCALE streams decode under ours to the " +
      "same pixels (±IDCT rounding; no subsampling in play)") {
    val img = new BufferedImage(37, 22, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 22; x <- 0 until 37) {
      val g = 30 + (x * 4 + y * 6) % 180
      img.getRaster.setSample(x, y, 0, g) // raw sample: getRGB would pass
                                          // through the linear-gray ICC
                                          // transform and skew the check
    }
    val bytes = imageioJpeg(img, 0.9f)
    val (w, h, mine) = Jpeg.decodeJpeg(bytes)
    assert(w === 37 && h === 22)
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    val diffs = for (y <- 0 until h; x <- 0 until w) yield
      math.abs((mine((y * w + x) * 3) & 0xff) -
        theirs.getRaster.getSample(x, y, 0))
    assert(diffs.max <= 2, s"max gray diff ${diffs.max}")
  }

  test("the JDK encoder's COLOR streams (whatever subsampling it picks) " +
      "decode under ours close to its own reading") {
    val img = new BufferedImage(41, 29, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 29; x <- 0 until 41)
      img.setRGB(x, y, ((60 + x * 3) << 16) | ((50 + y * 5) << 8) |
        (80 + (x + y) * 2))
    val bytes = imageioJpeg(img, 0.85f)
    val (w, h, mine) = Jpeg.decodeJpeg(bytes)
    assert(w === 41 && h === 29)
    val theirs = rgbOf(ImageIO.read(new ByteArrayInputStream(bytes)))
    // subsampled chroma may be upsampled differently (we replicate, the
    // JDK may filter) — tolerate small chroma drift, tight mean
    assert(meanAbsDiff(mine, theirs) <= 2.0, "mean vs ImageIO")
    assert(maxAbsDiff(mine, theirs) <= 16, "max vs ImageIO")
  }

  private def imageioProgressive(img: BufferedImage, quality: Float)
      : Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new ByteArrayOutputStream()
    w.setOutput(new MemoryCacheImageOutputStream(bos))
    w.write(null, new IIOImage(img, null, null), p)
    w.dispose()
    bos.toByteArray
  }

  private def isProgressive(bytes: Array[Byte]): Boolean =
    bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2)

  test("PROGRESSIVE color streams (the JDK's default multi-scan script: " +
      "DC+AC first scans, successive-approximation refinements, EOB " +
      "runs) decode under ours close to the JDK's own reading") {
    val img = new BufferedImage(43, 31, BufferedImage.TYPE_INT_RGB)
    // wrap-free gradients (a mod-256 cliff rings, and ringing is where
    // box and triangular chroma upsamplers legitimately diverge)
    for (y <- 0 until 31; x <- 0 until 43)
      img.setRGB(x, y, ((55 + x * 2) << 16) | ((45 + y * 3) << 8) |
        (75 + x + y))
    val bytes = imageioProgressive(img, 0.85f)
    assert(isProgressive(bytes), "fixture is not actually progressive")
    val (w, h, mine) = Jpeg.decodeJpeg(bytes)
    assert(w === 43 && h === 31)
    val theirs = rgbOf(ImageIO.read(new ByteArrayInputStream(bytes)))
    assert(meanAbsDiff(mine, theirs) <= 2.0, "mean vs ImageIO")
    assert(maxAbsDiff(mine, theirs) <= 16, "max vs ImageIO")
  }

  test("PROGRESSIVE grayscale streams decode under ours to the JDK's " +
      "raster samples (±IDCT rounding)") {
    val img = new BufferedImage(29, 38, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 38; x <- 0 until 29)
      img.getRaster.setSample(x, y, 0, 20 + (x * 7 + y * 3) % 200)
    val bytes = imageioProgressive(img, 0.9f)
    assert(isProgressive(bytes), "fixture is not actually progressive")
    val (w, h, mine) = Jpeg.decodeJpeg(bytes)
    assert(w === 29 && h === 38)
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    val diffs = for (y <- 0 until h; x <- 0 until w) yield
      math.abs((mine((y * w + x) * 3) & 0xff) -
        theirs.getRaster.getSample(x, y, 0))
    assert(diffs.max <= 2, s"max gray diff ${diffs.max}")
  }

  test("sequential and progressive encodings of the same image decode " +
      "BIT-IDENTICALLY (same coefficients — the scan organization must " +
      "not change one reconstructed sample)") {
    val img = new BufferedImage(43, 31, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 31; x <- 0 until 43)
      img.setRGB(x, y, ((55 + x * 4) << 16) | ((45 + y * 6) << 8) |
        (75 + (x * 2 + y) * 2)) // wraps allowed: exactness is the point
    val seq = imageioJpeg(img, 0.85f)
    val prog = imageioProgressive(img, 0.85f)
    assert(!isProgressive(seq) && isProgressive(prog))
    val (w1, h1, a) = Jpeg.decodeJpeg(seq)
    val (w2, h2, b) = Jpeg.decodeJpeg(prog)
    assert(w1 === w2 && h1 === h2)
    assert(java.util.Arrays.equals(a, b),
      "progressive reconstruction diverged from sequential")
  }

  test("a flipped byte in a PROGRESSIVE stream's entropy data never " +
      "passes silently") {
    val img = new BufferedImage(24, 24, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 24)
      img.setRGB(x, y, ((90 + x * 5) << 16) | ((80 + y * 5) << 8) | 110)
    val bytes = imageioProgressive(img, 0.85f)
    val (_, _, clean) = Jpeg.decodeJpeg(bytes)
    // first SOS's entropy region start
    val sos = bytes.indices.find(i => (bytes(i) & 0xff) == 0xff &&
      i + 1 < bytes.length && (bytes(i + 1) & 0xff) == 0xda).get
    val entropyStart = sos + 2 + (((bytes(sos + 2) & 0xff) << 8) |
      (bytes(sos + 3) & 0xff))
    val flips = (0 until 10).map(k =>
      entropyStart + (k * 5077) % (bytes.length - entropyStart - 4))
    for (at <- flips) {
      val mut = bytes.clone()
      mut(at) = (mut(at) ^ 0x22).toByte
      val silent = try {
        val (_, _, out) = Jpeg.decodeJpeg(mut)
        java.util.Arrays.equals(out, clean)
      } catch { case _: Exception => false }
      assert(!silent, s"flip at $at produced a silent identical decode")
    }
  }

  test("restart markers: every 3rd fixture carries DRI/RSTn; both " +
      "decoders accept and agree") {
    val bytes = Jpeg.syntheticJpeg(3L) // d % 3 == 0 -> restartInterval 2
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xdd), "no DRI emitted")
    val (w, h, mine) = Jpeg.decodeJpeg(bytes)
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(theirs.getWidth === w && theirs.getHeight === h)
    assert(maxAbsDiff(mine, rgbOf(theirs)) <= 2)
  }

  test("malformed payloads fail loudly, never decode garbage") {
    def bad(bytes: Array[Byte], why: String): Unit = {
      val e = intercept[IllegalArgumentException](Jpeg.decodeJpeg(bytes))
      assert(e.getMessage.contains("decodeJpeg"), why)
    }
    val ok = Jpeg.syntheticJpeg(2L) // baseline fixture (2 % 5 != 1)
    bad(Array[Byte](1, 2, 3), "not a JPEG")
    bad(ok.take(2), "SOI only")
    bad(ok.dropRight(1), "missing EOI")
    bad(ok.dropRight(40), "truncated entropy segment")
    bad(ok ++ Array[Byte](0), "trailing bytes after EOI")
    // extended-sequential frame marker: SOF0 (FFC0) -> SOF1 (FFC1)
    val sof = ok.indices.find(i => (ok(i) & 0xff) == 0xff &&
      i + 1 < ok.length && (ok(i + 1) & 0xff) == 0xc0).get
    val ext = ok.clone(); ext(sof + 1) = 0xc1.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decodeJpeg(ext))
    assert(e.getMessage.contains("unsupported"))
    // SOF2 is SUPPORTED now — but relabeling a baseline stream as
    // progressive must still fail loudly on the scan header (a baseline
    // full-band scan is invalid inside a progressive frame)
    bad({ val b = ok.clone(); b(sof + 1) = 0xc2.toByte; b },
      "baseline scan inside a progressive frame")
  }

  test("a flipped byte in the entropy-coded segment never passes " +
      "silently: decode throws or pixels change") {
    val ok = Jpeg.syntheticJpeg(7L)
    val (_, _, clean) = Jpeg.decodeJpeg(ok)
    val sos = ok.indices.find(i => (ok(i) & 0xff) == 0xff &&
      i + 1 < ok.length && (ok(i + 1) & 0xff) == 0xda).get
    val entropyStart = sos + 2 + (((ok(sos + 2) & 0xff) << 8) |
      (ok(sos + 3) & 0xff))
    // avoid the final pad-bit byte (flipping pure padding is a no-op by
    // design) and the EOI marker
    val flips = (0 until 12).map(k =>
      entropyStart + (k * 7919) % (ok.length - entropyStart - 4))
    for (at <- flips) {
      val mut = ok.clone()
      mut(at) = (mut(at) ^ 0x14).toByte
      val silent = try {
        val (_, _, out) = Jpeg.decodeJpeg(mut)
        java.util.Arrays.equals(out, clean)
      } catch {
        case _: IllegalArgumentException => false
        case _: ArrayIndexOutOfBoundsException => false
      }
      assert(!silent, s"flip at $at produced a silent identical decode")
    }
  }

  test("distributed pipeline: jpegPixelStats and the by-kind dispatch " +
      "route JPEG payloads through the real decoder") {
    import spark.implicits._
    val ds = Seq(3L, 4L, 5L).toDS()
      .map(d => MediaFile(d, "image/jpeg", Jpeg.syntheticJpeg(d)))
    val stats = Multimodal.jpegPixelStats(ds).collect()
      .map(s => s.doc_id -> s).toMap
    for (d <- Seq(3L, 4L, 5L)) {
      val (w, h, rgb) = Jpeg.decodeJpeg(Jpeg.syntheticJpeg(d))
      assert(stats(d).width === w && stats(d).height === h)
      val rSum = (0 until rgb.length by 3).map(i => (rgb(i) & 0xff).toLong)
        .sum
      assert(stats(d).sum_r === rSum, s"doc $d sum_r")
    }
    val meta = Multimodal.decodeMetaByKind(ds).collect()
    assert(meta.length === 3 && meta.forall(_.nFrames === 1))
  }
}
