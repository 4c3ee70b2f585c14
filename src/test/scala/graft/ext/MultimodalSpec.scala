package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("typed decode pipeline runs per-partition and is deterministic") {
    val ds = Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")
      .repartition(4)
    val meta = Multimodal.decodeMeta(ds).collect()
    assert(meta.length === 500)
    assert(meta.forall(m => m.width > 0 && m.height > 0 && m.nFrames >= 1))
    // deterministic: same payload -> same decoded fake
    val again = Multimodal.decodeMeta(
      Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")).collect()
    assert(meta.sortBy(_.docId).map(_.width).toSeq ===
      again.sortBy(_.docId).map(_.width).toSeq)
  }

  test("typed stub agrees with the expression-level stub in q29") {
    val typed = Multimodal.decodeMeta(
      Multimodal.fromDocuments(spark, "/root/testdata/sf0.001"))
      .collect().map(m => m.docId -> ((m.width, m.height, m.nFrames))).toMap
    val sql = graft.queries.Registry.byName("q29_multimodal_meta")
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4).toInt))).toMap
    assert(typed.size === sql.size)
    typed.foreach { case (id, (w, h, f)) =>
      assert(sql(id) === ((w, h, f)), s"doc $id")
    }
  }

  test("stub frame count is character-derived — q29 parity holds on " +
      "non-ASCII payloads") {
    import spark.implicits._
    val text = "é" * 150 // 150 chars, 300 UTF-8 bytes
    val ds = Seq(MediaFile(1L, "text/fake",
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))).toDS()
    val meta = Multimodal.decodeMeta(ds).collect().head
    // chars/100 + 1 = 2 (q29's n_chars formula); bytes/100 + 1 would be 4
    assert(meta.nFrames === 2)
    assert(meta.byteLen === 300)
  }

  test("sampleFrames rejects a non-positive stride on the driver") {
    val ds = Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(ds, every = 0)
    }
  }

  test("alert-log parser: reference tuple format, malformed dropped") {
    val lines = Seq(
      "(30,mean,3,-0.0123)",
      "(30,mean of 10% smallest,6,-0.0442)",
      "garbage",
      "(x,mean,1,0.5)", // bad count
      "(30,median,abc,0.5)", // bad assetNo
      "(30,median,2,notanumber)")
    val p = java.nio.file.Files.createTempDirectory("graft_alertlog")
      .resolve("output.txt")
    java.nio.file.Files.write(p, String.join("\n", lines: _*).getBytes)
    val df = graft.sources.Sources.readAlertLog(spark, p.toString)
    val rows = df.collect()
    assert(rows.length === 2)
    val r = rows.find(_.getAs[String]("stat") == "mean of 10% smallest").get
    assert(r.getAs[Int]("assetNo") === 6)
    // full value parsed — no reference truncation bug (SURVEY §2.5 Q10)
    assert(r.getAs[Double]("value") === -0.0442)
  }

  test("resize: 1:1 transform with new envelope dims, deterministic") {
    val ds = Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")
    val out = Multimodal.resize(ds, 64, 32).collect()
    assert(out.length === 500)
    assert(out.forall(m => m.width == 64 && m.height == 32 && m.nFrames == 1))
    assert(out.forall(_.byteLen == 64 * 32 / 64))
    val again = Multimodal.resize(
      Multimodal.fromDocuments(spark, "/root/testdata/sf0.001"), 64, 32)
      .collect()
    assert(out.sortBy(_.docId).map(_.fingerprint).toSeq ===
      again.sortBy(_.docId).map(_.fingerprint).toSeq)
  }

  test("sampleFrames: 1:N fan-out matches the decoded frame count") {
    val ds = Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")
    val frames = Multimodal.sampleFrames(ds, every = 2).collect()
    val metas = Multimodal.decodeMeta(
      Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")).collect()
    val expected = metas.map(m => (m.nFrames + 1) / 2).sum
    assert(frames.length === expected)
    // frame indices respect the stride and are unique per doc
    val byDoc = frames.groupBy(_.docId)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frameIdx).distinct.length === fs.length)
      assert(fs.forall(_.frameIdx % 2 == 0))
    }
  }

  test("decodePpm: real P6 parse — header, comments, raster round-trip") {
    // hand-built 2x2 image, known pixels, comment in the header
    val raster = Array[Byte](
      0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100, -1) // -1 = 255 unsigned
    val payload =
      "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ raster
    val (w, h, rgb) = Multimodal.decodePpm(payload)
    assert(w === 2 && h === 2)
    assert(rgb.toSeq === raster.toSeq)
    // trailing junk after the raster is ignored (netpbm allows it)
    val (w2, _, rgb2) =
      Multimodal.decodePpm(payload ++ "junk".getBytes("US-ASCII"))
    assert(w2 === 2 && rgb2.toSeq === raster.toSeq)
  }

  test("decodePpm: malformed payloads fail loudly, never decode garbage") {
    def bad(bytes: Array[Byte], why: String): Unit = {
      val e = intercept[IllegalArgumentException](Multimodal.decodePpm(bytes))
      assert(e.getMessage.contains("decodePpm"), why)
    }
    bad("P5\n2 2\n255\n".getBytes ++ Array.fill[Byte](12)(0), "bad magic")
    bad("P6\n2 x\n255\n".getBytes ++ Array.fill[Byte](12)(0), "bad height")
    bad("P6\n2 2\n65535\n".getBytes ++ Array.fill[Byte](24)(0),
      "two-byte maxval must be rejected, not misread")
    bad("P6\n2 2\n255\n".getBytes ++ Array.fill[Byte](11)(0), "short raster")
    bad("P6\n0 2\n255\n".getBytes, "zero width")
  }

  test("syntheticPpm round-trips through the real decoder with " +
      "closed-form channel sums") {
    for (d <- Seq(0L, 7L, 123L)) {
      val (w, h, rgb) = Multimodal.decodePpm(Multimodal.syntheticPpm(d))
      assert(w === (4 + d % 5).toInt && h === (3 + d % 4).toInt)
      val expR = (0 until w * h * 3 by 3).map(i => (d * 31 + i) % 256).sum
      val gotR = (0 until rgb.length by 3).map(i => (rgb(i) & 0xff).toLong).sum
      assert(gotR === expR, s"doc $d sum_r")
    }
    // and through the distributed pipeline
    import spark.implicits._
    val ds = Seq(5L, 6L).toDS()
      .map(d => MediaFile(d, "image/ppm", Multimodal.syntheticPpm(d)))
    val stats = Multimodal.ppmPixelStats(ds).collect()
      .map(s => s.doc_id -> s).toMap
    assert(stats(5L).width === 4 + 5 % 5 && stats(5L).height === 3 + 5 % 4)
    assert(stats(6L).sum_r ===
      (0 until stats(6L).width * stats(6L).height * 3 by 3)
        .map(i => (6L * 31 + i) % 256).sum)
  }

  test("decodeBmp: malformed payloads fail loudly, never decode garbage") {
    def bad(bytes: Array[Byte], why: String): Unit = {
      val e = intercept[IllegalArgumentException](Multimodal.decodeBmp(bytes))
      assert(e.getMessage.contains("decodeBmp"), why)
    }
    val ok = Multimodal.encodeBmp(2, 2, Array.fill[Byte](12)(7))
    bad(ok.take(40), "short header")
    bad({ val b = ok.clone(); b(0) = 'X'; b }, "bad magic")
    bad({ val b = ok.clone(); b(28) = 8; b },
      "8-bit palette BMP must be rejected, not misread")
    bad({ val b = ok.clone(); b(30) = 1; b },
      "RLE compression must be rejected")
    bad({ val b = ok.clone(); b(14) = 124; b },
      "BITMAPV5HEADER (untested layout) must be rejected")
    bad(ok.dropRight(1), "short pixel array")
  }

  test("syntheticBmp round-trips the real layout transforms with " +
      "closed-form channel sums (q115's contract)") {
    for (d <- Seq(0L, 7L, 123L)) {
      val (w, h, rgb) = Multimodal.decodeBmp(Multimodal.syntheticBmp(d))
      assert(w === (3 + d % 5).toInt && h === (2 + d % 4).toInt)
      for (ch <- 0 until 3) {
        val exp = (ch until w * h * 3 by 3).map(i => (d * 37 + i) % 256).sum
        val got = (ch until rgb.length by 3).map(i => (rgb(i) & 0xff).toLong).sum
        assert(got === exp, s"doc $d channel $ch")
      }
    }
    // and through the distributed pipeline
    import spark.implicits._
    val ds = Seq(5L, 6L).toDS()
      .map(d => MediaFile(d, "image/bmp", Multimodal.syntheticBmp(d)))
    val stats = Multimodal.bmpPixelStats(ds).collect()
      .map(s => s.doc_id -> s).toMap
    assert(stats(5L).width === 3 + 5 % 5 && stats(5L).height === 2 + 5 % 4)
    assert(stats(6L).sum_g ===
      (1 until stats(6L).width * stats(6L).height * 3 by 3)
        .map(i => (6L * 37 + i) % 256).sum)
  }

  test("decodePng: malformed payloads fail loudly, never decode garbage") {
    def bad(bytes: Array[Byte], why: String): Unit = {
      val e = intercept[IllegalArgumentException](Multimodal.decodePng(bytes))
      assert(e.getMessage.contains("decodePng"), why)
    }
    val ok = Multimodal.encodePng(3, 6, Array.tabulate[Byte](54)(_.toByte))
    bad(ok.take(7), "short signature")
    bad({ val b = ok.clone(); b(1) = 'X'; b }, "bad signature")
    bad({ val b = ok.clone(); b(8 + 8 + 9) = 4; b },
      "16-bit depth must be rejected (CRC catches the edit first, " +
        "either failure is loud)")
    bad(ok.dropRight(1), "truncated IEND")
    bad(ok ++ Array[Byte](1, 2, 3), "trailing bytes after IEND")
    // corrupt one byte of compressed IDAT data: CRC must catch it
    bad({ val b = ok.clone(); b(8 + 25 + 8) = (b(8 + 25 + 8) ^ 1).toByte; b },
      "flipped IDAT byte")
    // a chunk whose declared length overruns the payload
    bad({ val b = ok.clone(); b(8 + 3) = 99; b }, "overrun chunk length")
  }

  test("syntheticPng: a real compressed stream exercising all five " +
      "filters round-trips with closed-form channel sums (q140's contract)") {
    for (d <- Seq(0L, 7L, 123L)) {
      val (w, h, rgb) = Multimodal.decodePng(Multimodal.syntheticPng(d))
      assert(w === (3 + d % 5).toInt && h === (5 + d % 4).toInt)
      assert(h >= 5, "all five row filters must be exercised")
      for (ch <- 0 until 3) {
        val exp = (ch until w * h * 3 by 3).map(i => (d * 41 + i) % 256).sum
        val got = (ch until rgb.length by 3).map(i => (rgb(i) & 0xff).toLong).sum
        assert(got === exp, s"doc $d channel $ch")
      }
    }
    // and through the distributed pipeline
    import spark.implicits._
    val ds = Seq(5L, 6L).toDS()
      .map(d => MediaFile(d, "image/png", Multimodal.syntheticPng(d)))
    val stats = Multimodal.pngPixelStats(ds).collect()
      .map(s => s.doc_id -> s).toMap
    assert(stats(5L).width === 3 && stats(5L).height === 6)
    assert(stats(6L).sum_b ===
      (2 until stats(6L).width * stats(6L).height * 3 by 3)
        .map(i => (6L * 41 + i) % 256).sum)
  }

  test("resizeNearestRgb: exact index mapping, upscale and downscale") {
    // 2x2 source with distinct pixels; upscale to 4x4 replicates each
    // pixel into a 2x2 block (sx = x*2/4 = x/2), downscale to 1x1 keeps
    // the top-left pixel (sx = 0*2/1 = 0)
    val src = Array.tabulate[Byte](12)(i => (i * 10).toByte)
    val up = Multimodal.resizeNearestRgb(2, 2, src, 4, 4)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3)
      assert(up((y * 4 + x) * 3 + c) === src(((y / 2) * 2 + x / 2) * 3 + c),
        s"($y,$x,$c)")
    val down = Multimodal.resizeNearestRgb(2, 2, src, 1, 1)
    assert(down.toSeq === src.take(3).toSeq)
  }

  test("resizeBoxRgb: floored box mean, exact on a hand-built image; " +
      "upscale rejected") {
    // 4x2 -> 2x1: each output pixel averages a 2x2 box
    val src = Array.tabulate[Byte](24)(i => (i * 2).toByte)
    val out = Multimodal.resizeBoxRgb(4, 2, src, 2, 1)
    for (x <- 0 until 2; c <- 0 until 3) {
      val box = for (sy <- 0 until 2; sx <- 2 * x until 2 * x + 2)
        yield src((sy * 4 + sx) * 3 + c) & 0xff
      assert((out(x * 3 + c) & 0xff) === box.sum / 4, s"($x,$c)")
    }
    intercept[IllegalArgumentException](
      Multimodal.resizeBoxRgb(2, 2, Array.fill[Byte](12)(0), 3, 1))
  }

  test("resizePpmNearest: decode -> resample -> re-encode emits real " +
      "payloads the standard decode path consumes (q141's contract)") {
    import spark.implicits._
    val ds = Seq(3L, 9L).toDS()
      .map(d => MediaFile(d, "image/ppm", Multimodal.syntheticPpm(d)))
    val stats = Multimodal.ppmPixelStats(
      Multimodal.resizePpmNearest(ds, 3, 2)).collect()
      .map(s => s.doc_id -> s).toMap
    for (d <- Seq(3L, 9L)) {
      val (sw, sh, rgb) = Multimodal.decodePpm(Multimodal.syntheticPpm(d))
      val exp = Multimodal.resizeNearestRgb(sw, sh, rgb, 3, 2)
      assert(stats(d).width === 3 && stats(d).height === 2)
      assert(stats(d).sum_r ===
        (0 until exp.length by 3).map(i => (exp(i) & 0xff).toLong).sum)
    }
  }

  test("decodeY4m: real stream parse — header tags, frame walk, strict " +
      "failures") {
    val frames = (0 until 3).map(f =>
      Array.tabulate[Byte](3 * 4 * 2)(j => (f * 50 + j).toByte))
    val ok = Multimodal.encodeY4m(4, 2, frames)
    assert(Multimodal.decodeY4m(ok) === ((4, 2, 3)))
    def bad(bytes: Array[Byte], why: String): Unit = {
      val e = intercept[IllegalArgumentException](Multimodal.decodeY4m(bytes))
      assert(e.getMessage.contains("decodeY4m"), why)
    }
    bad("JUNK W4 H2 F25:1 C444\n".getBytes("US-ASCII"), "bad magic")
    bad("YUV4MPEG2 W4 H2 F25:1\n".getBytes("US-ASCII") ++
      Array.fill[Byte](30)(0),
      "default C420 chroma must be rejected, not misread as C444")
    bad("YUV4MPEG2 W4 H2 F25:1 C420\n".getBytes("US-ASCII"),
      "subsampled chroma rejected")
    bad(ok.dropRight(1), "short final frame")
    bad({ val b = ok.clone(); b(ok.indexOfSlice("FRAME".getBytes)) = 'G'; b },
      "corrupt FRAME marker")
  }

  test("wavFingerprints: derivative sign bits, stereo energy, loud on " +
      "short payloads (q181's contract)") {
    import spark.implicits._
    // mono energies |1|,|3|,|2|,|2| -> bits: 3>1='1', 2>3='0', 2>2='0'
    val mono = Multimodal.encodeWav(1, 8000, Array[Short](1, -3, 2, -2))
    // stereo frame energies |1|+|1|=2, |4|+|0|=4, |1|+|2|=3 -> "10"
    val stereo = Multimodal.encodeWav(2, 8000,
      Array[Short](1, -1, -4, 0, 1, 2))
    val ds = Seq((1L, mono, 4), (2L, stereo, 3)).toDS()
    val got = ds.map { case (d, p, _) => MediaFile(d, "audio/wav", p) }
    assert(Multimodal.wavFingerprints(
        got.filter(_.docId == 1L), frames = 4)
      .collect().head.fingerprint == "100")
    assert(Multimodal.wavFingerprints(
        got.filter(_.docId == 2L), frames = 3)
      .collect().head.fingerprint == "10")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.wavFingerprints(got, frames = 5).collect()
    }
    assert(e.getMessage != null)
  }

  test("syntheticWavFamily plants near-dup families: siblings hamming<=3, " +
      "non-siblings far") {
    import spark.implicits._
    def fp(d: Long): String = {
      val (nCh, _, s) =
        Multimodal.decodeWav(Multimodal.syntheticWavFamily(d))
      assert(nCh == 1 && s.length == 33)
      (1 until 33).map(i =>
        if (math.abs(s(i).toInt) > math.abs(s(i - 1).toInt)) '1'
        else '0').mkString
    }
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    // siblings: 63 apart; non-siblings: everything else
    for (d <- Seq(3L, 12L, 120L)) {
      assert(ham(fp(d), fp(d + 63)) <= 3, s"siblings $d/${d + 63} far")
      assert(ham(fp(d), fp(d + 9)) > 3, s"non-siblings $d/${d + 9} near")
    }
  }

  test("y4mFingerprints: luma-sum derivative sign bits, loud on short " +
      "payloads (q204's contract)") {
    import spark.implicits._
    // 1×1 frames with Y values 5, 9, 2, 2 -> bits: 9>5='1', 2>9='0',
    // 2>2='0' (chroma bytes present but irrelevant to the fingerprint)
    val y4m = Multimodal.encodeY4m(1, 1, Seq(
      Array[Byte](5, 10, 20), Array[Byte](9, 11, 21),
      Array[Byte](2, 12, 22), Array[Byte](2, 13, 23)))
    val ds = Seq(MediaFile(1L, "video/y4m", y4m)).toDS()
    assert(Multimodal.y4mFingerprints(ds, frames = 4)
      .collect().head.fingerprint == "100")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.y4mFingerprints(ds, frames = 5).collect()
    }
    assert(e.getMessage != null)
  }

  test("syntheticY4mFamily plants near-dup families: siblings " +
      "hamming<=3, non-siblings far; the jitter never wraps pixel 0") {
    import spark.implicits._
    def sums(d: Long): Seq[Long] = {
      val p = Multimodal.syntheticY4mFamily(d)
      val ds = Seq(MediaFile(d, "video/y4m", p)).toDS()
      // re-derive via the stats path (independent of y4mFingerprints)
      Multimodal.y4mFrameStats(ds, every = 1).collect()
        .sortBy(_.frame_idx).map(_.sum_y).toSeq
    }
    def fp(d: Long): String = {
      val s = sums(d)
      assert(s.length == 33)
      (1 until 33).map(i => if (s(i) > s(i - 1)) '1' else '0').mkString
    }
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    for (d <- Seq(4L, 13L, 121L)) {
      assert(ham(fp(d), fp(d + 63)) <= 3, s"siblings $d/${d + 63} far")
      assert(ham(fp(d), fp(d + 9)) > 3, s"non-siblings $d/${d + 9} near")
    }
    // pixel-0 wrap guard: base mod 250 + jitter <= 254 stays a valid
    // byte for every (fam, f, jit) — sample the residue space
    for (d <- 0L until 130L) {
      val (_, _, n) = Multimodal.decodeY4m(Multimodal.syntheticY4mFamily(d))
      assert(n == 33)
    }
  }

  test("wavChannelFeatures: zero crossings and energy, per channel, " +
      "integer-exact (q150's contract)") {
    import spark.implicits._
    // mono [1,-1,2,-2]: 3 sign changes, energy 1+1+4+4 = 10; stereo
    // interleaved [5,-3, -5,3]: ch0 [5,-5] -> 1 crossing, energy 50;
    // ch1 [-3,3] -> 1 crossing, energy 18
    val mono = Multimodal.encodeWav(1, 8000, Array[Short](1, -1, 2, -2))
    val stereo = Multimodal.encodeWav(2, 8000, Array[Short](5, -3, -5, 3))
    val ds = Seq((1L, mono), (2L, stereo)).toDS()
      .map { case (d, p) => MediaFile(d, "audio/wav", p) }
    val rows = Multimodal.wavChannelFeatures(ds).collect()
      .map(r => (r.doc_id, r.ch) -> ((r.zcr, r.energy))).toMap
    assert(rows((1L, 0)) === ((3L, 10L)))
    assert(rows((2L, 0)) === ((1L, 50L)))
    assert(rows((2L, 1)) === ((1L, 18L)))
  }

  test("wavTrimBounds: leading/trailing silence cut, any-channel rule, " +
      "all-silent reports -1 (q159's contract)") {
    import spark.implicits._
    // mono: silent, silent, loud, silent, loud, silent -> keep [2, 4]
    val a = Multimodal.encodeWav(1, 8000,
      Array[Short](10, -20, 30000, 5, -30001, 99))
    // stereo where only channel 1 ever gets loud -> keep [1, 1]
    val b = Multimodal.encodeWav(2, 8000,
      Array[Short](0, 100, 7, 31000, 4, -200))
    // all silent
    val c = Multimodal.encodeWav(1, 8000, Array[Short](1, 2, 3))
    val ds = Seq((1L, a), (2L, b), (3L, c)).toDS()
      .map { case (d, p) => MediaFile(d, "audio/wav", p) }
    val out = Multimodal.wavTrimBounds(ds, threshold = 30000).collect()
      .map(r => r.doc_id -> ((r.first_loud, r.last_loud, r.n_kept))).toMap
    assert(out(1L) === ((2, 4, 3)))
    assert(out(2L) === ((1, 1, 1)))
    assert(out(3L) === ((-1, -1, 0)))
  }

  test("dhash56: gradient-sign bits on a hand raster; small edits stay " +
      "Hamming-near, byte-identity is not required (q151's contract)") {
    // 2x1 image: left pixel gray 10, right gray 20 -> in the 8x8 resample
    // columns 0-3 map to the left pixel, 4-7 to the right; the only
    // horizontal gradient is at x=3, so bits y*7+3 are set for every row
    val rgb = Array[Byte](10, 10, 10, 20, 20, 20)
    val h = Multimodal.dhash56(2, 1, rgb)
    val expected = (0 until 8).map(y => 1L << (y * 7 + 3)).sum
    assert(h === expected)
    // flat image: no gradients, hash 0
    assert(Multimodal.dhash56(2, 2, Array.fill[Byte](12)(7)) === 0L)
    // a small brightness bump on ONE source pixel moves few bits
    val base = Array.tabulate[Byte](4 * 4 * 3)(i => (i * 5).toByte)
    val edit = base.clone(); edit(0) = (edit(0) + 90).toByte
    val hd = java.lang.Long.bitCount(
      Multimodal.dhash56(4, 4, base) ^ Multimodal.dhash56(4, 4, edit))
    assert(hd >= 1 && hd <= 8, s"edit moved $hd bits")
  }

  test("decodeMetaByKind: nine formats route to their codecs in one " +
      "pass; unknown kinds fail loudly (q146's contract)") {
    import spark.implicits._
    val ds = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).toDS()
      .map(graft.ext.Multimodal.syntheticMedia)
    val metas = Multimodal.decodeMetaByKind(ds).collect()
      .map(m => m.docId -> m).toMap
    assert(metas(0L).kind === "image/ppm" && metas(0L).width === 4)
    assert(metas(1L).kind === "image/bmp" && metas(1L).height === 3)
    assert(metas(2L).kind === "image/png" && metas(2L).width === 5)
    assert(metas(3L).kind === "audio/wav" && metas(3L).width === 2 &&
      metas(3L).height === 8000 && metas(3L).nFrames === 23)
    assert(metas(4L).kind === "video/y4m" && metas(4L).nFrames === 3)
    assert(metas(5L).kind === "image/gif" && metas(5L).width === 3 &&
      metas(5L).height === 5)
    assert(metas(6L).kind === "image/jpeg" && metas(6L).width === 16 &&
      metas(6L).height === 16)
    // d=7: mp3 — (channels, rate, frames) = (1 [mode 3=mono], 48000
    // [7%3=1], 8+7%5=10)
    assert(metas(7L).kind === "audio/mp3" && metas(7L).width === 1 &&
      metas(7L).height === 48000 && metas(7L).nFrames === 10)
    // d=8: h264 — 16·(2+8%6)-2 × 16·(2+8%4)-2, slices (2+8%3)·(2+8%4)
    assert(metas(8L).kind === "video/h264" && metas(8L).width === 62 &&
      metas(8L).height === 30 && metas(8L).nFrames === 8)
    val unknown = Seq(MediaFile(9L, "image/webp", Array[Byte](1, 2)))
      .toDS()
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.decodeMetaByKind(unknown).collect())
    assert(e.getMessage.contains("no decoder for kind") ||
      e.getCause.getMessage.contains("no decoder for kind"))
  }

  test("y4mSceneCuts: a hard luma jump is a cut, a flat continuation is " +
      "not; digest pins the cut set (q157's contract)") {
    import spark.implicits._
    val dark = Array.fill[Byte](3 * 2 * 2)(0)
    val bright = Array.fill[Byte](3 * 2 * 2)(-1) // 255 unsigned
    // frames: dark, dark (no cut), bright (cut at frame 2), bright
    val v = Multimodal.encodeY4m(2, 2, Seq(dark, dark, bright, bright))
    val ds = Seq(MediaFile(1L, "video/y4m", v)).toDS()
    val out = Multimodal.y4mSceneCuts(ds, threshold = 200).collect().head
    assert(out.n_frames === 4)
    assert(out.n_cuts === 1)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("2".getBytes).map(b => f"$b%02x").mkString
    assert(out.cuts_digest === md)
  }

  test("syntheticY4m: multi-frame walk + stride sampling with closed-form " +
      "plane sums (q142's contract)") {
    import spark.implicits._
    val ds = Seq(4L, 5L).toDS()
      .map(d => MediaFile(d, "video/y4m", Multimodal.syntheticY4m(d)))
    val rows = Multimodal.y4mFrameStats(ds, every = 2).collect()
      .map(s => (s.doc_id, s.frame_idx) -> s).toMap
    for (d <- Seq(4L, 5L)) {
      val w = (3 + d % 3).toInt
      val h = (2 + d % 3).toInt
      val nFrames = (3 + d % 4).toInt
      val kept = (0 until nFrames by 2)
      assert(rows.keys.count(_._1 == d) === kept.size, s"doc $d frame count")
      for (f <- kept) {
        val s = rows((d, f))
        assert(s.width === w && s.height === h)
        def planeSum(p: Int): Long =
          (p * w * h until (p + 1) * w * h)
            .map(j => (d * 23 + f * 5 + j) % 256).sum
        assert(s.sum_y === planeSum(0), s"doc $d frame $f Y")
        assert(s.sum_u === planeSum(1), s"doc $d frame $f U")
        assert(s.sum_v === planeSum(2), s"doc $d frame $f V")
      }
    }
  }
}
