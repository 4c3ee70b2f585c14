package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** GIF codec: strict failure modes, the synthetic closed-form contract
  * (q149), and the distributed decode pipeline. */
class GifSpec extends AnyFunSuite with SparkTestBase {

  private val pal = Array.tabulate[Byte](768)(i => (i / 3).toByte)

  test("decodeGif: malformed payloads fail loudly, never decode garbage") {
    def bad(bytes: Array[Byte], why: String): Unit = {
      val e = intercept[IllegalArgumentException](Gif.decodeGif(bytes))
      assert(e.getMessage.contains("decodeGif"), why)
    }
    val ok = Gif.encodeGif(4, 3, Array.tabulate[Byte](12)(_.toByte), pal)
    bad(ok.take(10), "short header")
    bad({ val b = ok.clone(); b(0) = 'X'; b }, "bad magic")
    bad({ val b = ok.clone(); b(10) = (b(10) & 0x7f).toByte; b },
      "missing global color table")
    bad(ok.dropRight(1), "missing trailer")
    bad(ok.dropRight(6), "truncated image data")
    // interlace bit on the image descriptor (offset: 13 header+GCT 768,
    // then 0x2C block packed byte at +9)
    bad({ val b = ok.clone(); b(13 + 768 + 9) = 0x40.toByte; b },
      "interlaced images rejected")
  }

  test("syntheticGif: closed-form channel sums through the LZW " +
      "round-trip (q149's contract)") {
    for (d <- Seq(0L, 7L, 123L)) {
      val (w, h, rgb) = Gif.decodeGif(Gif.syntheticGif(d))
      assert(w === (3 + d % 5).toInt && h === (4 + d % 4).toInt)
      val mulOf = Seq(3, 5, 7)
      for (ch <- 0 until 3) {
        val exp = (0 until w * h)
          .map(i => ((d * 43 + i) % 256) * mulOf(ch) % 256).sum
        val got = (ch until rgb.length by 3)
          .map(i => (rgb(i) & 0xff).toLong).sum
        assert(got === exp, s"doc $d channel $ch")
      }
    }
    // and through the distributed pipeline + the dispatch table
    import spark.implicits._
    val ds = Seq(5L, 6L).toDS()
      .map(d => MediaFile(d, "image/gif", Gif.syntheticGif(d)))
    val stats = Multimodal.gifPixelStats(ds).collect()
      .map(s => s.doc_id -> s).toMap
    assert(stats(5L).width === 3 && stats(5L).height === 5)
    val metas = Multimodal.decodeMetaByKind(ds).collect()
    assert(metas.forall(_.kind == "image/gif"))
  }

  test("LZW survives a dictionary clear/reset (image > 4096 novel " +
      "sequences)") {
    // 96x96 = 9216 pseudo-random pixels: the dictionary fills to 4096,
    // the encoder emits CLEAR and rebuilds; a reset bug shears the image
    val px = Array.tabulate[Byte](9216)(i =>
      ((i * 2654435761L + (i >> 5) * 97) % 256).toByte)
    val (w, h, rgb) = Gif.decodeGif(Gif.encodeGif(96, 96, px, pal))
    assert(w === 96 && h === 96)
    val exp = px.flatMap(v => Array(pal(3 * (v & 0xff)),
      pal(3 * (v & 0xff) + 1), pal(3 * (v & 0xff) + 2)))
    assert(java.util.Arrays.equals(rgb, exp))
  }
}
