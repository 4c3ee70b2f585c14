package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM ScalaCheck properties for the GIF codec and its from-scratch
  * LZW: encode → decode must reproduce the palette-mapped raster exactly
  * for arbitrary index data — including low-entropy runs (deep dictionary
  * phrases, the KwKwK case) and images large enough to cross the 512/1024
  * code-width bumps, where any encoder/decoder width desync garbles
  * everything downstream. */
object GifProps extends Properties("Gif") {

  private val grayPalette: Array[Byte] =
    Array.tabulate(768)(i => (i / 3).toByte)

  private def expectedRgb(indices: Array[Byte],
      palette: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](indices.length * 3)
    var i = 0
    while (i < indices.length) {
      val v = indices(i) & 0xff
      out(3 * i) = palette(3 * v)
      out(3 * i + 1) = palette(3 * v + 1)
      out(3 * i + 2) = palette(3 * v + 2)
      i += 1
    }
    out
  }

  private val image: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 24)
    px <- Gen.containerOfN[Array, Byte](w * h,
      Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield (w, h, px)

  property("encodeGif -> decodeGif reproduces the palette-mapped raster") =
    forAll(image) { case (w, h, px) =>
      val (dw, dh, rgb) =
        Gif.decodeGif(Gif.encodeGif(w, h, px, grayPalette))
      dw == w && dh == h &&
        java.util.Arrays.equals(rgb, expectedRgb(px, grayPalette))
    }

  // low-entropy images: long runs build deep dictionary phrases and the
  // run boundaries produce the KwKwK self-referential code
  private val runs: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.choose(8, 32)
    h <- Gen.choose(8, 32)
    vals <- Gen.containerOfN[Array, Byte](4,
      Gen.choose(Byte.MinValue, Byte.MaxValue))
    runLen <- Gen.choose(3, 17)
  } yield (w, h,
    Array.tabulate(w * h)(i => vals((i / runLen) % vals.length)))

  property("low-entropy runs (deep phrases, KwKwK) round-trip") =
    forAll(runs) { case (w, h, px) =>
      val (_, _, rgb) = Gif.decodeGif(Gif.encodeGif(w, h, px, grayPalette))
      java.util.Arrays.equals(rgb, expectedRgb(px, grayPalette))
    }

  property("images past the width-bump thresholds round-trip " +
      "(width desync would garble the tail)") =
    forAll(Gen.choose(0, Int.MaxValue)) { seed =>
      // 64x64 = 4096 pixels of pseudo-random bytes: the dictionary blows
      // through the 512 and 1024 code thresholds and (often) the 4096
      // clear/reset
      val px = Array.tabulate(4096)(i =>
        ((seed.toLong * 31 + i * 2654435761L) % 256).toByte)
      val (_, _, rgb) = Gif.decodeGif(Gif.encodeGif(64, 64, px, grayPalette))
      java.util.Arrays.equals(rgb, expectedRgb(px, grayPalette))
    }
}
