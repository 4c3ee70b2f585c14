package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM ScalaCheck properties for the 24-bit BMP codec: encodeBmp →
  * decodeBmp must be the identity for ARBITRARY dimensions and pixel
  * bytes — widths are drawn so every padding class (row size mod 4 of
  * 0..3) is generated, pinning the padding arithmetic, the bottom-up row
  * flip and the BGR↔RGB swap as exact inverses. */
object BmpProps extends Properties("Bmp") {

  private val image: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 24)
    px <- Gen.containerOfN[Array, Byte](w * h * 3,
      Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield (w, h, px)

  property("encodeBmp -> decodeBmp is the identity") =
    forAll(image) { case (w, h, px) =>
      val (dw, dh, rgb) = Multimodal.decodeBmp(Multimodal.encodeBmp(w, h, px))
      dw == w && dh == h && java.util.Arrays.equals(rgb, px)
    }

  property("top-down storage (negative height) decodes to the same raster") =
    forAll(image) { case (w, h, px) =>
      // rewrite the bottom-up file as top-down: negate the height field
      // and reverse the stored row order; the decoded raster must agree
      val bu = Multimodal.encodeBmp(w, h, px)
      val rowSize = ((w * 3 + 3) / 4) * 4
      val td = bu.clone()
      val neg = -h
      td(22) = neg.toByte; td(23) = (neg >> 8).toByte
      td(24) = (neg >> 16).toByte; td(25) = (neg >> 24).toByte
      for (r <- 0 until h)
        System.arraycopy(bu, 54 + (h - 1 - r) * rowSize, td,
          54 + r * rowSize, rowSize)
      val (dw, dh, rgb) = Multimodal.decodeBmp(td)
      dw == w && dh == h && java.util.Arrays.equals(rgb, px)
    }

  property("trailing bytes after the pixel array never leak into it") =
    forAll(image, Gen.containerOf[Array, Byte](
      Gen.choose(Byte.MinValue, Byte.MaxValue))) { case ((w, h, px), junk) =>
      val (_, _, rgb) =
        Multimodal.decodeBmp(Multimodal.encodeBmp(w, h, px) ++ junk)
      java.util.Arrays.equals(rgb, px)
    }
}
