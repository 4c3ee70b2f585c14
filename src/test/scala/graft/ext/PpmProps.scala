package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM ScalaCheck properties for the binary PPM (P6) codec: encode →
  * decode must be the identity for ARBITRARY dimensions and pixel bytes
  * (no Spark involved — the decoder is plain code and should be pinned as
  * such), and header variations the netpbm grammar allows (comments,
  * whitespace runs) must not change the decoded raster. */
object PpmProps extends Properties("Ppm") {

  private val image: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 24)
    px <- Gen.containerOfN[Array, Byte](w * h * 3,
      Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield (w, h, px)

  private def encode(w: Int, h: Int, px: Array[Byte],
      header: String): Array[Byte] =
    header.format(w, h).getBytes("US-ASCII") ++ px

  property("encode -> decodePpm is the identity") =
    forAll(image) { case (w, h, px) =>
      val (dw, dh, rgb) = Multimodal.decodePpm(encode(w, h, px, "P6\n%d %d\n255\n"))
      dw == w && dh == h && java.util.Arrays.equals(rgb, px)
    }

  property("comments and whitespace runs in the header are transparent") =
    forAll(image) { case (w, h, px) =>
      val fancy = "P6\n# c1\n  %d\t%d # trailing\n# c2\n255\n"
      val (dw, dh, rgb) = Multimodal.decodePpm(encode(w, h, px, fancy))
      dw == w && dh == h && java.util.Arrays.equals(rgb, px)
    }

  property("trailing bytes after the raster never leak into it") =
    forAll(image, Gen.containerOf[Array, Byte](
      Gen.choose(Byte.MinValue, Byte.MaxValue))) { case ((w, h, px), junk) =>
      val (_, _, rgb) = Multimodal.decodePpm(
        encode(w, h, px, "P6\n%d %d\n255\n") ++ junk)
      java.util.Arrays.equals(rgb, px)
    }

  property("truncated raster always fails loudly, never partial-decodes") =
    forAll(image) { case (w, h, px) =>
      // w, h >= 1 so the raster is non-empty; dropping one byte must fail
      val short = encode(w, h, px.dropRight(1), "P6\n%d %d\n255\n")
      scala.util.Try(Multimodal.decodePpm(short)).isFailure
    }
}
