package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM ScalaCheck properties for the PNG codec: encodePng → decodePng
  * must be the identity for ARBITRARY dimensions and pixel bytes. Heights
  * are drawn ≥ 5 in the dedicated property so every image exercises all
  * five row filters (encodePng uses filter r % 5); the general property
  * also draws short images so the top-row/left-edge boundary cases of the
  * Up/Average/Paeth inversions (missing `up`/`left` neighbors) are hit. */
object PngProps extends Properties("Png") {

  private val image: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.choose(1, 16)
    h <- Gen.choose(1, 16)
    px <- Gen.containerOfN[Array, Byte](w * h * 3,
      Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield (w, h, px)

  property("encodePng -> decodePng is the identity") =
    forAll(image) { case (w, h, px) =>
      val (dw, dh, rgb) = Multimodal.decodePng(Multimodal.encodePng(w, h, px))
      dw == w && dh == h && java.util.Arrays.equals(rgb, px)
    }

  private val tallImage: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.choose(1, 12)
    h <- Gen.choose(5, 16) // ≥ 5 rows ⇒ all five filter types present
    px <- Gen.containerOfN[Array, Byte](w * h * 3,
      Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield (w, h, px)

  property("all five row filters invert exactly (h >= 5)") =
    forAll(tallImage) { case (w, h, px) =>
      val (_, _, rgb) = Multimodal.decodePng(Multimodal.encodePng(w, h, px))
      java.util.Arrays.equals(rgb, px)
    }

  property("a flipped payload byte never decodes silently") =
    forAll(tallImage, Gen.choose(0, Int.MaxValue)) {
      case ((w, h, px), seed) =>
        val png = Multimodal.encodePng(w, h, px)
        // flip one byte somewhere after the signature; CRC (or the strict
        // grammar) must catch it — decode either throws, or the file was
        // unchanged (flipping a byte to itself is impossible: we XOR 0x01)
        val at = 8 + seed % (png.length - 8)
        val bad = png.clone()
        bad(at) = (bad(at) ^ 0x01).toByte
        scala.util.Try(Multimodal.decodePng(bad)).isFailure
    }
}
