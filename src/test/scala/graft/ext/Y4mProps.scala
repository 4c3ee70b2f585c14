package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM ScalaCheck properties for the Y4M codec: encodeY4m →
  * frame-walk must preserve geometry and every plane byte for arbitrary
  * frame counts and dimensions, and truncating the payload anywhere in
  * the last frame must fail loudly (no silent short decode). */
object Y4mProps extends Properties("Y4m") {

  private val video: Gen[(Int, Int, Seq[Array[Byte]])] = for {
    w <- Gen.choose(1, 12)
    h <- Gen.choose(1, 12)
    nf <- Gen.choose(1, 6)
    frames <- Gen.listOfN(nf, Gen.containerOfN[Array, Byte](3 * w * h,
      Gen.choose(Byte.MinValue, Byte.MaxValue)))
  } yield (w, h, frames)

  property("encodeY4m -> decodeY4m preserves geometry and frame count") =
    forAll(video) { case (w, h, frames) =>
      Multimodal.decodeY4m(Multimodal.encodeY4m(w, h, frames)) ==
        ((w, h, frames.length))
    }

  property("a truncated final frame fails loudly") =
    forAll(video, Gen.choose(1, 8)) { case ((w, h, frames), cut) =>
      val v = Multimodal.encodeY4m(w, h, frames)
      val short = v.take(v.length - math.min(cut, 3 * w * h))
      scala.util.Try(Multimodal.decodeY4m(short)).isFailure
    }
}
