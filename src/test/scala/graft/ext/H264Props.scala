package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Pure-JVM ScalaCheck properties for the H.264 Annex-B walker + SPS
  * parser: the synthetic stream's manifest must match the generator's
  * closed-form arithmetic for EVERY doc-id residue (lcm of the envelope
  * mods is 420, so d ∈ [0, 840) proves the oracle SQL for every possible
  * doc_id), emulation-prevention bytes must be provably load-bearing, and
  * malformed streams must fail loudly. */
object H264Props extends Properties("H264") {

  private val docId: Gen[Long] = Gen.choose(0L, 839L)

  /** The generator's envelope, restated independently (what the DuckDB
    * oracle replays in SQL). */
  private def expected(d: Long): (Int, Int, Int, Int, Int, Int, Int, Int,
      Int, Int) = {
    val crop = if (d % 2 == 0) 2 else 0
    val width = 16 * (2 + d % 6).toInt - crop
    val height = 16 * (2 + d % 4).toInt - crop
    val profile = 66 + (d % 2).toInt * 11
    val level = 30 + (d % 3).toInt
    val nGop = (2 + d % 3).toInt
    val nP = (1 + d % 4).toInt
    val nSei = if (d % 2 == 0) 1 else 0
    val nNal = 2 + nSei + nGop * (1 + nP)
    val nEpb = if (d % 2 == 0) 1 + (d % 3).toInt else 0
    (width, height, profile, level, nNal, nGop, nGop * (1 + nP), nSei, 1,
      nEpb)
  }

  private def metaTuple(m: H264Meta) = (m.width, m.height, m.profileIdc,
    m.levelIdc, m.nNal, m.nIdr, m.nSlices, m.nSei, m.nPps, m.nEpb)

  property("manifest matches the closed-form envelope for every residue") =
    forAll(docId) { d =>
      metaTuple(H264.decodeH264Meta(H264.syntheticH264(d))) == expected(d)
    }

  property("every residue is covered exhaustively") = propBoolean {
    (0L until 840L).forall(d =>
      metaTuple(H264.decodeH264Meta(H264.syntheticH264(d))) == expected(d))
  }

  property("emulation prevention is load-bearing on every even doc") =
    propBoolean {
      (0L until 840L by 2).forall { d =>
        H264.decodeH264Meta(H264.syntheticH264(d)).nEpb == 1 + (d % 3).toInt
      }
    }

  property("escape/unescape round-trips arbitrary RBSPs, incl. zero runs") =
    forAll(Gen.listOf(Gen.frequency(
      3 -> Gen.const(0.toByte),
      1 -> Gen.choose(Byte.MinValue, Byte.MaxValue)))) { l =>
      val rbsp = l.toArray
      val (back, _) = H264.unescapeRbsp(H264.escapeRbsp(rbsp))
      java.util.Arrays.equals(back, rbsp)
    }

  property("a stream with no start code fails loudly") = forAll(docId) { d =>
    val bytes = H264.syntheticH264(d)
    bytes(3) = 0x55.toByte // break the 00 00 00 01 opener
    scala.util.Try(H264.decodeH264Meta(bytes)).isFailure
  }

  property("a set forbidden_zero_bit fails loudly") = forAll(docId) { d =>
    val bytes = H264.syntheticH264(d)
    bytes(4) = (bytes(4) | 0x80).toByte // first NAL header (the SPS)
    scala.util.Try(H264.decodeH264Meta(bytes)).isFailure
  }

  property("a stream whose SPS is dropped fails loudly") =
    forAll(docId) { d =>
      val bytes = H264.syntheticH264(d)
      // NAL type 7 -> 9 (AUD): census-legal but the stream loses its SPS
      bytes(4) = ((bytes(4) & 0xe0) | 9).toByte
      scala.util.Try(H264.decodeH264Meta(bytes)).isFailure
    }

  property("unescaped 00 00 01 inside a NAL fails (lost start code)") =
    propBoolean {
      scala.util.Try(
        H264.unescapeRbsp(Array[Byte](0x40, 0, 0, 1, 0x40))).isFailure
    }
}
