package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** ScalaCheck properties for the MP3 side-information parser: every field
  * of every frame/granule/channel must match the generator's closed-form
  * arithmetic restated independently (the same formulas the q202 DuckDB
  * oracle replays), across the full envelope-residue range; malformed
  * side info must fail loudly; and a CRC-protected frame must place side
  * info 2 bytes later (hand-built — the synthetic generator only writes
  * unprotected frames). */
object Mp3SideInfoProps extends Properties("Mp3SideInfo") {

  private val docId: Gen[Long] = Gen.choose(0L, 839L)

  /** The generator's side-info arithmetic, restated independently. */
  private def expected(d: Long, f: Int, nCh: Int): Mp3FrameSideInfo = {
    val grs = (for (g <- 0 until 2; c <- 0 until nCh) yield {
      val k = d * 131 + f * 17 + g * 7 + c * 3
      val wsf = (d + f + g + c) % 3 == 0
      val base = Mp3GranuleCh(g, c,
        part23Length = ((k * 5 + 11) % 3000).toInt,
        bigValues = ((k * 3 + 1) % 289).toInt,
        globalGain = ((k + 7) % 256).toInt,
        scalefacCompress = (k % 16).toInt,
        windowSwitching = wsf,
        blockType = 0, mixedBlock = false,
        tableSelect = Nil, subblockGain = Nil,
        region0Count = -1, region1Count = -1,
        preflag = (d + f + g) % 2 == 1,
        scalefacScale = (d + c) % 2 == 1,
        count1Table = ((d + g) % 2).toInt)
      if (wsf)
        base.copy(blockType = (1 + (d + f) % 3).toInt,
          mixedBlock = (d + g) % 2 == 1,
          tableSelect = Seq((k % 32).toInt, ((k + 31) % 32).toInt),
          subblockGain =
            Seq((k % 8).toInt, ((k + 5) % 8).toInt, ((k + 10) % 8).toInt))
      else
        base.copy(tableSelect = Seq((k % 32).toInt, ((k + 31) % 32).toInt,
            ((k + 62) % 32).toInt),
          region0Count = (k % 16).toInt, region1Count = (k % 8).toInt)
    }).toList
    Mp3FrameSideInfo(f,
      if (f == 0) 0 else ((d * 7 + f) % 512).toInt,
      (0 until nCh).map(c => ((d + c) % 16).toInt), grs)
  }

  private def expectedAll(d: Long): Seq[Mp3FrameSideInfo] = {
    val nCh = if (d % 4 == 3) 1 else 2
    (0 until (8 + d % 5).toInt).map(f => expected(d, f, nCh))
  }

  property("every side-info field matches the closed forms") =
    forAll(docId) { d =>
      Mp3.decodeSideInfos(Mp3.syntheticMp3SideInfo(d)) == expectedAll(d)
    }

  property("exhaustive over the envelope residues, incl. short blocks") =
    propBoolean {
      (0L until 840L).forall { d =>
        Mp3.decodeSideInfos(Mp3.syntheticMp3SideInfo(d)) == expectedAll(d)
      } && (0L until 840L).exists(d => expectedAll(d)
        .exists(_.granules.exists(gc => gc.windowSwitching &&
          gc.blockType == 2)))
    }

  property("the side-info payloads still satisfy the manifest walker") =
    forAll(docId) { d =>
      val m = Mp3.decodeMp3Meta(Mp3.syntheticMp3SideInfo(d))
      m.nFrames == (8 + d % 5).toInt &&
        m.channels == (if (d % 4 == 3) 1 else 2)
    }

  /** First frame's header offset (after any ID3v2 prefix). */
  private def frameOff(d: Long): Int =
    if (d % 2 == 0) 10 + (32 + d % 64).toInt else 0

  property("a CRC-protected frame reads side info 2 bytes later") =
    propBoolean {
      // d=7: mono (7%4=3), no ID3 tags (odd, not %3), smallest surface
      val d = 7L
      val bytes = Mp3.syntheticMp3SideInfo(d)
      val want = Mp3.decodeSideInfos(bytes)
      // rebuild frame 0 with protection_bit = 0 and 2 CRC bytes between
      // header and side info, dropping 2 filler bytes to keep the length
      val out = new java.io.ByteArrayOutputStream()
      var p = 0
      val hdr = java.util.Arrays.copyOfRange(bytes, p, p + 4)
      hdr(1) = (hdr(1) & ~0x01).toByte // CRC present
      out.write(hdr)
      out.write(0xab); out.write(0xcd) // CRC placeholder (not validated)
      val kbps = Mp3.BitrateKbps((1 + d % 14).toInt)
      val rate = Mp3.SampleRateHz((d % 3).toInt)
      val frameLen = 144000 * kbps / rate + (d % 2).toInt
      out.write(bytes, 4, frameLen - 4 - 2)
      out.write(bytes, frameLen, bytes.length - frameLen)
      val got = Mp3.decodeSideInfos(out.toByteArray)
      got == want
    }

  property("big_values > 288 fails loudly") = propBoolean {
    val d = 7L // mono, no tags: side info starts at byte 4
    val bytes = Mp3.syntheticMp3SideInfo(d)
    // granule 0's big_values spans side-block bits 30..38 (9 mdb +
    // 5 private + 4 scfsi + 12 part2_3 before it); force all-ones
    val bitBase = (4 + frameOff(d)) * 8 + 30
    var i = 0
    while (i < 9) {
      val b = bitBase + i
      bytes(b >>> 3) = (bytes(b >>> 3) | (1 << (7 - (b & 7)))).toByte
      i += 1
    }
    scala.util.Try(Mp3.decodeSideInfos(bytes)).isFailure
  }

  property("reserved block_type 0 under window switching fails loudly") =
    propBoolean {
      // d=7 mono: frame 1 granule 1 has (7+1+1+0) % 3 == 0 → switching.
      // Frame 1 starts at frameLen(f=0) = 144000·112/48000 + 1 = 337;
      // in its side block, granule 1 starts at bit 18 + 59 = 77 and its
      // block_type sits at bits 111..112 (12+9+8+4+1 after the granule
      // start, then the 1-bit wsf). Clear both bits → reserved 00.
      val d = 7L
      val bytes = Mp3.syntheticMp3SideInfo(d)
      val bitBase = (337 + 4) * 8 + 111
      var i = 0
      while (i < 2) {
        val b = bitBase + i
        bytes(b >>> 3) = (bytes(b >>> 3) & ~(1 << (7 - (b & 7)))).toByte
        i += 1
      }
      scala.util.Try(Mp3.decodeSideInfos(bytes)).isFailure
    }

  property("truncation inside the last frame fails loudly") =
    forAll(docId) { d =>
      val bytes = Mp3.syntheticMp3SideInfo(d)
      val cut = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 1)
      scala.util.Try(Mp3.decodeSideInfos(cut)).isFailure
    }
}
