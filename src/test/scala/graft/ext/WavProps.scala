package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM ScalaCheck properties for the PCM WAV codec: encodeWav →
  * decodeWav must be the identity for arbitrary channel counts, rates,
  * and signed samples (full 16-bit range, both sign extremes), and the
  * RIFF chunk walk must skip unknown chunks without touching the data. */
object WavProps extends Properties("Wav") {

  private val audio: Gen[(Int, Int, Array[Short])] = for {
    nCh <- Gen.choose(1, 4)
    rate <- Gen.choose(1, 96000)
    frames <- Gen.choose(0, 200)
    samples <- Gen.containerOfN[Array, Short](frames * nCh,
      Gen.choose(Short.MinValue, Short.MaxValue))
  } yield (nCh, rate, samples)

  property("encodeWav -> decodeWav is the identity") =
    forAll(audio) { case (nCh, rate, samples) =>
      val (dc, dr, ds) =
        Multimodal.decodeWav(Multimodal.encodeWav(nCh, rate, samples))
      dc == nCh && dr == rate && java.util.Arrays.equals(ds, samples)
    }

  property("unknown chunks (odd sizes included) are skipped word-aligned") =
    forAll(audio) { case (nCh, rate, samples) =>
      val base = Multimodal.encodeWav(nCh, rate, samples)
      // splice an ODD-sized junk chunk + pad byte between fmt and data
      val junk = Array[Byte]('j', 'u', 'n', 'k', 5, 0, 0, 0,
        1, 2, 3, 4, 5, 0 /* pad to word boundary */)
      val spliced = new Array[Byte](base.length + junk.length)
      System.arraycopy(base, 0, spliced, 0, 36)
      System.arraycopy(junk, 0, spliced, 36, junk.length)
      System.arraycopy(base, 36, spliced, 36 + junk.length, base.length - 36)
      val riffSize = base.length - 8 + junk.length
      spliced(4) = riffSize.toByte; spliced(5) = (riffSize >> 8).toByte
      spliced(6) = (riffSize >> 16).toByte; spliced(7) = (riffSize >> 24).toByte
      val (dc, dr, ds) = Multimodal.decodeWav(spliced)
      dc == nCh && dr == rate && java.util.Arrays.equals(ds, samples)
    }

  private def throws(bytes: Array[Byte]): Boolean =
    try { Multimodal.decodeWav(bytes); false }
    catch { case _: IllegalArgumentException => true }

  property("strict failures: bad magic / truncated data / non-PCM throw") =
    forAll(audio) { case (nCh, rate, samples) =>
      val ok = Multimodal.encodeWav(nCh, rate, samples)
      val badMagic = ok.clone(); badMagic(0) = 'X'
      val nonPcm = ok.clone(); nonPcm(20) = 3 // IEEE float format tag
      val truncated = ok.dropRight(1)
      throws(badMagic) && throws(nonPcm) &&
        (samples.isEmpty || throws(truncated))
    }

  property("syntheticWav decodes to the closed-form sample values") =
    forAll(Gen.choose(0L, 5000L)) { d =>
      val (nCh, rate, samples) = Multimodal.decodeWav(
        Multimodal.syntheticWav(d))
      val nFrames = (20 + d % 7).toInt
      nCh == (1 + d % 2).toInt && rate == (8000 + (d % 3) * 4000).toInt &&
        samples.length == nFrames * nCh &&
        samples.zipWithIndex.forall { case (s, k) =>
          s == ((d * 13 + k) % 65536 - 32768).toShort
        }
    }
}
