package graft.ext

/** Parsed stream-level metadata for one MPEG-1 Layer III (MP3) payload. */
case class Mp3Meta(
    nFrames: Int,
    sampleRate: Int,
    channels: Int,
    /** sum of per-frame bitrates in kbps (integer, hash-stable; the mean is
      * this over nFrames — a VBR stream has a non-degenerate sum) */
    bitrateSumKbps: Long,
    /** nFrames · 1152 · 1000 / sampleRate, floored (integer ms) */
    durationMs: Long,
    hasId3v2: Boolean,
    hasId3v1: Boolean,
    byteLen: Int)

/** MPEG-1 Layer III frame-header walker, written from the public ISO/IEC
  * 11172-3 frame grammar (the header bit layout, bitrate/sample-rate
  * tables, and the `144000·kbps/rate + padding` frame-length rule are all
  * public knowledge, reproduced in every MP3 header reference).
  *
  * SCOPE — metadata-grade, not PCM-grade: this walks the frame sequence
  * (ID3v2 skip → sync/validate/size each frame → ID3v1 trailer) and
  * extracts what a 100 TB curation pipeline actually filters on — duration,
  * sample rate, channel count, VBR bitrate profile, tag presence — without
  * decoding audio. Full Layer III PCM synthesis (Huffman, requantization,
  * IMDCT, polyphase filterbank) stays behind the labeled [[Multimodal]]
  * stub; frame walking is the real, load-bearing half for manifest/quality
  * gating, and it is strict: any malformed byte fails loudly per-row
  * rather than walking garbage.
  *
  * Restrictions (strict, like the other codecs): MPEG-1 Layer III only
  * (version bits 11, layer bits 01); free-format (bitrate index 0) and
  * reserved indices rejected; sample rate and channel mode must be
  * constant across frames (the invariant real encoders keep — a stream
  * that changes mid-way is corrupt, not exotic).
  */
object Mp3 {

  /** MPEG-1 Layer III bitrate table, kbps, indexed by the 4-bit header
    * field. Index 0 = free format, 15 = reserved — both rejected. */
  private[ext] val BitrateKbps: Array[Int] =
    Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
      320, -1)

  /** MPEG-1 sample rates, Hz, indexed by the 2-bit header field. */
  private[ext] val SampleRateHz: Array[Int] = Array(44100, 48000, 32000, -1)

  /** Samples per MPEG-1 Layer III frame. */
  val SamplesPerFrame = 1152

  /** Walk an MP3 payload → [[Mp3Meta]]. Strict: bad sync, non-MPEG1/LayerIII
    * bits, free/reserved bitrate, reserved sample rate, a sample-rate or
    * channel-count change mid-stream, a frame overrunning the payload, or
    * trailing bytes that are neither a full frame nor an ID3v1 trailer all
    * throw. */
  def decodeMp3Meta(bytes: Array[Byte]): Mp3Meta = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"decodeMp3Meta: $msg")
    var pos = 0
    var end = bytes.length
    // ID3v2 prefix: "ID3" maj min flags size(4 × 7-bit syncsafe)
    val hasId3v2 = bytes.length >= 10 && bytes(0) == 'I' &&
      bytes(1) == 'D' && bytes(2) == '3'
    if (hasId3v2) {
      if ((bytes(6) | bytes(7) | bytes(8) | bytes(9)) < 0 ||
          ((bytes(6) | bytes(7) | bytes(8) | bytes(9)) & 0x80) != 0)
        fail("ID3v2 size bytes not syncsafe")
      val tagBody = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      pos = 10 + tagBody
      if (pos > end) fail(s"ID3v2 tag (10+$tagBody bytes) overruns payload")
    }
    // ID3v1 trailer: fixed 128 bytes, magic "TAG" — detected AT A FRAME
    // BOUNDARY during the walk, not by pre-sniffing bytes[end-128]. A
    // frame header starts 0xff, never 'T', so "exactly 128 bytes remain
    // and they start with TAG" is unambiguous; the pre-sniff form could
    // mis-split when audio data coincidentally carried "TAG" at end-128
    // (silently dropping 128 bytes of real frames if a frame boundary
    // landed exactly there).
    var hasId3v1 = false
    var nFrames = 0
    var sampleRate = -1
    var channels = -1
    var bitrateSum = 0L
    while (pos < end) {
      if (end - pos == 128 && bytes(pos) == 'T' && bytes(pos + 1) == 'A' &&
          bytes(pos + 2) == 'G') {
        hasId3v1 = true
        pos = end
      } else {
        if (pos + 4 > end) fail(s"truncated frame header at byte $pos")
        val b1 = bytes(pos) & 0xff
        val b2 = bytes(pos + 1) & 0xff
        val b3 = bytes(pos + 2) & 0xff
        val b4 = bytes(pos + 3) & 0xff
        if (b1 != 0xff || (b2 & 0xe0) != 0xe0)
          fail(f"lost sync at byte $pos (0x$b1%02x 0x$b2%02x)")
        if ((b2 & 0x18) != 0x18) fail(s"not MPEG-1 at byte $pos")
        if ((b2 & 0x06) != 0x02) fail(s"not Layer III at byte $pos")
        val brIdx = b3 >> 4
        val kbps = BitrateKbps(brIdx)
        if (kbps < 0) fail(s"free/reserved bitrate index $brIdx at byte $pos")
        val srIdx = (b3 >> 2) & 0x3
        val rate = SampleRateHz(srIdx)
        if (rate < 0) fail(s"reserved sample-rate index at byte $pos")
        if (sampleRate < 0) sampleRate = rate
        else if (rate != sampleRate)
          fail(s"sample rate changed $sampleRate→$rate at byte $pos")
        val pad = (b3 >> 1) & 0x1
        val nCh = if ((b4 >> 6) == 3) 1 else 2
        if (channels < 0) channels = nCh
        else if (nCh != channels)
          fail(s"channel count changed $channels→$nCh at byte $pos")
        val frameLen = 144000 * kbps / rate + pad
        if (pos + frameLen > end)
          fail(s"frame of $frameLen bytes at $pos overruns payload end $end")
        nFrames += 1
        bitrateSum += kbps
        pos += frameLen
      }
    }
    if (nFrames == 0) fail("no MP3 frames")
    Mp3Meta(nFrames, sampleRate, channels, bitrateSum,
      nFrames.toLong * SamplesPerFrame * 1000L / sampleRate,
      hasId3v2, hasId3v1, bytes.length)
  }

  /** Deterministic MP3 payload for doc `d` — a REAL MPEG-1 Layer III frame
    * sequence whose every header field follows closed-form arithmetic in
    * `d`, so a SQL oracle predicts the full manifest with no decoder:
    *
    *   - nFrames        = 8 + d % 5
    *   - sampleRate     = [44100, 48000, 32000][d % 3]
    *   - channel mode   = d % 4  (3 = mono → 1 channel, else 2)
    *   - frame i        : bitrate index 1 + (d + i) % 14 (a VBR profile —
    *                      every table entry exercised), padding (d + i) % 2
    *   - frame length   = 144000·kbps / rate + padding (integer division)
    *   - even d         : ID3v2 prefix with a (32 + d % 64)-byte body
    *                      (header-walking exercised — a parser that assumes
    *                      frame 0 at offset 0 fails)
    *   - d % 3 == 0     : ID3v1 128-byte trailer (a parser that treats the
    *                      trailer as frame data loses sync)
    *
    * Frame payload filler bytes are `(d·31 + pos·7) % 199 + 32` — never
    * 0xff, so a walker that mis-sizes a frame cannot silently re-sync. */
  def syntheticMp3(d: Long): Array[Byte] = {
    val nFrames = (8 + d % 5).toInt
    val srIdx = (d % 3).toInt
    val rate = SampleRateHz(srIdx)
    val chMode = (d % 4).toInt
    val out = new java.io.ByteArrayOutputStream()
    if (d % 2 == 0) {
      val body = (32 + d % 64).toInt
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4, no flags
      out.write((body >> 21) & 0x7f); out.write((body >> 14) & 0x7f)
      out.write((body >> 7) & 0x7f); out.write(body & 0x7f)
      var j = 0
      while (j < body) { out.write((d * 17 + j * 3).toInt & 0x7f); j += 1 }
    }
    var i = 0
    while (i < nFrames) {
      val brIdx = (1 + (d + i) % 14).toInt
      val kbps = BitrateKbps(brIdx)
      val pad = ((d + i) % 2).toInt
      val frameLen = 144000 * kbps / rate + pad
      out.write(0xff)
      out.write(0xe0 | 0x18 | 0x02 | 0x01) // MPEG-1, Layer III, no CRC
      out.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      out.write(chMode << 6)
      var j = 4
      while (j < frameLen) {
        out.write(((d * 31 + (out.size + 0L) * 7) % 199 + 32).toInt)
        j += 1
      }
      i += 1
    }
    if (d % 3 == 0) {
      out.write('T'); out.write('A'); out.write('G')
      var j = 0
      while (j < 125) { out.write((d * 7 + j).toInt & 0x7f); j += 1 }
    }
    out.toByteArray
  }
}
