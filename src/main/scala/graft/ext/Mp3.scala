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

/** One granule-channel's side-information fields (ISO 11172-3 §2.4.1.7:
  * 59 bits in both block shapes). `blockType`/`mixedBlock`/`subblockGain`
  * are meaningful only when `windowSwitching`; `region0Count`/
  * `region1Count` only when NOT (the spec's own either-or). */
case class Mp3GranuleCh(
    granule: Int,
    channel: Int,
    part23Length: Int,
    bigValues: Int,
    globalGain: Int,
    scalefacCompress: Int,
    windowSwitching: Boolean,
    blockType: Int,
    mixedBlock: Boolean,
    tableSelect: Seq[Int],
    subblockGain: Seq[Int],
    region0Count: Int,
    region1Count: Int,
    preflag: Boolean,
    scalefacScale: Boolean,
    count1Table: Int)

/** One frame's parsed side-information block. */
case class Mp3FrameSideInfo(
    frame: Int,
    mainDataBegin: Int,
    /** per-channel 4-bit scalefactor-selection-information mask */
    scfsi: Seq[Int],
    granules: Seq[Mp3GranuleCh])

/** MPEG-1 Layer III frame-header AND side-information parser, written
  * from the public ISO/IEC 11172-3 grammar (the header bit layout,
  * bitrate/sample-rate tables, the `144000·kbps/rate + padding`
  * frame-length rule, and the §2.4.1.7 side-info bit layout are all
  * public knowledge, reproduced in every MP3 format reference).
  *
  * SCOPE — structural, not PCM-grade. Two real layers:
  *   1. frame walking ([[decodeMp3Meta]]): ID3v2 skip → sync/validate/
  *      size each frame → ID3v1 trailer — duration, sample rate,
  *      channels, VBR bitrate profile, tag presence;
  *   2. side information ([[decodeSideInfos]]): the bit-packed per-frame
  *      control block (main_data_begin, scfsi, and per-granule-channel
  *      part2_3_length / big_values / global_gain / scalefac_compress /
  *      window-switching block shape / table selects / regions /
  *      preflag) — the layer that yields real curation signals with no
  *      psychoacoustic tables: bit-reservoir usage, audio bit budget,
  *      SHORT-BLOCK (transient) density, gain profile.
  *
  * Full PCM synthesis (Huffman main-data decode, requantization, IMDCT,
  * polyphase filterbank) is FORMALLY OUT OF SCOPE, not pending: it
  * requires ~34 spec Huffman tables plus the 512-coefficient synthesis
  * window, and this container has no independent MP3 codec to pin a
  * from-scratch implementation against — the JPEG codec earned "real"
  * status by hash-matching the JDK's independent decoder (JpegSpec), a
  * standard PCM output here could not meet, so it would be
  * self-consistent-only code, which this repo does not ship. The same
  * closure applies to H.264 macroblock decode ([[H264]]'s Annex-B/SPS/
  * PPS/slice-header layer is the shipped structural analog). Both
  * structural layers ARE verifiable — bit-exact against closed-form
  * constructions ([[syntheticMp3SideInfo]]) — and strict: any malformed
  * byte fails loudly per-row rather than walking garbage.
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

  /** Located frame: byte offset of the sync word, total frame length,
    * channel count, and whether a 2-byte CRC sits between header and
    * side info (protection_bit = 0). */
  private[ext] case class FrameRef(
      offset: Int, length: Int, channels: Int, hasCrc: Boolean)

  /** Walk an MP3 payload → [[Mp3Meta]]. Strict: bad sync, non-MPEG1/LayerIII
    * bits, free/reserved bitrate, reserved sample rate, a sample-rate or
    * channel-count change mid-stream, a frame overrunning the payload, or
    * trailing bytes that are neither a full frame nor an ID3v1 trailer all
    * throw. */
  def decodeMp3Meta(bytes: Array[Byte]): Mp3Meta =
    walkFrames(bytes, collectRefs = false)._1

  /** `collectRefs = false` keeps the manifest path (q168) allocation-free
    * per frame — only the side-info path (q202) pays for the FrameRef
    * vector it actually consumes. */
  private def walkFrames(bytes: Array[Byte], collectRefs: Boolean)
      : (Mp3Meta, Vector[FrameRef]) = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"decodeMp3Meta: $msg")
    val refs = Vector.newBuilder[FrameRef]
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
        if (collectRefs)
          refs += FrameRef(pos, frameLen, nCh, hasCrc = (b2 & 0x01) == 0)
        nFrames += 1
        bitrateSum += kbps
        pos += frameLen
      }
    }
    if (nFrames == 0) fail("no MP3 frames")
    (Mp3Meta(nFrames, sampleRate, channels, bitrateSum,
      nFrames.toLong * SamplesPerFrame * 1000L / sampleRate,
      hasId3v2, hasId3v1, bytes.length), refs.result())
  }

  /** MSB-first bit reader over a byte array (side info is bit-packed). */
  private final class BitReader(bytes: Array[Byte], startBit: Int) {
    private var p = startBit
    def pos: Int = p
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        v = (v << 1) | ((bytes(p >>> 3) >>> (7 - (p & 7))) & 1)
        p += 1
        i += 1
      }
      v
    }
  }

  /** Parse every frame's side-information block (ISO 11172-3 §2.4.1.7,
    * MPEG-1 layout: 17 bytes mono / 32 stereo, after the 4-byte header
    * and the optional 2-byte CRC). Strict like the walker:
    * `big_values` > 288 (past the 576-line granule), the reserved
    * `block_type = 0` under window switching, or a side-info block
    * overrunning its frame all throw. The bit consumption is
    * self-checked against the spec's fixed 136/256-bit total. */
  def decodeSideInfos(bytes: Array[Byte]): Seq[Mp3FrameSideInfo] = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"decodeSideInfos: $msg")
    val (_, refs) = walkFrames(bytes, collectRefs = true)
    refs.zipWithIndex.map { case (ref, fi) =>
      val nCh = ref.channels
      val headerBytes = 4 + (if (ref.hasCrc) 2 else 0)
      val sideBytes = if (nCh == 1) 17 else 32
      if (headerBytes + sideBytes > ref.length)
        fail(s"side info ($sideBytes B) overruns ${ref.length}-byte " +
          s"frame $fi")
      val r = new BitReader(bytes, (ref.offset + headerBytes) * 8)
      val start = r.pos
      val mdb = r.bits(9)
      r.bits(if (nCh == 1) 5 else 3) // private_bits
      val scfsi = (0 until nCh).map(_ => r.bits(4))
      val grs = (for (g <- 0 until 2; c <- 0 until nCh) yield {
        val p23 = r.bits(12)
        val bv = r.bits(9)
        if (bv > 288)
          fail(s"big_values $bv > 288 in frame $fi granule $g ch $c")
        val gg = r.bits(8)
        val sfc = r.bits(4)
        val wsf = r.bits(1) == 1
        if (wsf) {
          val bt = r.bits(2)
          if (bt == 0)
            fail(s"reserved block_type 0 under window switching in " +
              s"frame $fi granule $g ch $c")
          val mixed = r.bits(1) == 1
          val ts = Seq(r.bits(5), r.bits(5))
          val sbg = Seq(r.bits(3), r.bits(3), r.bits(3))
          Mp3GranuleCh(g, c, p23, bv, gg, sfc, windowSwitching = true,
            blockType = bt, mixedBlock = mixed, tableSelect = ts,
            subblockGain = sbg, region0Count = -1, region1Count = -1,
            preflag = r.bits(1) == 1, scalefacScale = r.bits(1) == 1,
            count1Table = r.bits(1))
        } else {
          val ts = Seq(r.bits(5), r.bits(5), r.bits(5))
          val r0 = r.bits(4)
          val r1 = r.bits(3)
          Mp3GranuleCh(g, c, p23, bv, gg, sfc, windowSwitching = false,
            blockType = 0, mixedBlock = false, tableSelect = ts,
            subblockGain = Nil, region0Count = r0, region1Count = r1,
            preflag = r.bits(1) == 1, scalefacScale = r.bits(1) == 1,
            count1Table = r.bits(1))
        }
      }).toList
      if (r.pos - start != sideBytes * 8)
        fail(s"side-info bit count ${r.pos - start} != ${sideBytes * 8} " +
          s"in frame $fi (parser self-check)")
      Mp3FrameSideInfo(fi, mdb, scfsi, grs)
    }
  }

  /** MSB-first bit writer (side-info construction). */
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nb = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1)
        nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    def toBytes: Array[Byte] = {
      require(nb == 0, "BitWriter: unaligned side-info block")
      buf.toArray
    }
  }

  /** Deterministic MP3 payload for doc `d` whose SIDE INFORMATION (not
    * just the headers) follows closed-form arithmetic, so a SQL oracle
    * predicts every parsed field with no decoder. Envelope (nFrames,
    * rates, channel mode, per-frame bitrate/padding, ID3 tags) is
    * [[syntheticMp3]]'s exactly. Side info, with
    * `k = d·131 + f·17 + g·7 + c·3` for frame f, granule g, channel c:
    *
    *   - main_data_begin   = 0 for f = 0, else (d·7 + f) % 512
    *   - scfsi[c]          = (d + c) % 16
    *   - part2_3_length    = (k·5 + 11) % 3000
    *   - big_values        = (k·3 + 1) % 289
    *   - global_gain       = (k + 7) % 256
    *   - scalefac_compress = k % 16
    *   - window switching  iff (d + f + g + c) % 3 == 0; then
    *     block_type = 1 + (d + f) % 3 (short blocks when = 2),
    *     mixed = (d + g) % 2, table_select[i] = (k + i·31) % 32,
    *     subblock_gain[i] = (k + i·5) % 8
    *   - else table_select[i] = (k + i·31) % 32,
    *     region0 = k % 16, region1 = k % 8
    *   - preflag = (d+f+g) % 2, scalefac_scale = (d+c) % 2,
    *     count1table_select = (d+g) % 2
    *
    * Filler after the side-info block keeps [[syntheticMp3]]'s byte
    * scheme. Every mod bound is the field's exact bit-range (or the
    * spec's semantic cap: big_values ≤ 288, block_type ∈ 1..3), so the
    * generated stream is structurally valid and a one-bit parser offset
    * error anywhere scrambles every later field — the gate checks the
    * whole layout, not a lucky prefix. */
  def syntheticMp3SideInfo(d: Long): Array[Byte] = {
    val nFrames = (8 + d % 5).toInt
    val srIdx = (d % 3).toInt
    val rate = SampleRateHz(srIdx)
    val chMode = (d % 4).toInt
    val nCh = if (chMode == 3) 1 else 2
    val out = new java.io.ByteArrayOutputStream()
    if (d % 2 == 0) {
      val body = (32 + d % 64).toInt
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0)
      out.write((body >> 21) & 0x7f); out.write((body >> 14) & 0x7f)
      out.write((body >> 7) & 0x7f); out.write(body & 0x7f)
      var j = 0
      while (j < body) { out.write((d * 17 + j * 3).toInt & 0x7f); j += 1 }
    }
    var f = 0
    while (f < nFrames) {
      val brIdx = (1 + (d + f) % 14).toInt
      val kbps = BitrateKbps(brIdx)
      val pad = ((d + f) % 2).toInt
      val frameLen = 144000 * kbps / rate + pad
      out.write(0xff)
      out.write(0xe0 | 0x18 | 0x02 | 0x01) // MPEG-1, Layer III, no CRC
      out.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      out.write(chMode << 6)
      val w = new BitWriter
      w.put(if (f == 0) 0 else ((d * 7 + f) % 512).toInt, 9)
      w.put(0, if (nCh == 1) 5 else 3) // private_bits
      var c = 0
      while (c < nCh) { w.put(((d + c) % 16).toInt, 4); c += 1 }
      var g = 0
      while (g < 2) {
        c = 0
        while (c < nCh) {
          val k = d * 131 + f * 17 + g * 7 + c * 3
          w.put(((k * 5 + 11) % 3000).toInt, 12)
          w.put(((k * 3 + 1) % 289).toInt, 9)
          w.put(((k + 7) % 256).toInt, 8)
          w.put((k % 16).toInt, 4)
          val wsf = (d + f + g + c) % 3 == 0
          w.put(if (wsf) 1 else 0, 1)
          if (wsf) {
            w.put((1 + (d + f) % 3).toInt, 2)
            w.put(((d + g) % 2).toInt, 1)
            var i = 0
            while (i < 2) { w.put(((k + i * 31) % 32).toInt, 5); i += 1 }
            i = 0
            while (i < 3) { w.put(((k + i * 5) % 8).toInt, 3); i += 1 }
          } else {
            var i = 0
            while (i < 3) { w.put(((k + i * 31) % 32).toInt, 5); i += 1 }
            w.put((k % 16).toInt, 4)
            w.put((k % 8).toInt, 3)
          }
          w.put(((d + f + g) % 2).toInt, 1)
          w.put(((d + c) % 2).toInt, 1)
          w.put(((d + g) % 2).toInt, 1)
          c += 1
        }
        g += 1
      }
      val side = w.toBytes
      out.write(side, 0, side.length)
      var j = 4 + side.length
      while (j < frameLen) {
        out.write(((d * 31 + (out.size + 0L) * 7) % 199 + 32).toInt)
        j += 1
      }
      f += 1
    }
    if (d % 3 == 0) {
      out.write('T'); out.write('A'); out.write('G')
      var j = 0
      while (j < 125) { out.write((d * 7 + j).toInt & 0x7f); j += 1 }
    }
    out.toByteArray
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
