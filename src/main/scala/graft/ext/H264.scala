package graft.ext

import scala.collection.mutable.ArrayBuffer

/** Parsed stream-level metadata for one H.264 Annex-B payload. */
case class H264Meta(
    width: Int,
    height: Int,
    profileIdc: Int,
    levelIdc: Int,
    nNal: Int,
    nIdr: Int,
    nSlices: Int,
    nSei: Int,
    nPps: Int,
    /** emulation-prevention bytes removed across all NALs — nonzero proves
      * the un-escaping path is load-bearing, not dead code */
    nEpb: Int,
    byteLen: Int)

/** H.264 (ITU-T H.264 / ISO 14496-10) Annex-B stream walker + SPS parser,
  * written from the public spec: start-code delimiting (B.1), NAL header
  * layout (7.3.1), emulation-prevention un-escaping (7.4.1), Exp-Golomb
  * ue(v)/se(v) (9.1), and the seq_parameter_set_rbsp grammar (7.3.2.1)
  * with the frame-cropping arithmetic of 7.4.2.1.1 (CropUnitX/Y = 2 for
  * 4:2:0 frame-coded streams).
  *
  * SCOPE — metadata-grade, not pixel-grade: this recovers what a 100 TB
  * video-curation pipeline filters on — resolution (crop-adjusted),
  * profile/level, GOP shape (IDR density), slice/SEI census — without
  * decoding macroblocks. CABAC/CAVLC slice decoding stays behind the
  * labeled [[Multimodal]] stub; the bitstream walking, un-escaping and
  * SPS parse are real and strict: any malformed byte fails loudly
  * per-row rather than walking garbage.
  *
  * Restrictions (strict): baseline/main profiles only (profile_idc 66/77 —
  * no high-profile chroma branch), frame_mbs_only streams, pic_order_cnt
  * types 0 and 2, exactly one SPS per stream, NAL types limited to
  * non-IDR/IDR slice, SEI, SPS, PPS, AUD.
  */
object H264 {

  /** Big-endian bit reader over an un-escaped RBSP. */
  private final class BitReader(rbsp: Array[Byte]) {
    private var bitPos = 0
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIdx = bitPos >> 3
        if (byteIdx >= rbsp.length)
          throw new IllegalArgumentException(
            s"parseSps: read past RBSP end at bit $bitPos")
        v = (v << 1) | ((rbsp(byteIdx) >> (7 - (bitPos & 7))) & 1)
        bitPos += 1
        i += 1
      }
      v
    }
    /** Exp-Golomb unsigned: count leading zeros z, read z more bits,
      * value = 2^z - 1 + suffix. */
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        if (zeros > 31)
          throw new IllegalArgumentException(
            "parseSps: Exp-Golomb run over 31 zeros")
      }
      (1 << zeros) - 1 + u(zeros)
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  /** Big-endian bit writer producing an RBSP (trailing stop bit added by
    * [[rbspTrailing]]). */
  private final class BitWriter {
    private val out = ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def u(n: Int, v: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nBits += 1
        if (nBits == 8) { out += cur.toByte; cur = 0; nBits = 0 }
        i -= 1
      }
    }
    def ue(v: Int): Unit = {
      require(v >= 0, s"ue($v)")
      val bits = 32 - Integer.numberOfLeadingZeros(v + 1)
      u(bits - 1, 0)
      u(bits, v + 1)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def rbspTrailing(): Array[Byte] = {
      u(1, 1)
      while (nBits != 0) u(1, 0)
      out.toArray
    }
  }

  /** Insert emulation-prevention bytes: any 00 00 followed by a byte ≤ 03
    * becomes 00 00 03 xx (7.4.1). */
  private[ext] def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i) & 0xff
      if (zeros >= 2 && b <= 3) { out += 3.toByte; zeros = 0 }
      out += rbsp(i)
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toArray
  }

  /** Remove emulation-prevention bytes → (rbsp, nRemoved). Strict: a
    * 00 00 (00|01|02) sequence surviving inside a NAL is a lost start
    * code, not data. */
  private[ext] def unescapeRbsp(nal: Array[Byte]): (Array[Byte], Int) = {
    val out = ArrayBuffer.empty[Byte]
    var removed = 0
    var zeros = 0
    var i = 0
    while (i < nal.length) {
      val b = nal(i) & 0xff
      if (zeros >= 2 && b == 3) {
        removed += 1
        zeros = 0
      } else if (zeros >= 2 && b <= 2) {
        throw new IllegalArgumentException(
          s"unescapeRbsp: unescaped 00 00 0$b inside NAL at byte $i")
      } else {
        out += nal(i)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    (out.toArray, removed)
  }

  /** Parsed SPS subset sufficient for resolution/profile extraction. */
  private[ext] case class SpsInfo(profileIdc: Int, levelIdc: Int,
      width: Int, height: Int)

  /** Parse a seq_parameter_set_rbsp (7.3.2.1), baseline/main profiles. */
  private[ext] def parseSps(rbsp: Array[Byte]): SpsInfo = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"parseSps: $msg")
    val r = new BitReader(rbsp)
    val profile = r.u(8)
    if (profile != 66 && profile != 77)
      fail(s"profile_idc $profile (baseline/main only)")
    r.u(8) // constraint_set flags + reserved_zero bits
    val level = r.u(8)
    r.ue() // seq_parameter_set_id
    r.ue() // log2_max_frame_num_minus4
    val pocType = r.ue()
    if (pocType == 0) r.ue() // log2_max_pic_order_cnt_lsb_minus4
    else if (pocType != 2) fail(s"pic_order_cnt_type $pocType (0/2 only)")
    r.ue() // max_num_ref_frames
    r.u(1) // gaps_in_frame_num_value_allowed_flag
    val mbW = r.ue() + 1
    val mbH = r.ue() + 1
    val frameMbsOnly = r.u(1)
    if (frameMbsOnly != 1) fail("interlaced streams unsupported")
    r.u(1) // direct_8x8_inference_flag
    val crop = r.u(1)
    val (cl, cr, ct, cb) =
      if (crop == 1) (r.ue(), r.ue(), r.ue(), r.ue()) else (0, 0, 0, 0)
    r.u(1) // vui_parameters_present_flag
    // 4:2:0 frame-coded: CropUnitX = CropUnitY = 2 (7.4.2.1.1)
    val w = mbW * 16 - 2 * (cl + cr)
    val h = mbH * 16 - 2 * (ct + cb)
    if (w <= 0 || h <= 0) fail(s"crop consumes the frame (${w}x$h)")
    SpsInfo(profile, level, w, h)
  }

  /** Walk an Annex-B payload → [[H264Meta]]. Strict: a payload not opening
    * with a start code, a set forbidden_zero_bit, an unknown NAL type, a
    * missing or duplicate SPS, or any RBSP/SPS malformation throws. */
  def decodeH264Meta(bytes: Array[Byte]): H264Meta = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"decodeH264Meta: $msg")
    // split on 00 00 01 start codes (a leading 00 00 00 01 is the 4-byte
    // form: the extra 00 is the zero_byte of B.1.2)
    def isStart(p: Int) = p + 3 <= bytes.length && bytes(p) == 0 &&
      bytes(p + 1) == 0 && bytes(p + 2) == 1
    var pos =
      if (isStart(0)) 3
      else if (bytes.length >= 4 && bytes(0) == 0 && isStart(1)) 4
      else fail("payload does not open with an Annex-B start code")
    var sps: Option[SpsInfo] = None
    var nNal = 0
    var nIdr = 0
    var nNonIdr = 0
    var nSei = 0
    var nPps = 0
    var nEpb = 0
    while (pos < bytes.length) {
      var end = pos
      while (end < bytes.length && !isStart(end) &&
        !(end + 1 < bytes.length && bytes(end) == 0 && isStart(end + 1)))
        end += 1
      if (end == pos) fail(s"empty NAL at byte $pos")
      val header = bytes(pos) & 0xff
      if ((header & 0x80) != 0) fail(s"forbidden_zero_bit set at byte $pos")
      val nalType = header & 0x1f
      val (rbsp, removed) =
        unescapeRbsp(java.util.Arrays.copyOfRange(bytes, pos + 1, end))
      nEpb += removed
      nNal += 1
      nalType match {
        case 1 => nNonIdr += 1
        case 5 => nIdr += 1
        case 6 => nSei += 1
        case 7 =>
          if (sps.isDefined) fail("duplicate SPS")
          sps = Some(parseSps(rbsp))
        case 8 => nPps += 1
        case 9 => // access-unit delimiter — censused via nNal only
        case t => fail(s"unsupported NAL type $t at byte $pos")
      }
      pos = end
      if (pos < bytes.length) {
        if (isStart(pos)) pos += 3
        else pos += 4 // zero_byte + start code
      }
    }
    val s = sps.getOrElse(fail("no SPS in stream"))
    H264Meta(s.width, s.height, s.profileIdc, s.levelIdc, nNal, nIdr,
      nIdr + nNonIdr, nSei, nPps, nEpb, bytes.length)
  }

  /** Deterministic H.264 Annex-B payload for doc `d` — a REAL NAL sequence
    * (4-byte start code on the first NAL, 3-byte on the rest; a parser
    * ignoring the zero_byte form breaks) whose SPS fields and GOP shape
    * follow closed-form arithmetic in `d`:
    *
    *   - profile_idc   = 66 + (d % 2)·11  (66 baseline / 77 main)
    *   - level_idc     = 30 + d % 3
    *   - mb grid       = (2 + d % 6) × (2 + d % 4) macroblocks
    *   - even d        : frame cropping right/bottom 1 → −2 px each axis,
    *                     pic_order_cnt_type 0; odd d: no crop, poc type 2
    *   - GOPs          = 2 + d % 3, each 1 IDR + (1 + d % 4) non-IDR
    *   - even d        : one SEI whose payload is (2 + d % 3) zero PAIRS —
    *                     forcing 1 + d % 3 emulation-prevention bytes, so
    *                     the un-escaping path is provably exercised
    *
    * Slice filler bytes are `(d·31 + j·7) % 199 + 32` — never 0x00, so a
    * walker that mis-frames a NAL cannot silently find a fake start code.
    */
  def syntheticH264(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var first = true
    def nal(refIdc: Int, nalType: Int, rbsp: Array[Byte]): Unit = {
      if (first) { out.write(0); first = false }
      out.write(0); out.write(0); out.write(1)
      out.write((refIdc << 5) | nalType)
      val esc = escapeRbsp(rbsp)
      out.write(esc, 0, esc.length)
    }
    // SPS
    val w = new BitWriter
    w.u(8, 66 + (d % 2).toInt * 11)
    w.u(8, 0) // constraint flags
    w.u(8, 30 + (d % 3).toInt)
    w.ue(0) // sps id
    w.ue((d % 5).toInt) // log2_max_frame_num_minus4
    if (d % 2 == 0) { w.ue(0); w.ue((d % 7).toInt) } // poc type 0
    else w.ue(2)
    w.ue(1 + (d % 3).toInt) // max_num_ref_frames
    w.u(1, 0)
    w.ue(1 + (d % 6).toInt) // pic_width_in_mbs_minus1
    w.ue(1 + (d % 4).toInt) // pic_height_in_map_units_minus1
    w.u(1, 1) // frame_mbs_only
    w.u(1, 1) // direct_8x8_inference
    if (d % 2 == 0) { w.u(1, 1); w.ue(0); w.ue(1); w.ue(0); w.ue(1) }
    else w.u(1, 0)
    w.u(1, 0) // no VUI
    nal(3, 7, w.rbspTrailing())
    // PPS (7.3.2.2, minimal entropy/slice-group configuration)
    val p = new BitWriter
    p.ue(0); p.ue(0) // pps id, sps id
    p.u(1, 0); p.u(1, 0) // CAVLC, no pic_order in slice headers
    p.ue(0) // one slice group
    p.ue(0); p.ue(0) // ref idx defaults
    p.u(1, 0); p.u(2, 0) // no weighted pred
    p.se((d % 5).toInt - 2); p.se(0); p.se(0) // init qp/qs, chroma offset
    p.u(1, 0); p.u(1, 0); p.u(1, 0)
    nal(3, 8, p.rbspTrailing())
    // SEI with a zero-run payload → guaranteed emulation-prevention bytes
    if (d % 2 == 0) {
      val zeros = new Array[Byte](2 * (2 + (d % 3).toInt) + 1)
      zeros(zeros.length - 1) = 0x80.toByte
      nal(0, 6, zeros)
    }
    // GOPs of slices (filler payloads — census-grade, not decoded)
    val nGop = (2 + d % 3).toInt
    val nP = (1 + d % 4).toInt
    var g = 0
    var j = 0
    def slice(refIdc: Int, nalType: Int): Unit = {
      val len = 6 + ((d + j) % 5).toInt
      val body = Array.tabulate(len)(k =>
        ((d * 31 + (j + k) * 7) % 199 + 32).toByte)
      nal(refIdc, nalType, body)
      j += len
    }
    while (g < nGop) {
      slice(3, 5)
      var i = 0
      while (i < nP) { slice(2, 1); i += 1 }
      g += 1
    }
    out.toByteArray
  }
}
