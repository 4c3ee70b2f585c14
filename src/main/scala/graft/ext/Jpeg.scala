package graft.ext

/** Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec, written from the
  * public spec like the other from-scratch codecs in [[Multimodal]]
  * (netpbm, BMP, RIFF/WAV, PNG, GIF LZW) — closing the largest
  * remaining "formats the JDK lacks a raw-bytes API for" stub.
  *
  * Decoder scope (strict — everything outside it FAILS LOUDLY, per the
  * codec convention that a corrupt or unsupported payload must surface
  * per-row, not decode into garbage stats):
  *   - baseline sequential DCT (SOF0) AND progressive DCT (SOF2 —
  *     spectral selection, successive approximation, EOB runs, T.81
  *     Annex G; both paths share one coefficient-plane reconstruction,
  *     and JpegSpec pins that the two encodings of one image decode
  *     BIT-identically); 8-bit precision, Huffman coded; every other
  *     frame type is rejected by marker name;
  *   - 1 (grayscale) or 3 (YCbCr) components, sampling factors 1 or 2 in
  *     each axis (covers 4:4:4, 4:2:2, 4:4:0, 4:2:0 — everything common
  *     encoders emit); baseline takes one interleaved scan, progressive
  *     any Annex-G scan script;
  *   - restart markers (DRI/RSTn) with sequence checking; 0xFF00 byte
  *     unstuffing; entropy-segment truncation and mid-scan foreign
  *     markers are errors.
  *
  * Encoder scope (fixture generator, same role as `encodePng` /
  * `Gif.syntheticGif`): baseline 4:4:4 YCbCr (or grayscale), Annex K
  * quantization tables scaled by the public IJG quality rule, Annex K
  * Huffman tables, optional restart interval. The spec suite closes the
  * loop BOTH ways against the JDK's independent ImageIO codec: streams
  * this encoder emits decode identically (±rounding) under ImageIO, and
  * streams ImageIO emits decode under [[decodeJpeg]].
  *
  * JPEG is lossy: unlike the PNG/GIF codecs there is no closed-form SQL
  * oracle over decoded sums, so the registry query is rows-gated and the
  * cross-engine check lives in JpegSpec (the sketch-family precedent).
  */
object Jpeg {

  // -------------------------------------------------------------------
  // shared tables (T.81 Annex K — published example tables)
  // -------------------------------------------------------------------

  /** Zigzag index → natural (row-major) index, T.81 Figure A.6. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quantization table, row-major. */
  private val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table, row-major. */
  private val QChr: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K.3 typical Huffman tables: (BITS per code length 1..16, VALS)
  private val DcLumBits =
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChrBits =
    Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits =
    Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)
  private val AcChrBits =
    Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  /** cos((2x+1)·u·π/16) premultiplied by the normalization C(u)/2 —
    * the separable IDCT/FDCT basis (T.81 A.3.3). */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) math.sqrt(0.5) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16)
  }

  // -------------------------------------------------------------------
  // decoder
  // -------------------------------------------------------------------

  /** Canonical Huffman decode table built from a DHT segment's BITS and
    * VALS (T.81 Annex C code generation / F.2.2.3 DECODE). */
  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    require(bits.length == 17)
    val (minCode, maxCode, valPtr) = {
      val mn = new Array[Int](17)
      val mx = new Array[Int](17)
      val vp = new Array[Int](17)
      var code = 0
      var k = 0
      for (l <- 1 to 16) {
        vp(l) = k
        mn(l) = code
        code += bits(l)
        k += bits(l)
        mx(l) = code - 1       // inclusive; -1 when bits(l) == 0
        if (bits(l) == 0) mx(l) = -1
        code <<= 1
      }
      (mn, mx, vp)
    }
    def decode(br: BitReader): Int = {
      var code = br.readBit()
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return vals(valPtr(l) + code - minCode(l)) & 0xff
        code = (code << 1) | br.readBit()
        l += 1
      }
      throw new IllegalArgumentException(
        "decodeJpeg: invalid Huffman code (corrupt entropy segment)")
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * unstuffing; any other marker inside entropy data is an error (the
    * scan loop consumes RSTn itself, byte-aligned, between intervals). */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def readBit(): Int = {
      if (cnt == 0) {
        if (pos >= bytes.length)
          throw new IllegalArgumentException(
            "decodeJpeg: truncated entropy-coded segment")
        val b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length)
            throw new IllegalArgumentException(
              "decodeJpeg: truncated after 0xFF in entropy segment")
          val m = bytes(pos) & 0xff
          if (m != 0x00)
            throw new IllegalArgumentException(
              f"decodeJpeg: marker FF$m%02X inside entropy-coded segment")
          pos += 1
        }
        buf = b
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def align(): Unit = cnt = 0
  }

  /** T.81 F.2.2.1 EXTEND: map the `t`-bit magnitude field to its signed
    * value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private case class Component(id: Int, h: Int, v: Int, tq: Int)

  /** Parse a JPEG payload — baseline sequential (SOF0) or PROGRESSIVE
    * (SOF2, spectral selection + successive approximation, T.81 Annex G)
    * → (width, height, rgb bytes top-down). Architecture: every scan
    * accumulates RAW quantized-domain coefficients into per-component
    * block planes (baseline = the degenerate single full-band scan);
    * EOI triggers dequantization + IDCT + upsampling + color conversion.
    * See the object doc for the supported envelope; everything else
    * throws `IllegalArgumentException` with the offending marker/field. */
  def decodeJpeg(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"decodeJpeg: $msg")
    def u8(o: Int) = bytes(o) & 0xff
    def u16(o: Int) = (u8(o) << 8) | u8(o + 1)
    if (bytes.length < 4 || u8(0) != 0xff || u8(1) != 0xd8)
      fail("bad signature (no SOI)")

    val qtabs = new Array[Array[Int]](4)          // natural order
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var progressive = false
    var width = 0
    var height = 0
    var hMax = 1
    var vMax = 1
    var mcusX = 0
    var mcusY = 0
    // per component: raw coefficients for the PADDED block grid (the
    // interleaved-MCU grid; non-interleaved scans touch its ceil-grid
    // prefix), plus both grids' dimensions in blocks
    var coefPlanes: Array[Array[Int]] = null
    var bwPad: Array[Int] = null
    var bhPad: Array[Int] = null
    var bwComp: Array[Int] = null
    var bhComp: Array[Int] = null
    var restartInterval = 0
    var scanCount = 0
    var pos = 2

    def segLen(o: Int): Int = {
      if (o + 2 > bytes.length) fail("truncated segment length")
      val l = u16(o)
      if (l < 2 || o + l > bytes.length) fail(s"segment length $l overruns")
      l
    }

    /** One scan's entropy-coded data → the coefficient planes. Returns
      * the stream position after the scan (at the next marker). The
      * successive-approximation paths follow T.81 G.1.2 (the published
      * flowcharts): DC refinement appends one bit per block; AC first
      * scans carry the EOB-run extension; AC refinement interleaves
      * correction bits for nonzero-history coefficients with the
      * placement of new ±1·2^Al coefficients. */
    def decodeOneScan(start: Int, sel: Array[(Int, Int, Int)], ss: Int,
        se: Int, ah: Int, al: Int): Int = {
      val scanCis = sel.map { case (id, _, _) => comps.indexWhere(_.id == id) }
      val interleaved = sel.length > 1
      val br = new BitReader(bytes, start)
      val dcPred = new Array[Int](comps.length)
      var eobrun = 0
      var restartCount = 0
      var unitsSinceRestart = 0

      def checkRestart(): Unit =
        if (restartInterval > 0 && unitsSinceRestart == restartInterval) {
          br.align()
          if (br.pos + 2 > bytes.length) fail("truncated at restart")
          val m = ((bytes(br.pos) & 0xff) << 8) | (bytes(br.pos + 1) & 0xff)
          val want = 0xffd0 + (restartCount & 7)
          if (m != want) fail(f"expected RST${restartCount & 7} got $m%04X")
          br.pos += 2
          restartCount += 1
          unitsSinceRestart = 0
          java.util.Arrays.fill(dcPred, 0)
          eobrun = 0
        }

      def decodeBlock(scanIdx: Int, ci: Int, blockIdx: Int): Unit = {
        val coef = coefPlanes(ci)
        val base = blockIdx * 64
        val (_, dcSel, acSel) = sel(scanIdx)
        if (ss == 0) {                                   // DC band
          if (ah == 0) {
            val huf = dcTabs(dcSel)
            if (huf == null) fail(s"missing DC DHT $dcSel")
            val t = huf.decode(br)
            if (t > 11) fail(s"DC category $t > 11")
            dcPred(ci) += extend(br.receive(t), t)
            coef(base) = dcPred(ci) << al
          } else if (br.readBit() == 1) coef(base) |= (1 << al)
        }
        val kStart = math.max(ss, 1)
        if (se >= kStart) {                              // AC band
          val huf = acTabs(acSel)
          if (huf == null) fail(s"missing AC DHT $acSel")
          if (ah == 0) {
            // AC first scan (baseline's AC section is the al=0 case)
            if (eobrun > 0) eobrun -= 1
            else {
              var k = kStart
              var done = false
              while (!done && k <= se) {
                val rs = huf.decode(br)
                val r = rs >> 4
                val s = rs & 0x0f
                if (s == 0) {
                  if (r == 15) k += 16                   // ZRL
                  else {
                    if (!progressive && r != 0)
                      fail("EOB run in a baseline scan")
                    eobrun = (1 << r) - 1
                    if (r > 0) eobrun += br.receive(r)
                    done = true
                  }
                } else {
                  k += r
                  if (k > se) fail("AC run past band end")
                  coef(base + Zigzag(k)) = extend(br.receive(s), s) << al
                  k += 1
                }
              }
            }
          } else {
            // AC refinement (T.81 G.1.2.3)
            val p1 = 1 << al
            var k = kStart
            if (eobrun == 0) {
              var brk = false
              while (!brk && k <= se) {
                val rs = huf.decode(br)
                var r = rs >> 4
                val s = rs & 0x0f
                var newCoef = 0
                if (s == 0) {
                  if (r != 15) {
                    eobrun = 1 << r
                    if (r > 0) eobrun += br.receive(r)
                    brk = true
                  } // r == 15: pass 16 zero-history coefficients below
                } else {
                  if (s != 1) fail("AC refinement size must be 1")
                  newCoef = if (br.readBit() == 1) p1 else -p1
                }
                if (!brk) {
                  var placed = false
                  while (!placed && k <= se) {
                    val z = base + Zigzag(k)
                    if (coef(z) != 0) {
                      if (br.readBit() == 1 && (coef(z) & p1) == 0)
                        coef(z) += (if (coef(z) >= 0) p1 else -p1)
                    } else if (r == 0) {
                      if (s != 0) coef(z) = newCoef
                      placed = true
                    } else r -= 1
                    k += 1
                  }
                  if (!placed && s != 0)
                    fail("AC refinement coefficient past band end")
                }
              }
            }
            if (eobrun > 0) {
              // the EOB-run tail still carries correction bits for every
              // nonzero-history coefficient left in the band
              while (k <= se) {
                val z = base + Zigzag(k)
                if (coef(z) != 0 && br.readBit() == 1 && (coef(z) & p1) == 0)
                  coef(z) += (if (coef(z) >= 0) p1 else -p1)
                k += 1
              }
              eobrun -= 1
            }
          }
        }
      }

      if (interleaved) {
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            checkRestart()
            var si = 0
            while (si < scanCis.length) {
              val ci = scanCis(si)
              val c = comps(ci)
              var by = 0
              while (by < c.v) {
                var bx = 0
                while (bx < c.h) {
                  decodeBlock(si, ci,
                    (my * c.v + by) * bwPad(ci) + mx * c.h + bx)
                  bx += 1
                }
                by += 1
              }
              si += 1
            }
            unitsSinceRestart += 1
            mx += 1
          }
          my += 1
        }
      } else {
        // single-component scan: the component's own ceil grid (T.81
        // A.2.2 — NOT padded to MCU multiples)
        val ci = scanCis(0)
        var byy = 0
        while (byy < bhComp(ci)) {
          var bxx = 0
          while (bxx < bwComp(ci)) {
            checkRestart()
            decodeBlock(0, ci, byy * bwPad(ci) + bxx)
            unitsSinceRestart += 1
            bxx += 1
          }
          byy += 1
        }
      }
      br.align()
      br.pos
    }

    /** Dequantize + IDCT every padded block, then upsample (sample
      * replication) + color-convert. */
    def reconstruct(): (Int, Int, Array[Byte]) = {
      val planeW = comps.map(c => mcusX * c.h * 8)
      val planes = comps.indices.map(i =>
        new Array[Byte](planeW(i) * mcusY * comps(i).v * 8)).toArray
      val block = new Array[Int](64)
      val tmp = new Array[Double](64)
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qtabs(c.tq)
        if (q == null) fail(s"missing DQT ${c.tq}")
        val coef = coefPlanes(ci)
        val pw = planeW(ci)
        var byy = 0
        while (byy < bhPad(ci)) {
          var bxx = 0
          while (bxx < bwPad(ci)) {
            val base = (byy * bwPad(ci) + bxx) * 64
            var i = 0
            while (i < 64) { block(i) = coef(base + i) * q(i); i += 1 }
            var y0 = 0
            while (y0 < 8) {                  // rows: tmp = block · CosT
              var x0 = 0
              while (x0 < 8) {
                var s2 = 0.0
                var u = 0
                while (u < 8) { s2 += Cos(x0)(u) * block(y0 * 8 + u); u += 1 }
                tmp(y0 * 8 + x0) = s2
                x0 += 1
              }
              y0 += 1
            }
            val px0 = bxx * 8
            val py0 = byy * 8
            var x1 = 0
            while (x1 < 8) {                  // cols
              var y1 = 0
              while (y1 < 8) {
                var s2 = 0.0
                var v = 0
                while (v < 8) { s2 += Cos(y1)(v) * tmp(v * 8 + x1); v += 1 }
                val p = math.max(0, math.min(255,
                  math.round(s2 + 128.0).toInt))
                planes(ci)((py0 + y1) * pw + px0 + x1) = p.toByte
                y1 += 1
              }
              x1 += 1
            }
            bxx += 1
          }
          byy += 1
        }
        ci += 1
      }

      val rgb = new Array[Byte](width * height * 3)
      if (comps.length == 1) {
        val pw = planeW(0)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val g = planes(0)(y * pw + x)
            val o = (y * width + x) * 3
            rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            def samp(i: Int): Int = {
              val c = comps(i)
              planes(i)((y * c.v / vMax) * planeW(i) + x * c.h / hMax) & 0xff
            }
            val yy = samp(0).toDouble
            val cb = samp(1) - 128.0
            val cr = samp(2) - 128.0
            def cl(d: Double): Byte =
              math.max(0, math.min(255, math.round(d).toInt)).toByte
            val o = (y * width + x) * 3
            rgb(o) = cl(yy + 1.402 * cr)
            rgb(o + 1) = cl(yy - 0.344136 * cb - 0.714136 * cr)
            rgb(o + 2) = cl(yy + 1.772 * cb)
            x += 1
          }
          y += 1
        }
      }
      (width, height, rgb)
    }

    while (true) {
      if (pos + 2 > bytes.length) fail("truncated marker")
      if (u8(pos) != 0xff) fail(f"expected marker, got 0x${u8(pos)}%02X")
      val m = u8(pos + 1)
      pos += 2
      m match {
        case 0xd8 => fail("unexpected second SOI")
        case 0xd9 =>                                           // EOI
          if (scanCount == 0) fail("EOI before any scan (no image data)")
          if (pos != bytes.length) fail("trailing bytes after EOI")
          return reconstruct()
        case x if x >= 0xe0 && x <= 0xef => pos += segLen(pos) // APPn
        case 0xfe => pos += segLen(pos)                        // COM
        case 0xdb =>                                           // DQT
          val end = pos + segLen(pos)
          var o = pos + 2
          while (o < end) {
            val pq = u8(o) >> 4
            val tq = u8(o) & 0x0f
            if (pq != 0) fail("16-bit DQT precision (not baseline)")
            if (tq > 3) fail(s"DQT table id $tq")
            if (o + 65 > end) fail("DQT entries overrun segment")
            val t = new Array[Int](64)
            for (i <- 0 until 64) t(Zigzag(i)) = u8(o + 1 + i)
            qtabs(tq) = t
            o += 65
          }
          pos = end
        case 0xc4 =>                                           // DHT
          val end = pos + segLen(pos)
          var o = pos + 2
          while (o < end) {
            val tc = u8(o) >> 4
            val th = u8(o) & 0x0f
            if (tc > 1 || th > 3) fail(s"DHT class/id $tc/$th")
            val bits = new Array[Int](17)
            var n = 0
            for (l <- 1 to 16) { bits(l) = u8(o + l); n += bits(l) }
            if (o + 17 + n > end) fail("DHT values overrun segment")
            val vals = java.util.Arrays.copyOfRange(bytes, o + 17, o + 17 + n)
            val h = new Huff(bits, vals)
            if (tc == 0) dcTabs(th) = h else acTabs(th) = h
            o += 17 + n
          }
          pos = end
        case x if x == 0xc0 || x == 0xc2 =>                    // SOF0/SOF2
          val end = pos + segLen(pos)
          if (comps != null) fail("second frame header")
          progressive = x == 0xc2
          if (u8(pos + 2) != 8) fail(s"precision ${u8(pos + 2)} (want 8)")
          height = u16(pos + 3)
          width = u16(pos + 5)
          if (width == 0 || height == 0) fail("zero dimension (DNL unsupported)")
          val nc = u8(pos + 7)
          if (nc != 1 && nc != 3) fail(s"$nc components (want 1 or 3)")
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + i * 3
            val c = Component(u8(o), u8(o + 1) >> 4, u8(o + 1) & 0x0f,
              u8(o + 2))
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2)
              fail(s"sampling ${c.h}x${c.v} outside 1..2")
            if (c.tq > 3) fail(s"quant table id ${c.tq}")
            c
          }
          hMax = comps.map(_.h).max
          vMax = comps.map(_.v).max
          mcusX = (width + 8 * hMax - 1) / (8 * hMax)
          mcusY = (height + 8 * vMax - 1) / (8 * vMax)
          bwPad = comps.map(c => mcusX * c.h)
          bhPad = comps.map(c => mcusY * c.v)
          bwComp = comps.map(c => ((width * c.h + hMax - 1) / hMax + 7) / 8)
          bhComp = comps.map(c => ((height * c.v + vMax - 1) / vMax + 7) / 8)
          coefPlanes = comps.indices
            .map(i => new Array[Int](bwPad(i) * bhPad(i) * 64)).toArray
          pos = end
        case x if Set(0xc1, 0xc3, 0xc5, 0xc6, 0xc7, 0xc9, 0xca,
            0xcb, 0xcd, 0xce, 0xcf).contains(x) =>
          fail(f"frame type FF$x%02X unsupported (SOF0/SOF2 only)")
        case 0xdd =>                                           // DRI
          val end = pos + segLen(pos)
          restartInterval = u16(pos + 2)
          pos = end
        case 0xda =>                                           // SOS
          if (comps == null) fail("SOS before SOF")
          val end = pos + segLen(pos)
          val ns = u8(pos + 2)
          if (ns < 1 || ns > comps.length) fail(s"scan has $ns components")
          if (end != pos + 2 + 1 + 2 * ns + 3) fail("SOS length mismatch")
          val sel = Array.tabulate(ns) { i =>
            val o = pos + 3 + i * 2
            (u8(o), u8(o + 1) >> 4, u8(o + 1) & 0x0f) // (id, dcTab, acTab)
          }
          for ((id, _, _) <- sel)
            if (!comps.exists(_.id == id)) fail(s"scan component id $id")
          if (sel.map(_._1).distinct.length != ns)
            fail("duplicate component id in scan header")
          val ssB = u8(end - 3)
          val seB = u8(end - 2)
          val ahB = u8(end - 1) >> 4
          val alB = u8(end - 1) & 0x0f
          if (!progressive) {
            if (ns != comps.length)
              fail(s"scan has $ns components, frame has ${comps.length} " +
                "(non-interleaved multi-scan unsupported in baseline)")
            if (ssB != 0 || seB != 63 || ahB != 0 || alB != 0)
              fail("spectral selection/approx not 0/63/0 (not baseline)")
            if (scanCount > 0) fail("second scan in a baseline stream")
          } else {
            if (ssB == 0 && seB != 0)
              fail("progressive DC scan must have Se = 0")
            if (ssB > 0 && ns != 1)
              fail("progressive AC scan must be single-component")
            if (ssB > 63 || seB > 63 || seB < ssB)
              fail(s"bad spectral range $ssB..$seB")
            if (ahB > 13 || alB > 13) fail("bad successive approximation")
            if (ahB != 0 && ahB != alB + 1)
              fail(s"successive approximation Ah=$ahB with Al=$alB " +
                "(refinement must lower one bit at a time)")
          }
          pos = decodeOneScan(end, sel, ssB, seB, ahB, alB)
          scanCount += 1
        case x if x >= 0xd0 && x <= 0xd7 => fail(f"RST$x%02X outside scan")
        case 0x01 => ()                                        // TEM
        case x => fail(f"marker FF$x%02X unsupported")
      }
    }
    fail("unreachable")
  }

  // -------------------------------------------------------------------
  // encoder (baseline 4:4:4, Annex K tables, IJG quality scaling)
  // -------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0x00)       // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) write(0x7f, 8 - cnt) // pad with 1s
  }

  /** (code, length) per symbol from canonical BITS/VALS. */
  private def encodeTable(bits: Array[Int], vals: Array[Byte])
      : Array[(Int, Int)] = {
    val t = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l)) {
        t(vals(k) & 0xff) = (code, l)
        code += 1
        k += 1
      }
      code <<= 1
    }
    t
  }

  /** IJG quality → table scaling: q in [1,100]. */
  private def scaleQ(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality $quality")
    val s = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(v => math.max(1, math.min(255, (v * s + 50) / 100)))
  }

  private def magnitude(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { n += 1; a >>= 1 }
    n
  }

  /** Quantized coefficient planes (per component, ceil-grid blocks
    * row-major, 64 natural-order coefficients each) for a 4:4:4 YCbCr
    * encode — the shared front half of both entropy organizations
    * (baseline writes DC+AC per block; progressive deals them into
    * separate scans from the same planes). Edge blocks replicate the
    * last row/column. */
  private def quantPlanes(w: Int, h: Int, rgb: Array[Byte],
      qLum: Array[Int], qChr: Array[Int]): Array[Array[Int]] = {
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val planes = Array.fill(3)(new Array[Int](bw * bh * 64))
    val samp = new Array[Double](64)
    val tmp = new Array[Double](64)
    var my = 0
    while (my < bh) {
      var mx = 0
      while (mx < bw) {
        var ci = 0
        while (ci < 3) {
          val q = if (ci == 0) qLum else qChr
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              val sx = math.min(w - 1, mx * 8 + xx)
              val sy = math.min(h - 1, my * 8 + yy)
              val o = (sy * w + sx) * 3
              val r = rgb(o) & 0xff
              val g = rgb(o + 1) & 0xff
              val b = rgb(o + 2) & 0xff
              samp(yy * 8 + xx) = (ci match {
                case 0 => 0.299 * r + 0.587 * g + 0.114 * b
                case 1 => -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
                case 2 => 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
              }) - 128.0
              xx += 1
            }
            yy += 1
          }
          // FDCT (separable; Cos is orthonormal so transpose inverts)
          var u = 0
          while (u < 8) {
            var y0 = 0
            while (y0 < 8) {
              var s2 = 0.0
              var x0 = 0
              while (x0 < 8) { s2 += Cos(x0)(u) * samp(y0 * 8 + x0); x0 += 1 }
              tmp(y0 * 8 + u) = s2
              y0 += 1
            }
            u += 1
          }
          val base = (my * bw + mx) * 64
          var v = 0
          while (v < 8) {
            var u2 = 0
            while (u2 < 8) {
              var s2 = 0.0
              var y0 = 0
              while (y0 < 8) { s2 += Cos(y0)(v) * tmp(y0 * 8 + u2); y0 += 1 }
              planes(ci)(base + v * 8 + u2) =
                math.round(s2 / q(v * 8 + u2)).toInt
              u2 += 1
            }
            v += 1
          }
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    planes
  }

  private def writeCoefBits(bw: BitWriter, v: Int, s: Int): Unit =
    bw.write(if (v < 0) v + (1 << s) - 1 else v, s)

  /** DC diff for one block (shared by the baseline block writer and the
    * progressive DC scan). */
  private def writeDc(bw: BitWriter, dcT: Array[(Int, Int)],
      diff: Int): Unit = {
    val s0 = magnitude(diff)
    if (s0 > 11)
      throw new IllegalArgumentException(
        s"encodeJpeg: DC category $s0 > 11 (quantizer too fine)")
    val (c0, l0) = dcT(s0)
    bw.write(c0, l0)
    writeCoefBits(bw, diff, s0)
  }

  /** The 63-coefficient AC band of one block, run/size coded with a
    * per-block EOB — in a baseline scan that EOB is THE block
    * terminator; in a progressive Ss=1..63 scan the same symbol reads as
    * EOBRUN = 1, so one writer serves both organizations. */
  private def writeAcBand(bw: BitWriter, acT: Array[(Int, Int)],
      coef: Array[Int], base: Int): Unit = {
    var run = 0
    var k = 1
    while (k < 64) {
      val qc = coef(base + Zigzag(k))
      if (qc == 0) run += 1
      else {
        while (run > 15) {
          val (cz, lz) = acT(0xf0); bw.write(cz, lz); run -= 16
        }
        val s = magnitude(qc)
        if (s > 10)
          throw new IllegalArgumentException(
            s"encodeJpeg: AC size $s > 10 (quantizer too fine)")
        val (c1, l1) = acT((run << 4) | s)
        bw.write(c1, l1)
        writeCoefBits(bw, qc, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ce, le) = acT(0x00); bw.write(ce, le) } // EOB
  }

  /** Shared header prefix: SOI, JFIF APP0, both DQTs, SOF (the caller
    * picks baseline 0xC0 or progressive 0xC2), all four DHTs. */
  private def writeHeaders(out: java.io.ByteArrayOutputStream, w: Int,
      h: Int, qLum: Array[Int], qChr: Array[Int], sofMarker: Int): Unit = {
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8)                                  // SOI
    marker(0xe0); u16(16)                         // APP0 JFIF
    Seq('J', 'F', 'I', 'F', 0).foreach(c => u8(c.toInt))
    u16(0x0101); u8(0); u16(1); u16(1); u8(0); u8(0)
    for ((tq, t) <- Seq((0, qLum), (1, qChr))) {  // DQT
      marker(0xdb); u16(67); u8(tq)
      for (i <- 0 until 64) u8(t(Zigzag(i)))
    }
    marker(sofMarker); u16(8 + 3 * 3); u8(8)      // SOF0 / SOF2
    u16(h); u16(w); u8(3)
    for ((id, tq) <- Seq((1, 0), (2, 1), (3, 1))) {
      u8(id); u8(0x11); u8(tq)                    // 1x1 sampling (4:4:4)
    }
    for ((tc, th, bits, vals) <- Seq(
        (0, 0, DcLumBits, DcLumVals), (1, 0, AcLumBits, AcLumVals),
        (0, 1, DcChrBits, DcChrVals), (1, 1, AcChrBits, AcChrVals))) {
      marker(0xc4); u16(2 + 17 + vals.length)     // DHT
      u8((tc << 4) | th)
      for (l <- 1 to 16) u8(bits(l))
      vals.foreach(v => u8(v.toInt))
    }
  }

  /** Encode `rgb` (top-down, interleaved) as a baseline 4:4:4 YCbCr JPEG.
    * `restartInterval` > 0 emits DRI + RSTn markers (the decoder-side
    * restart machinery's fixture hook). */
  def encodeJpeg(w: Int, h: Int, rgb: Array[Byte], quality: Int = 90,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"encodeJpeg: bad dims ${w}x$h for ${rgb.length} bytes")
    val qLum = scaleQ(QLum, quality)
    val qChr = scaleQ(QChr, quality)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    writeHeaders(out, w, h, qLum, qChr, sofMarker = 0xc0)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xda); u16(6 + 2 * 3); u8(3)           // SOS
    for ((id, td, ta) <- Seq((1, 0, 0), (2, 1, 1), (3, 1, 1))) {
      u8(id); u8((td << 4) | ta)
    }
    u8(0); u8(63); u8(0)

    val planes = quantPlanes(w, h, rgb, qLum, qChr)
    val dcLum = encodeTable(DcLumBits, DcLumVals)
    val acLum = encodeTable(AcLumBits, AcLumVals)
    val dcChr = encodeTable(DcChrBits, DcChrVals)
    val acChr = encodeTable(AcChrBits, AcChrVals)
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](3)
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    var restartCount = 0
    var sinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          bw.flush()
          marker(0xd0 + (restartCount & 7))
          restartCount += 1
          sinceRestart = 0
          java.util.Arrays.fill(dcPred, 0)
        }
        val base = (my * mcusX + mx) * 64
        var ci = 0
        while (ci < 3) {
          val (dcT, acT) = if (ci == 0) (dcLum, acLum) else (dcChr, acChr)
          val dc = planes(ci)(base)
          writeDc(bw, dcT, dc - dcPred(ci))
          dcPred(ci) = dc
          writeAcBand(bw, acT, planes(ci), base)
          ci += 1
        }
        sinceRestart += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9)                                  // EOI
    out.toByteArray
  }

  /** Encode `rgb` as a PROGRESSIVE (SOF2) 4:4:4 YCbCr JPEG using a
    * spectral-selection scan script — scan 1 delivers every block's DC
    * (interleaved), scans 2–4 each deliver one component's full AC band.
    * No successive approximation (Ah=Al=0 throughout), so the coefficient
    * content is IDENTICAL to [[encodeJpeg]]'s at the same quality — the
    * two encodings of one image must decode bit-identically (spec-pinned,
    * both under this decoder and the JDK's). */
  def encodeJpegProgressive(w: Int, h: Int, rgb: Array[Byte],
      quality: Int = 90): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"encodeJpegProgressive: bad dims ${w}x$h for ${rgb.length} bytes")
    val qLum = scaleQ(QLum, quality)
    val qChr = scaleQ(QChr, quality)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    writeHeaders(out, w, h, qLum, qChr, sofMarker = 0xc2)

    val planes = quantPlanes(w, h, rgb, qLum, qChr)
    val dcLum = encodeTable(DcLumBits, DcLumVals)
    val acLum = encodeTable(AcLumBits, AcLumVals)
    val dcChr = encodeTable(DcChrBits, DcChrVals)
    val acChr = encodeTable(AcChrBits, AcChrVals)
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8

    // scan 1: interleaved DC, Ss=0 Se=0 Ah=0 Al=0
    marker(0xda); u16(6 + 2 * 3); u8(3)
    for ((id, td) <- Seq((1, 0), (2, 1), (3, 1))) {
      u8(id); u8(td << 4)
    }
    u8(0); u8(0); u8(0)
    val bwDc = new BitWriter(out)
    val dcPred = new Array[Int](3)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        val base = (my * mcusX + mx) * 64
        var ci = 0
        while (ci < 3) {
          val dc = planes(ci)(base)
          writeDc(bwDc, if (ci == 0) dcLum else dcChr, dc - dcPred(ci))
          dcPred(ci) = dc
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    bwDc.flush()

    // scans 2-4: one component's AC band each, Ss=1 Se=63 Ah=0 Al=0
    for ((ci, id) <- Seq((0, 1), (1, 2), (2, 3))) {
      marker(0xda); u16(6 + 2); u8(1)
      u8(id); u8(if (ci == 0) 0 else 1)           // ac table id (low nibble)
      u8(1); u8(63); u8(0)
      val bwAc = new BitWriter(out)
      val acT = if (ci == 0) acLum else acChr
      var b = 0
      val nBlocks = mcusX * mcusY
      while (b < nBlocks) {
        writeAcBand(bwAc, acT, planes(ci), b * 64)
        b += 1
      }
      bwAc.flush()
    }
    marker(0xd9)                                  // EOI
    out.toByteArray
  }

  /** Deterministic fixture: a smooth two-gradient-plus-plateau image
    * (JPEG compresses smooth content with small error, keeping the
    * round-trip tolerance tight), dims and phase derived from `d` like
    * the other synthetic payloads. Every 3rd fixture carries restart
    * markers and every 5th-phase-1 fixture is PROGRESSIVE, so both the
    * RSTn path and the SOF2 multi-scan path are exercised inside any
    * corpus-sized batch (q165/q146). */
  def syntheticJpeg(d: Long): Array[Byte] = {
    val (w, h, rgb) = syntheticJpegRgb(d)
    if (d % 5 == 1) encodeJpegProgressive(w, h, rgb, quality = 90)
    else encodeJpeg(w, h, rgb, quality = 90,
      restartInterval = if (d % 3 == 0) 2 else 0)
  }

  /** The pre-compression raster behind [[syntheticJpeg]] — exposed so the
    * round-trip spec can measure reconstruction error against it. */
  def syntheticJpegRgb(d: Long): (Int, Int, Array[Byte]) = {
    val w = (10 + d % 23).toInt
    val h = (10 + d % 17).toInt
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = (40 + (x * 160 / w) + (d % 31)).toByte
      rgb(o + 1) = (40 + (y * 160 / h) + (d % 17)).toByte
      rgb(o + 2) = (90 + ((x + y) * 60 / (w + h))).toByte
    }
    (w, h, rgb)
  }

  /** REAL decoder factory over [[decodeJpeg]] — same per-partition
    * factory contract as the other codecs. */
  val jpegDecoder: Multimodal.DecoderFactory = () => { bytes =>
    val (w, h, _) = decodeJpeg(bytes)
    (w, h, 1)
  }
}
