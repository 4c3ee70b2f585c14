package graft.ext

/** GIF (87a single-image profile) — the SECOND compressed format decoded
  * with zero libraries, and unlike PNG (whose DEFLATE the JDK ships) the
  * entropy coder here is implemented from scratch: variable-width LSB-first
  * LZW per the public GIF specification (CompuServe 1987/1989), including
  * dictionary growth, code-width bumps at powers of two, the 4096-entry
  * clear/reset, and the KwKwK self-referential case. The encoder is a REAL
  * dictionary-building LZW compressor (not a no-compression escape), so
  * round-trips drive every decoder path.
  *
  * Profile kept strict and small on purpose: one image, global color table
  * required, no interlace, no local color table — anything else throws
  * loudly rather than misreads (the same contract as the other codecs in
  * [[Multimodal]]).
  */
object Gif {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"decodeGif: $msg")

  /** Parse a GIF payload → (width, height, rgb bytes top-down): palette
    * indices LZW-decoded then mapped through the global color table.
    * Strict: bad magic, missing global color table, interlaced images,
    * local color tables, truncated sub-blocks, LZW codes out of range,
    * or a decoded pixel count ≠ w·h all throw. Extensions (0x21) are
    * skipped by their sub-block framing; exactly one image block is
    * required before the trailer. */
  def decodeGif(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    def u8(o: Int): Int = bytes(o) & 0xff
    def u16(o: Int): Int = u8(o) | (u8(o + 1) << 8)
    if (bytes.length < 13) fail(s"short header: ${bytes.length} bytes")
    val magic = new String(bytes, 0, 6,
      java.nio.charset.StandardCharsets.US_ASCII)
    if (magic != "GIF87a" && magic != "GIF89a") fail(s"bad magic '$magic'")
    val packed = u8(10)
    if ((packed & 0x80) == 0) fail("no global color table")
    val gctSize = 2 << (packed & 0x07) // 2^(n+1) entries
    var pos = 13
    if (pos + 3 * gctSize > bytes.length) fail("truncated color table")
    val gctOff = pos
    pos += 3 * gctSize
    var result: Array[Byte] = null
    var w = -1
    var h = -1
    var done = false
    while (!done) {
      if (pos >= bytes.length) fail("missing trailer")
      u8(pos) match {
        case 0x3b => // trailer
          if (result == null) fail("no image block before trailer")
          done = true
        case 0x21 => // extension: label + sub-blocks until a 0 terminator
          pos += 2
          while ({
            if (pos >= bytes.length) fail("truncated extension")
            val n = u8(pos); pos += 1 + n; n != 0
          }) ()
        case 0x2c => // image descriptor
          if (result != null) fail("multiple image blocks (profile is 1)")
          if (pos + 10 > bytes.length) fail("truncated image descriptor")
          if (u16(pos + 1) != 0 || u16(pos + 3) != 0)
            fail("nonzero image offset (profile is full-frame)")
          w = u16(pos + 5); h = u16(pos + 7)
          if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
          val ipacked = u8(pos + 9)
          if ((ipacked & 0x80) != 0) fail("local color table unsupported")
          if ((ipacked & 0x40) != 0) fail("interlaced images unsupported")
          pos += 10
          if (pos >= bytes.length) fail("missing LZW minimum code size")
          val mcs = u8(pos)
          if (mcs < 2 || mcs > 8) fail(s"LZW minimum code size $mcs")
          pos += 1
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while ({
            if (pos >= bytes.length) fail("truncated image data")
            val n = u8(pos)
            if (n > 0) {
              if (pos + 1 + n > bytes.length) fail("truncated sub-block")
              data.write(bytes, pos + 1, n)
            }
            pos += 1 + n
            n != 0
          }) ()
          val indices = lzwDecode(data.toByteArray, mcs, w * h)
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < indices.length) {
            val idx = indices(i) & 0xff
            if (idx >= gctSize) fail(s"pixel index $idx >= palette $gctSize")
            rgb(3 * i) = bytes(gctOff + 3 * idx)
            rgb(3 * i + 1) = bytes(gctOff + 3 * idx + 1)
            rgb(3 * i + 2) = bytes(gctOff + 3 * idx + 2)
            i += 1
          }
          result = rgb
        case other => fail(f"unknown block type 0x$other%02x")
      }
    }
    (w, h, result)
  }

  /** Variable-width LSB-first LZW decode of a GIF code stream to exactly
    * `expected` palette indices. Handles the spec's full machinery: clear
    * resets, early EOI, width bumps when the dictionary reaches 2^width,
    * the 12-bit cap, and the KwKwK case (a code referencing the entry
    * being defined). */
  private def lzwDecode(data: Array[Byte], mcs: Int,
      expected: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outPos = 0
    // dictionary as prefix links: suffix byte + prefix code per entry
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val entryLen = new Array[Int](4096)
    var dictSize = 0
    var width = 0
    def reset(): Unit = {
      dictSize = eoi + 1
      width = mcs + 1
      var i = 0
      while (i < clear) {
        prefix(i) = -1; suffix(i) = i.toByte; entryLen(i) = 1
        i += 1
      }
    }
    reset()
    var bitPos = 0
    def nextCode(): Int = {
      if (bitPos + width > data.length * 8)
        fail("LZW stream ended before EOI")
      var v = 0
      var got = 0
      while (got < width) {
        val b = (data(bitPos >> 3) >> (bitPos & 7)) & 1
        v |= b << got
        got += 1
        bitPos += 1
      }
      v
    }
    def emit(code: Int): Unit = {
      val n = entryLen(code)
      if (outPos + n > expected)
        fail(s"LZW decodes past the $expected-pixel raster")
      var c = code
      var i = outPos + n - 1
      while (c != -1) { out(i) = suffix(c); i -= 1; c = prefix(c) }
      outPos += n
    }
    var prev = -1
    var finished = false
    while (!finished) {
      val code = nextCode()
      if (code == clear) { reset(); prev = -1 }
      else if (code == eoi) finished = true
      else {
        if (code >= 4096 || code > dictSize ||
            (code == dictSize && prev == -1))
          fail(s"LZW code $code out of range (dict $dictSize)")
        if (prev == -1) emit(code)
        else {
          val firstOf = // first byte of this code's expansion
            if (code == dictSize) { // KwKwK: entry being defined
              var c = prev; while (prefix(c) != -1) c = prefix(c); suffix(c)
            } else {
              var c = code; while (prefix(c) != -1) c = prefix(c); suffix(c)
            }
          if (dictSize < 4096) {
            prefix(dictSize) = prev
            suffix(dictSize) = firstOf
            entryLen(dictSize) = entryLen(prev) + 1
            dictSize += 1
            if (dictSize == (1 << width) && width < 12) width += 1
          }
          emit(code)
        }
        prev = code
      }
    }
    if (outPos != expected)
      fail(s"LZW decoded $outPos pixels, expected $expected")
    out
  }

  /** REAL LZW compress of palette indices — dictionary-building (emits
    * multi-byte phrase codes, bumps widths, clears at 4096), so a
    * round-trip exercises every decoder path including growth and reset.
    * Returns the raw code stream (caller wraps in sub-blocks). */
  private def lzwEncode(indices: Array[Byte], mcs: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0
    var curBits = 0
    var width = mcs + 1
    def put(code: Int): Unit = {
      cur |= code << curBits
      curBits += width
      while (curBits >= 8) {
        out.write(cur & 0xff); cur >>= 8; curBits -= 8
      }
    }
    val dict = new java.util.HashMap[Long, Integer]()
    var dictSize = eoi + 1
    def key(prefixCode: Int, b: Int): Long = (prefixCode.toLong << 8) | b
    put(clear)
    var w = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val c = indices(i) & 0xff
      val k = key(w, c)
      val hit = dict.get(k)
      if (hit != null) w = hit.intValue()
      else {
        put(w)
        if (dictSize < 4096) {
          // the decoder adds entries ONE CODE BEHIND the encoder, so its
          // width bump lands one emit later — sync by checking the size
          // BEFORE this add (encoder bump between e_n and e_n+1 exactly
          // when the decoder's bump lands there; off-by-one here garbles
          // every code after the first 2^(mcs+1) dictionary entries)
          if (dictSize == (1 << width) && width < 12) width += 1
          dict.put(k, dictSize)
          dictSize += 1
        } else {
          put(clear)
          dict.clear()
          dictSize = eoi + 1
          width = mcs + 1
        }
        w = c
      }
      i += 1
    }
    put(w)
    put(eoi)
    if (curBits > 0) out.write(cur & 0xff)
    out.toByteArray
  }

  /** Encode palette indices + a 256-entry RGB palette as a GIF87a byte
    * stream — the sink-side inverse of [[decodeGif]]; round-trip is
    * index- and palette-exact. */
  def encodeGif(w: Int, h: Int, indices: Array[Byte],
      palette: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && w < 65536 && h < 65536,
      s"encodeGif: bad dimensions ${w}x$h")
    require(indices.length == w * h,
      s"encodeGif: ${indices.length} indices != ${w * h}")
    require(palette.length == 768,
      s"encodeGif: palette ${palette.length} bytes != 768 (256 RGB)")
    val out = new java.io.ByteArrayOutputStream()
    def p16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    p16(w); p16(h)
    out.write(0x80 | 0x07) // GCT present, 256 entries
    out.write(0); out.write(0)
    out.write(palette)
    out.write(0x2c); p16(0); p16(0); p16(w); p16(h); out.write(0)
    val mcs = 8
    out.write(mcs)
    val code = lzwEncode(indices, mcs)
    var off = 0
    while (off < code.length) {
      val n = math.min(255, code.length - off)
      out.write(n)
      out.write(code, off, n)
      off += n
    }
    out.write(0)    // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Deterministic GIF payload for doc `d` — indices follow
    * `(d*43 + i) % 256` and the palette maps index v to
    * ((v·3)%256, (v·5)%256, (v·7)%256), all closed-form, so a SQL oracle
    * predicts the decoded channel sums with no decoder — through the
    * from-scratch LZW round-trip. */
  def syntheticGif(d: Long): Array[Byte] = {
    val w = (3 + d % 5).toInt
    val h = (4 + d % 4).toInt
    val indices = Array.tabulate(w * h)(i => ((d * 43 + i) % 256).toByte)
    val palette = new Array[Byte](768)
    var v = 0
    while (v < 256) {
      palette(3 * v) = ((v * 3) % 256).toByte
      palette(3 * v + 1) = ((v * 5) % 256).toByte
      palette(3 * v + 2) = ((v * 7) % 256).toByte
      v += 1
    }
    encodeGif(w, h, indices, palette)
  }
}
