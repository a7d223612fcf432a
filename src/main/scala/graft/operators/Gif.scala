package graft.operators

/** REAL GIF87a/89a codec in pure JVM — the last image tier a web
  * crawl commonly carries that needs no native codec: LZW is integer
  * dictionary coding, so both halves live here. The construct half
  * writes a spec-conformant GIF89a (logical screen descriptor, global
  * color table, comment + graphic-control extension blocks so the
  * skip path runs on every payload, optional interlace, LZW-packed
  * sub-blocks); the decode half walks the container back — extension
  * skipping, local-or-global palette, variable-width LSB-first LZW
  * with clear-code resets and the KwKwK case, four-pass de-interlace.
  *
  * Conformance is pinned BOTH directions against the JDK's own
  * ImageIO GIF plugin in GifSpec: ImageIO decodes our encoder's
  * output pixel-exactly, and our decoder reads ImageIO-written GIFs —
  * so encoder and decoder cannot share a compensating bug.
  *
  * Same discipline as the other codecs (see [[Multimodal]]): the
  * decoder is LENIENT — structural damage yields None, never an
  * exception (fuzz-hardened in GifSpec); at corpus scale malformed
  * media is data.
  */
object Gif {

  private val MaxCodes = 4096 // 12-bit LZW ceiling, per spec

  // ---- construct -----------------------------------------------------

  /** Synthetic palette-indexed GIF for image `id`: pixel p carries
    * palette index (id + p) mod 256 and palette entry k is channel-wise
    * (id + 3k + c) mod 256, so decoded RGB has the closed form
    * (id + 3·((id + p) mod 256) + c) mod 256 that the SQL oracle
    * replays. Odd ids are INTERLACED — a decoder that skips the
    * four-pass row reorder fails the position-weighted sums. Interlace
    * requires h ≥ 5 (see [[encodeGif]]'s interop note); callers pass
    * dims that satisfy it.
    */
  def gifPayloadBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val indices = Array.tabulate(w * h)(p => (((id + p) % 256 + 256) % 256).toInt)
    val palette = Array.tabulate(256 * 3) { i =>
      (((id + 3L * (i / 3) + (i % 3)) % 256 + 256) % 256).toInt
    }
    encodeGif(w, h, indices, palette, interlaced = id % 2 != 0 && h >= 5)
  }

  /** GIF89a writer over an arbitrary 8-bit-indexed raster with a
    * 256-entry RGB palette. Public so the conformance/fuzz specs can
    * round-trip arbitrary content (including rasters that push the
    * dictionary through width bumps and a mid-stream clear).
    *
    * Interop note: interlace demands h ≥ 5. The spec's four pass
    * groups may be empty for shorter images, but the dominant decoder
    * loop (giflib, the JDK's ImageIO plugin) advances passes with a
    * SINGLE overflow adjustment per row, which lands on row 4 even
    * when h ≤ 4 and silently drops/clips rows — verified against
    * ImageIO in GifSpec. Writing such payloads would be
    * letter-of-spec but unreadable in practice, so they're rejected.
    */
  def encodeGif(w: Int, h: Int, indices: Array[Int], palette: Array[Int],
      interlaced: Boolean): Array[Byte] = {
    require(indices.length == w * h, "indices must be w*h palette refs")
    require(palette.length == 256 * 3, "palette must be 256 RGB entries")
    require(!interlaced || h >= 5,
      "interlace needs h >= 5: single-adjustment decoders clip shorter images")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    u16(w); u16(h)
    out.write(0xF7) // GCT present, color res 8, 256 entries
    out.write(0)    // background index
    out.write(0)    // aspect ratio
    palette.foreach(v => out.write(v & 0xFF))
    // comment extension — exercises the sub-block skip path
    out.write(0x21); out.write(0xFE)
    val cm = "graft".getBytes("US-ASCII")
    out.write(cm.length); out.write(cm, 0, cm.length); out.write(0)
    // graphic control extension — the other skip shape (fixed size 4)
    out.write(0x21); out.write(0xF9); out.write(4)
    out.write(0); u16(0); out.write(0); out.write(0)
    // image descriptor
    out.write(0x2C); u16(0); u16(0); u16(w); u16(h)
    out.write(if (interlaced) 0x40 else 0x00)
    // pixel stream in storage order (interlaced row permutation applied
    // at construct time; the decoder must invert it)
    val stream =
      if (!interlaced) indices
      else {
        val order = interlaceRows(h)
        val s = new Array[Int](indices.length)
        var r = 0
        while (r < h) {
          System.arraycopy(indices, order(r) * w, s, r * w, w)
          r += 1
        }
        s
      }
    val mcs = 8
    out.write(mcs)
    val lzw = lzwEncode(stream, mcs)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Row emission order for GIF's four interlace passes
    * (8k, 8k+4, 4k+2, 2k+1).
    */
  private[operators] def interlaceRows(h: Int): Array[Int] = {
    val b = Array.newBuilder[Int]
    var r = 0
    while (r < h) { b += r; r += 8 }
    r = 4; while (r < h) { b += r; r += 8 }
    r = 2; while (r < h) { b += r; r += 4 }
    r = 1; while (r < h) { b += r; r += 2 }
    b.result()
  }

  /** GIF-variant LZW compression of an index stream: clear code 2^mcs,
    * EOI 2^mcs+1, code width mcs+1 growing to 12 bits, LSB-first bit
    * packing, CLEAR + dictionary reset at the 4096 ceiling.
    */
  private[operators] def lzwEncode(indices: Array[Int], mcs: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val bits = new LsbBitWriter
    var codeSize = mcs + 1
    var next = eoi + 1
    // (prefixCode << 8 | nextIndex) -> code; cleared on reset
    val dict = new java.util.HashMap[Integer, Integer]()
    bits.write(clear, codeSize)
    if (indices.isEmpty) { bits.write(eoi, codeSize); return bits.result() }
    var prefix = indices(0)
    var i = 1
    while (i < indices.length) {
      val k = indices(i)
      val key = Integer.valueOf((prefix << 8) | k)
      val hit = dict.get(key)
      if (hit != null) prefix = hit.intValue()
      else {
        bits.write(prefix, codeSize)
        if (next < MaxCodes) {
          dict.put(key, Integer.valueOf(next))
          next += 1
          if (next > (1 << codeSize) && codeSize < 12) codeSize += 1
        } else {
          bits.write(clear, codeSize)
          dict.clear(); next = eoi + 1; codeSize = mcs + 1
        }
        prefix = k
      }
      i += 1
    }
    bits.write(prefix, codeSize)
    bits.write(eoi, codeSize)
    bits.result()
  }

  private final class LsbBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def write(v: Int, width: Int): Unit = {
      acc |= v << nBits
      nBits += width
      while (nBits >= 8) {
        out.write(acc & 0xFF)
        acc >>>= 8; nBits -= 8
      }
    }
    def result(): Array[Byte] = {
      if (nBits > 0) { out.write(acc & 0xFF); acc = 0; nBits = 0 }
      out.toByteArray
    }
  }

  // ---- decode --------------------------------------------------------

  /** Lenient full decode of the FIRST image in a GIF87a/89a payload:
    * header + logical screen descriptor, global color table, extension
    * blocks skipped by sub-block length, image descriptor (local
    * palette wins when present), variable-width LZW expansion,
    * palette mapping, four-pass de-interlace. None on anything
    * structurally damaged or out of the supported envelope.
    */
  def decode(b: Array[Byte]): Option[Multimodal.DecodedImage] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (b == null || b.length < 14) return None
    val magic = new String(b, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    var pos = 6
    val packed = u8(pos + 4)
    var pal: Array[Int] = null
    pos += 7
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + n * 3 > b.length) return None
      pal = Array.tabulate(n * 3)(i => u8(pos + i))
      pos += n * 3
    }
    while (pos < b.length) {
      u8(pos) match {
        case 0x21 => // extension: label byte then sub-blocks to a 0 length
          pos += 2
          var go = true
          while (go) {
            if (pos >= b.length) return None
            val n = u8(pos); pos += 1 + n
            if (n == 0) go = false
          }
        case 0x2C => // image descriptor
          if (pos + 10 > b.length) return None
          val w = u16(pos + 5); val h = u16(pos + 7)
          val ip = u8(pos + 9)
          pos += 10
          if ((ip & 0x80) != 0) { // local color table wins
            val n = 2 << (ip & 7)
            if (pos + n * 3 > b.length) return None
            pal = Array.tabulate(n * 3)(i => u8(pos + i))
            pos += n * 3
          }
          if (pal == null || w <= 0 || h <= 0 ||
            w.toLong * h * 3 > Int.MaxValue / 2) return None
          if (pos >= b.length) return None
          val mcs = u8(pos); pos += 1
          if (mcs < 2 || mcs > 11) return None
          val data = new java.io.ByteArrayOutputStream()
          var go = true
          while (go) {
            if (pos >= b.length) return None
            val n = u8(pos); pos += 1
            if (n == 0) go = false
            else {
              if (pos + n > b.length) return None
              data.write(b, pos, n); pos += n
            }
          }
          val idx = lzwDecode(data.toByteArray, mcs, w * h)
          if (idx == null) return None
          val interlaced = (ip & 0x40) != 0
          val nPal = pal.length / 3
          val out = new Array[Int](w * h * 3)
          val order = if (interlaced) interlaceRows(h) else null
          var r = 0
          while (r < h) {
            val dstRow = if (order == null) r else order(r)
            var x = 0
            while (x < w) {
              val pi = idx(r * w + x)
              if (pi >= nPal) return None // index past the palette
              val d = (dstRow * w + x) * 3
              out(d) = pal(pi * 3); out(d + 1) = pal(pi * 3 + 1)
              out(d + 2) = pal(pi * 3 + 2)
              x += 1
            }
            r += 1
          }
          return Some(Multimodal.DecodedImage("gif", w, h, out))
        case 0x3B => return None // trailer before any image
        case _    => return None // unknown block type = structural damage
      }
    }
    None
  }

  /** GIF-variant LZW expansion to exactly `expected` indices (stream
    * row order). Returns null on structural damage: bad codes, EOI or
    * exhaustion before `expected`, dictionary overflow.
    */
  private[operators] def lzwDecode(data: Array[Byte], mcs: Int,
      expected: Int): Array[Int] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefixArr = new Array[Int](MaxCodes)
    val suffixArr = new Array[Int](MaxCodes)
    val stack = new Array[Int](MaxCodes + 1)
    val out = new Array[Int](expected)
    var outPos = 0
    var codeSize = mcs + 1
    var next = eoi + 1
    var prev = -1
    var bitPos = 0
    val totalBits = data.length * 8
    def read(): Int = {
      if (bitPos + codeSize > totalBits) return -1
      var v = 0
      var i = 0
      while (i < codeSize) {
        val bp = bitPos + i
        if ((data(bp >> 3) >> (bp & 7) & 1) != 0) v |= 1 << i
        i += 1
      }
      bitPos += codeSize
      v
    }
    while (outPos < expected) {
      val code = read()
      if (code < 0 || code == eoi) return null // exhausted early
      if (code == clear) {
        codeSize = mcs + 1; next = eoi + 1; prev = -1
      } else {
        if (code > next || (code == next && prev < 0)) return null
        // expand code (or the KwKwK not-yet-defined entry) via the stack
        var sp = 0
        var cur = if (code == next) prev else code
        val kwkwk = code == next
        while (cur >= clear) { // composite codes walk prefix links
          if (cur == clear || cur == eoi || sp > MaxCodes - 1) return null
          stack(sp) = suffixArr(cur); sp += 1
          cur = prefixArr(cur)
        }
        val head = cur
        if (head >= clear) return null
        // emit head, the stacked suffixes in reverse, and — for the
        // KwKwK not-yet-defined entry — the head again at the end
        val needed = 1 + sp + (if (kwkwk) 1 else 0)
        if (outPos + needed > expected) return null // overruns the raster
        out(outPos) = head; outPos += 1
        var i = sp - 1
        while (i >= 0) { out(outPos) = stack(i); outPos += 1; i -= 1 }
        if (kwkwk) { out(outPos) = head; outPos += 1 }
        if (prev >= 0 && next < MaxCodes) {
          prefixArr(next) = prev; suffixArr(next) = head
          next += 1
          if (next >= (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    out
  }
}
