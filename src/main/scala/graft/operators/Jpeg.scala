package graft.operators

import graft.operators.Multimodal.DecodedImage

/** REAL baseline-sequential JPEG/JFIF codec in pure JVM — no codec
  * library. Closes the last image-tier decode stub: `decodeImage` now
  * yields pixels for JPEG payloads, not just header metadata.
  *
  * Decoder scope (the mainline of real corpora): baseline DCT (SOF0)
  * AND progressive DCT (SOF2 — spectral selection, successive
  * approximation with DC/AC first + refinement passes, EOB runs),
  * 8-bit precision, 1–3 components, sampling factors 1–2 (4:4:4,
  * 4:2:2, 4:2:0, grayscale), multi-table DQT/DHT segments, restart
  * intervals (DRI + RSTn), FF00 byte stuffing. Anything else —
  * arithmetic coding, 12-bit, lossless, hierarchical — is data, not
  * an exception: None.
  *
  * The encoder is the construct half for the oracle round trip, same
  * protocol as `encodePng`/`encodeWav`: forward DCT, quantization,
  * canonical Huffman with the standard-shaped tables below. Encoder
  * and decoder share the table definitions, so the entropy layer is
  * exercised end-to-end by fuzz; per-block-CONSTANT synthetic images
  * survive the DCT round trip bit-exactly (a constant block is DC-only:
  * FDCT leaves no AC energy, the IDCT of a DC-only block is constant),
  * which is what lets a SQL oracle replay the decode in closed form.
  *
  * The laygo reference has no multimodal surface at all (builder-brief
  * mandate; see SURVEY.md §2b) — no reference file to cite.
  */
object Jpeg {

  // zigzag index -> natural (row-major) position, JPEG spec order
  private[operators] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // canonical Huffman table spec: BITS (count of codes per length
  // 1..16) + HUFFVAL (values in code order) — the standard baseline
  // tables (JPEG Annex K shape). Encoder and decoder derive their
  // code books from these same arrays.
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)

  // The sequential standard AC tables carry no EOBn (n>0) symbols —
  // progressive EOB-run coding needs 0x10..0xE0 — so the progressive
  // encoder uses its own canonical AC layout (decoders read whatever
  // the DHT declares, so any valid table works): 4-bit codes for
  // EOB0-7 + ZRL, 9-bit codes for the remaining 167 symbols (all
  // (run,size) with size 1..10, EOB8-14). Kraft sum 9/16 + 167/512
  // < 1 and the largest code (455 of 9 bits) is not all-ones: valid.
  private val AcProgBits = Array(0, 0, 0, 9, 0, 0, 0, 0, 167, 0, 0, 0, 0, 0, 0, 0)
  private val AcProgVals: Array[Int] = {
    val short = Array(0x00, 0xF0, 0x10, 0x20, 0x30, 0x40, 0x50, 0x60, 0x70)
    val all = (0 to 15).flatMap(r => (1 to 10).map(s => (r << 4) | s)) ++
      (0 to 14).map(r => r << 4) :+ 0xF0
    short ++ all.filterNot(short.contains).toArray
  }

  // separable DCT basis: cosT(x)(u) = C(u)/2 * cos((2x+1)u*pi/16)
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // fixed-point BT.601 YCbCr -> RGB, shared verbatim by the decoder
  // and the SQL oracle: chan = clamp((y<<16 + k1*cb' + k2*cr' + 32768) >> 16)
  // (arithmetic >> IS floor division, same as the oracle's floor()).
  def ycbcrToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    val cb_ = cb - 128; val cr_ = cr - 128
    (clamp(((y << 16) + 91881 * cr_ + 32768) >> 16),
      clamp(((y << 16) - 22554 * cb_ - 46802 * cr_ + 32768) >> 16),
      clamp(((y << 16) + 116130 * cb_ + 32768) >> 16))
  }

  // ---- decoder ------------------------------------------------------

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical code decode via mincode/maxcode/valptr (JPEG spec F.2.2.3)
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    // encode side: code + length per value
    val eCode = new Array[Int](256)
    val eSize = new Array[Int](256)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        var i = 0
        while (i < bits(l - 1)) {
          eCode(vals(k)) = code; eSize(vals(k)) = l
          code += 1; k += 1; i += 1
        }
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit()
        l += 1
      }
      if (l > 16) throw new MalformedJpeg
      vals(valPtr(l) + code - minCode(l))
    }
  }

  private final class MalformedJpeg extends RuntimeException(null, null, false, false)

  /** Entropy-coded-segment bit reader: FF00 unstuffs to FF; any other
    * FFxx marker ends the segment (restarts are consumed explicitly by
    * the MCU loop via [[restart]]).
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nBits = 0
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= b.length) throw new MalformedJpeg
        var v = b(pos) & 0xFF; pos += 1
        if (v == 0xFF) {
          if (pos >= b.length) throw new MalformedJpeg
          val m = b(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed byte: literal FF
          else throw new MalformedJpeg // marker inside needed data
        }
        cur = v; nBits = 8
      }
      nBits -= 1
      (cur >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. False if the
      * stream doesn't have one here.
      */
    def restart(): Boolean = {
      nBits = 0
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xFF) != 0xFF) return false
      val m = b(pos + 1) & 0xFF
      if (m < 0xD0 || m > 0xD7) return false
      pos += 2
      true
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Shared 8x8 inverse DCT: natural-order dequantized coefficients →
    * clamped level-shifted samples in `block`.
    */
  private def idctBlock(coef: Array[Int], block: Array[Int],
      tmp: Array[Double]): Unit = {
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += CosT(x)(u) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var vv = 0
        while (vv < 8) { acc += CosT(y)(vv) * tmp(vv * 8 + x); vv += 1 }
        val px = math.rint(acc).toInt + 128
        block(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
  }

  /** Decode a baseline (SOF0) or progressive (SOF2) JFIF payload to a
    * top-down RGB raster (grayscale replicates Y). Baseline decodes
    * its single interleaved scan straight to sample planes; the
    * progressive path accumulates every scan — spectral selection,
    * successive approximation (DC and AC, first + refinement passes),
    * EOB runs, interleaved-DC vs per-component-AC block order, restart
    * intervals — into per-component quantized-coefficient buffers and
    * runs one dequant+IDCT pass at EOI (JPEG spec G.2 semantics, the
    * libjpeg-compatible subset). None for anything outside the
    * supported envelope or any structural error — malformed media is
    * data.
    */
  def decode(b: Array[Byte]): Option[DecodedImage] = {
    if (b == null || b.length < 4) return None
    def u8(i: Int): Int = b(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (u8(0) != 0xFF || u8(1) != 0xD8) return None
    try {
      val qt = Array.ofDim[Int](4, 64) // zigzag order, as stored
      val qtSeen = new Array[Boolean](4)
      val dcTables = new Array[HuffTable](4)
      val acTables = new Array[HuffTable](4)
      var w = -1; var h = -1
      var nComp = 0
      var progressive = false
      // per component: id, hSamp, vSamp, quant table, dc table, ac table
      val cId = new Array[Int](3); val cH = new Array[Int](3)
      val cV = new Array[Int](3); val cQ = new Array[Int](3)
      val cDc = new Array[Int](3); val cAc = new Array[Int](3)
      var restartInterval = 0
      var pos = 2
      var scanStart = -1 // baseline: position of the single scan's data
      var done = false
      // frame geometry (computed at SOF — progressive scans need it)
      var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0
      var blocksPerLine: Array[Int] = null
      var blocksPerCol: Array[Int] = null
      // progressive: per-component quantized coefficients in zigzag
      // order, 64 per block over the padded MCU grid, allocated at the
      // first SOS and filled scan by scan
      var coefBufs: Array[Array[Int]] = null
      var nScans = 0

      /** One progressive scan: entropy data at `start` accumulated
        * into the coefficient buffers; returns the position of the
        * next marker after the scan.
        */
      def progScan(start: Int, comps: Array[Int], ss: Int, se: Int,
          ah: Int, al: Int): Int = {
        val br = new BitReader(b, start)
        val pred = new Array[Int](3)
        var eobrun = 0
        val p1 = 1 << al
        val m1 = -1 << al

        // refinement correction bit for a coefficient that is already
        // nonzero: move it one step away from zero if bit set and this
        // scan hasn't already set bit `al`
        def refineBit(buf: Array[Int], i: Int): Unit =
          if (br.bit() != 0 && (buf(i) & p1) == 0) {
            if (buf(i) >= 0) buf(i) += p1 else buf(i) += m1
          }

        def dcFirst(c: Int, off: Int): Unit = {
          val t = dcTables(cDc(c)).decode(br)
          if (t > 15) throw new MalformedJpeg
          pred(c) += extend(br.receive(t), t)
          coefBufs(c)(off) = pred(c) << al
        }
        def dcRefine(c: Int, off: Int): Unit =
          if (br.bit() != 0) coefBufs(c)(off) |= p1

        def acFirst(c: Int, off: Int): Unit = {
          if (eobrun > 0) { eobrun -= 1; return }
          val buf = coefBufs(c)
          val tbl = acTables(cAc(c))
          var k = ss
          var live = true
          while (live && k <= se) {
            val rs = tbl.decode(br)
            val r = rs >> 4; val s = rs & 0xF
            if (s == 0) {
              if (r < 15) { // EOBn: this block + (run-1) following ones
                eobrun = (1 << r) - 1
                if (r > 0) eobrun += br.receive(r)
                live = false
              } else k += 16 // ZRL
            } else {
              k += r
              if (k > se) throw new MalformedJpeg
              buf(off + k) = extend(br.receive(s), s) << al
              k += 1
            }
          }
        }

        def acRefine(c: Int, off: Int): Unit = {
          val buf = coefBufs(c)
          val tbl = acTables(cAc(c))
          var k = ss
          if (eobrun == 0) {
            var live = true
            while (live && k <= se) {
              val rs = tbl.decode(br)
              var r = rs >> 4; val s = rs & 0xF
              var newVal = 0
              if (s == 0) {
                if (r < 15) {
                  eobrun = 1 << r
                  if (r > 0) eobrun += br.receive(r)
                  live = false // remainder of the band refined below
                }
                // else ZRL: advance over 16 zero-history positions
              } else {
                if (s != 1) throw new MalformedJpeg // refinement codes ±1 only
                newVal = if (br.bit() != 0) p1 else m1
              }
              if (live) {
                // advance: correction bits for nonzero-history coefs,
                // the run counts only zero-history positions
                var adv = true
                while (adv && k <= se) {
                  if (buf(off + k) != 0) { refineBit(buf, off + k); k += 1 }
                  else {
                    r -= 1
                    if (r < 0) adv = false else k += 1
                  }
                }
                if (newVal != 0) {
                  if (k > se) throw new MalformedJpeg
                  buf(off + k) = newVal
                }
                k += 1
              }
            }
          }
          if (eobrun > 0) {
            // end-of-band: only correction bits remain in this block
            while (k <= se) {
              if (buf(off + k) != 0) refineBit(buf, off + k)
              k += 1
            }
            eobrun -= 1
          }
        }

        if (comps.length > 1) {
          // interleaved scan (DC only): the full padded MCU grid
          var mcu = 0
          val nMcus = mcusX * mcusY
          while (mcu < nMcus) {
            if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
              if (!br.restart()) throw new MalformedJpeg
              java.util.Arrays.fill(pred, 0); eobrun = 0
            }
            val mx = mcu % mcusX; val my = mcu / mcusX
            var si = 0
            while (si < comps.length) {
              val c = comps(si)
              var by = 0
              while (by < cV(c)) {
                var bx = 0
                while (bx < cH(c)) {
                  val off = ((my * cV(c) + by) * blocksPerLine(c) +
                    mx * cH(c) + bx) * 64
                  if (ah == 0) dcFirst(c, off) else dcRefine(c, off)
                  bx += 1
                }
                by += 1
              }
              si += 1
            }
            mcu += 1
          }
        } else {
          // non-interleaved: the component's true (unpadded) block
          // grid in raster order — padding blocks are never coded
          val c = comps(0)
          val cw = (w * cH(c) + hMax - 1) / hMax
          val ch = (h * cV(c) + vMax - 1) / vMax
          val gw = (cw + 7) / 8; val gh = (ch + 7) / 8
          var blk = 0
          val total = gw * gh
          while (blk < total) {
            if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
              if (!br.restart()) throw new MalformedJpeg
              java.util.Arrays.fill(pred, 0); eobrun = 0
            }
            val off = ((blk / gw) * blocksPerLine(c) + blk % gw) * 64
            if (ss == 0) { if (ah == 0) dcFirst(c, off) else dcRefine(c, off) }
            else { if (ah == 0) acFirst(c, off) else acRefine(c, off) }
            blk += 1
          }
        }
        // locate the next marker past any fill bits (FF00 is stuffing)
        var p = br.pos
        var found = -1
        while (found < 0 && p + 1 < b.length) {
          if (u8(p) == 0xFF && u8(p + 1) != 0x00) found = p else p += 1
        }
        if (found < 0) throw new MalformedJpeg
        found
      }

      while (!done) {
        if (pos + 2 > b.length) return None
        if (u8(pos) != 0xFF) return None
        var mPos = pos
        while (mPos < b.length && u8(mPos) == 0xFF) mPos += 1 // fill FFs
        if (mPos >= b.length) return None
        val marker = u8(mPos)
        if (marker == 0xD9) {
          // EOI terminates a progressive stream with >=1 decoded scan;
          // before any scan it means a truncated/imageless stream
          if (progressive && nScans > 0) done = true else return None
        } else {
          val segStart = mPos + 1
          if (segStart + 2 > b.length) return None
          val segLen = u16(segStart)
          if (segLen < 2 || segStart + segLen > b.length) return None
          val dEnd = segStart + segLen
          var nextPos = dEnd
          marker match {
            case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive
              if (w >= 0) return None // one frame header only
              progressive = marker == 0xC2
              if (u8(segStart + 2) != 8) return None // 8-bit only
              h = u16(segStart + 3); w = u16(segStart + 5)
              nComp = u8(segStart + 7)
              if (w <= 0 || h <= 0 || nComp < 1 || nComp > 3) return None
              if (w.toLong * h > Int.MaxValue / 4) return None
              var c = 0
              while (c < nComp) {
                val o = segStart + 8 + 3 * c
                cId(c) = u8(o)
                cH(c) = u8(o + 1) >> 4; cV(c) = u8(o + 1) & 0xF
                cQ(c) = u8(o + 2)
                if (cH(c) < 1 || cH(c) > 2 || cV(c) < 1 || cV(c) > 2 ||
                  cQ(c) > 3) return None
                c += 1
              }
              hMax = (0 until nComp).map(cH).max
              vMax = (0 until nComp).map(cV).max
              mcusX = (w + 8 * hMax - 1) / (8 * hMax)
              mcusY = (h + 8 * vMax - 1) / (8 * vMax)
              blocksPerLine = Array.tabulate(nComp)(i => mcusX * cH(i))
              blocksPerCol = Array.tabulate(nComp)(i => mcusY * cV(i))
            case 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
                 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
              return None // other frame types unsupported
            case 0xDB => // DQT: one or more tables
              var o = segStart + 2
              while (o < dEnd) {
                val pq = u8(o) >> 4; val tq = u8(o) & 0xF
                if (tq > 3) return None
                val elemLen = if (pq == 0) 64 else 128
                if (o + 1 + elemLen > dEnd) return None
                var k = 0
                while (k < 64) {
                  qt(tq)(k) = if (pq == 0) u8(o + 1 + k) else u16(o + 1 + 2 * k)
                  k += 1
                }
                qtSeen(tq) = true
                o += 1 + elemLen
              }
            case 0xC4 => // DHT: one or more tables
              var o = segStart + 2
              while (o < dEnd) {
                val tc = u8(o) >> 4; val th = u8(o) & 0xF
                if (tc > 1 || th > 3 || o + 17 > dEnd) return None
                val bits = Array.tabulate(16)(i => u8(o + 1 + i))
                val n = bits.sum
                if (n > 256 || o + 17 + n > dEnd) return None
                val vals = Array.tabulate(n)(i => u8(o + 17 + i))
                val t = new HuffTable(bits, vals)
                if (tc == 0) dcTables(th) = t else acTables(th) = t
                o += 17 + n
              }
            case 0xDD => // DRI
              restartInterval = u16(segStart + 2)
            case 0xDA => // SOS
              if (w < 0) return None
              val ns = u8(segStart + 2)
              if (progressive) {
                if (ns < 1 || ns > nComp) return None
                val comps = new Array[Int](ns)
                var c = 0
                while (c < ns) {
                  val o = segStart + 3 + 2 * c
                  val idx = cId.take(nComp).indexOf(u8(o))
                  if (idx < 0) return None
                  comps(c) = idx
                  cDc(idx) = u8(o + 1) >> 4; cAc(idx) = u8(o + 1) & 0xF
                  c += 1
                }
                val so = segStart + 3 + 2 * ns
                val ss = u8(so); val se = u8(so + 1)
                val ah = u8(so + 2) >> 4; val al = u8(so + 2) & 0xF
                // scan-header validity (spec G.1.1.1.1)
                if (se > 63 || se < ss) return None
                if (ss == 0 && se != 0) return None // DC scans are 0..0
                if (ss > 0 && ns != 1) return None // AC scans: one component
                if (ah != 0 && ah != al + 1) return None
                if (al > 13) return None
                // tables this scan's coding actually uses must exist
                c = 0
                while (c < ns) {
                  if (ss == 0 && ah == 0 &&
                    dcTables(cDc(comps(c))) == null) return None
                  if (ss > 0 && acTables(cAc(comps(c))) == null) return None
                  c += 1
                }
                if (coefBufs == null)
                  coefBufs = Array.tabulate(nComp)(i =>
                    new Array[Int](blocksPerLine(i) * blocksPerCol(i) * 64))
                nextPos = progScan(dEnd, comps, ss, se, ah, al)
                nScans += 1
              } else {
                if (ns != nComp) return None
                var c = 0
                while (c < ns) {
                  val o = segStart + 3 + 2 * c
                  val sel = u8(o)
                  val idx = cId.take(nComp).indexOf(sel)
                  if (idx < 0) return None
                  cDc(idx) = u8(o + 1) >> 4; cAc(idx) = u8(o + 1) & 0xF
                  c += 1
                }
                scanStart = dEnd
                done = true
              }
            case _ => () // APPn / COM / others: skip by length
          }
          pos = nextPos
        }
      }
      val planeW = (0 until nComp).map(i => mcusX * 8 * cH(i)).toArray
      val planeH = (0 until nComp).map(i => mcusY * 8 * cV(i)).toArray
      val planes = (0 until nComp).map(i =>
        new Array[Int](planeW(i) * planeH(i))).toArray
      if (!progressive) {
        // ---- baseline: decode the single interleaved scan
        var c = 0
        while (c < nComp) {
          if (!qtSeen(cQ(c)) || dcTables(cDc(c)) == null ||
            acTables(cAc(c)) == null) return None
          c += 1
        }
        val br = new BitReader(b, scanStart)
        val pred = new Array[Int](3)
        val coef = new Array[Int](64)
        val block = new Array[Int](64)
        val tmp = new Array[Double](64)
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            if (!br.restart()) throw new MalformedJpeg
            java.util.Arrays.fill(pred, 0)
          }
          val mx = mcu % mcusX; val my = mcu / mcusX
          c = 0
          while (c < nComp) {
            val q = qt(cQ(c))
            var by = 0
            while (by < cV(c)) {
              var bx = 0
              while (bx < cH(c)) {
                // ---- one 8x8 block: huffman -> dequant -> dezigzag
                java.util.Arrays.fill(coef, 0)
                val t = dcTables(cDc(c)).decode(br)
                if (t > 15) throw new MalformedJpeg
                pred(c) += extend(br.receive(t), t)
                coef(0) = pred(c) * q(0)
                var k = 1
                var run = true
                while (run && k < 64) {
                  val rs = acTables(cAc(c)).decode(br)
                  val r = rs >> 4; val s = rs & 0xF
                  if (s == 0) {
                    if (r == 15) k += 16 else run = false // ZRL vs EOB
                  } else {
                    k += r
                    if (k > 63) throw new MalformedJpeg
                    coef(Zigzag(k)) = extend(br.receive(s), s) * q(k)
                    k += 1
                  }
                }
                idctBlock(coef, block, tmp)
                // place into the component plane
                val ox = (mx * cH(c) + bx) * 8
                val oy = (my * cV(c) + by) * 8
                var y = 0
                while (y < 8) {
                  var x = 0
                  while (x < 8) {
                    planes(c)((oy + y) * planeW(c) + ox + x) = block(y * 8 + x)
                    x += 1
                  }
                  y += 1
                }
                bx += 1
              }
              by += 1
            }
            c += 1
          }
          mcu += 1
        }
      } else {
        // ---- progressive: one dequant+IDCT pass over the buffers
        val coef = new Array[Int](64)
        val block = new Array[Int](64)
        val tmp = new Array[Double](64)
        var c = 0
        while (c < nComp) {
          if (!qtSeen(cQ(c))) return None
          val q = qt(cQ(c))
          val buf = coefBufs(c)
          var bRow = 0
          while (bRow < blocksPerCol(c)) {
            var bCol = 0
            while (bCol < blocksPerLine(c)) {
              val off = (bRow * blocksPerLine(c) + bCol) * 64
              java.util.Arrays.fill(coef, 0)
              var k = 0
              while (k < 64) { coef(Zigzag(k)) = buf(off + k) * q(k); k += 1 }
              idctBlock(coef, block, tmp)
              val ox = bCol * 8; val oy = bRow * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  planes(c)((oy + y) * planeW(c) + ox + x) = block(y * 8 + x)
                  x += 1
                }
                y += 1
              }
              bCol += 1
            }
            bRow += 1
          }
          c += 1
        }
      }
      // color conversion with nearest (replicating) upsampling
      val rgb = new Array[Int](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = (y * w + x) * 3
          if (nComp == 1) {
            val g = planes(0)(y * planeW(0) + x)
            rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
          } else {
            def samp(i: Int): Int = {
              val sx = x * cH(i) / hMax; val sy = y * cV(i) / vMax
              planes(i)(sy * planeW(i) + sx)
            }
            val (r, g, bl) = ycbcrToRgb(samp(0), samp(1), samp(2))
            rgb(o) = r; rgb(o + 1) = g; rgb(o + 2) = bl
          }
          x += 1
        }
        y += 1
      }
      Some(DecodedImage("jpeg", w, h, rgb))
    } catch {
      case _: MalformedJpeg => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---- encoder ------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(cur)
          if (cur == 0xFF) out.write(0x00) // byte stuffing
          cur = 0; nBits = 0
        }
        i -= 1
      }
    }
    /** Pad with 1-bits to a byte boundary (spec fill bits). */
    def flush(): Unit = if (nBits > 0) put(0xFF >> (8 - nBits), 8 - nBits)
  }

  private def magnitude(v: Int): Int = {
    var s = 0; var a = math.abs(v)
    while (a != 0) { s += 1; a >>= 1 }
    s
  }

  /** FDCT (separable, transpose of the decoder's basis) + uniform
    * quantization of one level-shifted 8x8 block into zigzag-order
    * quantized coefficients — shared by the baseline and progressive
    * encoders so both code the SAME coefficients.
    */
  private def fdctQuant(blk: Array[Double], quant: Int, coefZ: Array[Int],
      tmp: Array[Double]): Unit = {
    var u = 0
    while (u < 8) {
      var yy = 0
      while (yy < 8) {
        var acc = 0.0
        var x = 0
        while (x < 8) { acc += CosT(x)(u) * blk(yy * 8 + x); x += 1 }
        tmp(yy * 8 + u) = acc
        yy += 1
      }
      u += 1
    }
    var k = 0
    while (k < 64) {
      val uu = Zigzag(k) % 8; val vv = Zigzag(k) / 8
      var acc = 0.0
      var yy = 0
      while (yy < 8) { acc += CosT(yy)(vv) * tmp(yy * 8 + uu); yy += 1 }
      coefZ(k) = math.rint(acc / quant).toInt
      k += 1
    }
  }

  /** Encode a top-down RGB raster as baseline JFIF. `chromaSub` emits
    * 4:2:0 (2x2 luma blocks per MCU, chroma averaged over 2x2 pixel
    * boxes); otherwise 4:4:4. `quant` is the single quantization value
    * used for every coefficient of every table (1 = near-lossless).
    * `restartEvery` > 0 emits DRI + RSTn markers each N MCUs.
    */
  def encode(w: Int, h: Int, rgb: Array[Int], chromaSub: Boolean = false,
      quant: Int = 1, restartEvery: Int = 0): Array[Byte] = {
    require(rgb.length == w * h * 3, "rgb must be w*h*3 channel values")
    require(quant >= 1 && quant <= 255, "quant in 1..255")
    // RGB -> YCbCr planes at full resolution (BT.601, rounded)
    val n = w * h
    val yP = new Array[Int](n); val cbP = new Array[Int](n); val crP = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = rgb(i * 3); val g = rgb(i * 3 + 1); val bl = rgb(i * 3 + 2)
      def rnd(v: Double): Int = {
        val x = math.rint(v).toInt
        if (x < 0) 0 else if (x > 255) 255 else x
      }
      yP(i) = rnd(0.299 * r + 0.587 * g + 0.114 * bl)
      cbP(i) = rnd(128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * bl)
      crP(i) = rnd(128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * bl)
      i += 1
    }
    encodeYcbcr(w, h, yP, cbP, crP, chromaSub, quant, restartEvery)
  }

  /** Encode explicit YCbCr planes (full resolution; edge-replicated and
    * box-averaged here as needed). The per-block-constant oracle path
    * uses this directly so the color transform cannot blur exactness.
    */
  def encodeYcbcr(w: Int, h: Int, yP: Array[Int], cbP: Array[Int],
      crP: Array[Int], chromaSub: Boolean, quant: Int,
      restartEvery: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xFF); out.write(marker) }
    def seg(marker: Int, data: Array[Int]): Unit = {
      m(marker)
      out.write((data.length + 2) >> 8); out.write((data.length + 2) & 0xFF)
      data.foreach(out.write)
    }
    m(0xD8) // SOI
    seg(0xE0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    // DQT: table 0 (luma) and 1 (chroma), all coefficients = quant
    seg(0xDB, Array(0x00) ++ Array.fill(64)(quant))
    seg(0xDB, Array(0x01) ++ Array.fill(64)(quant))
    val hs = if (chromaSub) 2 else 1
    seg(0xC0, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 3,
      1, (hs << 4) | hs, 0, 2, 0x11, 1, 3, 0x11, 1)) // SOF0
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit =
      seg(0xC4, Array((tc << 4) | th) ++ bits ++ vals)
    dht(0, 0, DcLumaBits, DcLumaVals); dht(1, 0, AcLumaBits, AcLumaVals)
    dht(0, 1, DcChromaBits, DcChromaVals); dht(1, 1, AcChromaBits, AcChromaVals)
    if (restartEvery > 0)
      seg(0xDD, Array(restartEvery >> 8, restartEvery & 0xFF))
    seg(0xDA, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)) // SOS
    val dcT = Array(new HuffTable(DcLumaBits, DcLumaVals),
      new HuffTable(DcChromaBits, DcChromaVals))
    val acT = Array(new HuffTable(AcLumaBits, AcLumaVals),
      new HuffTable(AcChromaBits, AcChromaVals))
    val bw = new BitWriter(out)
    val mcuW = 8 * hs; val mcuH = 8 * hs
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    val pred = new Array[Int](3)
    val blk = new Array[Double](64)
    val coefZ = new Array[Int](64)
    val tmp = new Array[Double](64)
    // sample (x, y) from a full-res plane with edge replication
    def sample(p: Array[Int], x: Int, y: Int): Int =
      p(math.min(y, h - 1) * w + math.min(x, w - 1))
    // chroma at subsampled grid: average the 2x2 pixel box (or 1x1)
    def chromaAt(p: Array[Int], sx: Int, sy: Int): Double =
      if (!chromaSub) sample(p, sx, sy)
      else (sample(p, 2 * sx, 2 * sy) + sample(p, 2 * sx + 1, 2 * sy) +
        sample(p, 2 * sx, 2 * sy + 1) + sample(p, 2 * sx + 1, 2 * sy + 1)) / 4.0
    def encodeBlock(comp: Int, tbl: Int, fill: (Int, Int) => Double): Unit = {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) { blk(y * 8 + x) = fill(x, y) - 128.0; x += 1 }
        y += 1
      }
      fdctQuant(blk, quant, coefZ, tmp)
      var k = 0
      // entropy encode: DC diff category + bits, AC run/size
      val diff = coefZ(0) - pred(comp)
      pred(comp) = coefZ(0)
      val s = magnitude(diff)
      bw.put(dcT(tbl).eCode(s), dcT(tbl).eSize(s))
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      var last = 63
      while (last > 0 && coefZ(last) == 0) last -= 1
      k = 1
      var run = 0
      while (k <= last) {
        if (coefZ(k) == 0) run += 1
        else {
          while (run > 15) { bw.put(acT(tbl).eCode(0xF0), acT(tbl).eSize(0xF0)); run -= 16 }
          val as = magnitude(coefZ(k))
          val rs = (run << 4) | as
          bw.put(acT(tbl).eCode(rs), acT(tbl).eSize(rs))
          bw.put(if (coefZ(k) < 0) coefZ(k) + (1 << as) - 1 else coefZ(k), as)
          run = 0
        }
        k += 1
      }
      if (last < 63) bw.put(acT(tbl).eCode(0x00), acT(tbl).eSize(0x00)) // EOB
    }
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
        bw.flush()
        m(0xD0 + ((mcu / restartEvery - 1) % 8))
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var by = 0
      while (by < hs) { // luma blocks (1x1 or 2x2 per MCU)
        var bx = 0
        while (bx < hs) {
          val ox = (mx * hs + bx) * 8; val oy = (my * hs + by) * 8
          encodeBlock(0, 0, (x, y) => sample(yP, ox + x, oy + y).toDouble)
          bx += 1
        }
        by += 1
      }
      encodeBlock(1, 1, (x, y) => chromaAt(cbP, mx * 8 + x, my * 8 + y))
      encodeBlock(2, 1, (x, y) => chromaAt(crP, mx * 8 + x, my * 8 + y))
      mcu += 1
    }
    bw.flush()
    m(0xD9) // EOI
    out.toByteArray
  }

  // ---- progressive encoder --------------------------------------

  /** Encode explicit YCbCr planes as PROGRESSIVE JFIF (SOF2) with a
    * libjpeg-shaped scan script: an interleaved DC first pass at Al=1,
    * spectrally-split AC first passes at Al=1 (luma split 1–5 / 6–63,
    * EOB-run coded), then the successive-approximation refinement
    * passes down to Al=0 — DC refinement as raw bits, AC refinement
    * with correction-bit buffering (spec G.1.2.3 semantics). The
    * quantized coefficients come from the same [[fdctQuant]] as the
    * baseline encoder, so a progressive payload must decode
    * PIXEL-IDENTICALLY to the baseline encoding of the same planes —
    * the round-trip contract the spec asserts. `restartEvery` > 0
    * emits DRI + per-scan RSTn markers (MCUs for the interleaved DC
    * scans, blocks for the per-component AC scans).
    */
  def encodeProgressiveYcbcr(w: Int, h: Int, yP: Array[Int], cbP: Array[Int],
      crP: Array[Int], chromaSub: Boolean, quant: Int,
      restartEvery: Int): Array[Byte] = {
    require(quant >= 1 && quant <= 255, "quant in 1..255")
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xFF); out.write(marker) }
    def seg(marker: Int, data: Array[Int]): Unit = {
      m(marker)
      out.write((data.length + 2) >> 8); out.write((data.length + 2) & 0xFF)
      data.foreach(out.write)
    }
    m(0xD8) // SOI
    seg(0xE0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    seg(0xDB, Array(0x00) ++ Array.fill(64)(quant))
    seg(0xDB, Array(0x01) ++ Array.fill(64)(quant))
    val hs = if (chromaSub) 2 else 1
    seg(0xC2, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 3,
      1, (hs << 4) | hs, 0, 2, 0x11, 1, 3, 0x11, 1)) // SOF2
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit =
      seg(0xC4, Array((tc << 4) | th) ++ bits ++ vals)
    dht(0, 0, DcLumaBits, DcLumaVals); dht(1, 0, AcProgBits, AcProgVals)
    dht(0, 1, DcChromaBits, DcChromaVals); dht(1, 1, AcProgBits, AcProgVals)
    if (restartEvery > 0)
      seg(0xDD, Array(restartEvery >> 8, restartEvery & 0xFF))

    // ---- quantized coefficients for every padded-grid block,
    // zigzag order, identical numbers to the baseline encoder's
    val mcusX = (w + 8 * hs - 1) / (8 * hs)
    val mcusY = (h + 8 * hs - 1) / (8 * hs)
    val compH = Array(hs, 1, 1); val compV = Array(hs, 1, 1)
    val bpl = Array(mcusX * hs, mcusX, mcusX)
    val bpc = Array(mcusY * hs, mcusY, mcusY)
    val bufs = Array.tabulate(3)(c => new Array[Int](bpl(c) * bpc(c) * 64))
    def sample(p: Array[Int], x: Int, y: Int): Int =
      p(math.min(y, h - 1) * w + math.min(x, w - 1))
    def chromaAt(p: Array[Int], sx: Int, sy: Int): Double =
      if (!chromaSub) sample(p, sx, sy).toDouble
      else (sample(p, 2 * sx, 2 * sy) + sample(p, 2 * sx + 1, 2 * sy) +
        sample(p, 2 * sx, 2 * sy + 1) + sample(p, 2 * sx + 1, 2 * sy + 1)) / 4.0
    locally {
      val blk = new Array[Double](64)
      val tmp = new Array[Double](64)
      val coefZ = new Array[Int](64)
      var c = 0
      while (c < 3) {
        val plane = if (c == 0) yP else if (c == 1) cbP else crP
        var by = 0
        while (by < bpc(c)) {
          var bx = 0
          while (bx < bpl(c)) {
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val v = if (c == 0) sample(yP, bx * 8 + x, by * 8 + y).toDouble
                  else chromaAt(plane, bx * 8 + x, by * 8 + y)
                blk(y * 8 + x) = v - 128.0
                x += 1
              }
              y += 1
            }
            fdctQuant(blk, quant, coefZ, tmp)
            System.arraycopy(coefZ, 0, bufs(c), (by * bpl(c) + bx) * 64, 64)
            bx += 1
          }
          by += 1
        }
        c += 1
      }
    }

    val dcT = Array(new HuffTable(DcLumaBits, DcLumaVals),
      new HuffTable(DcChromaBits, DcChromaVals))
    val acT = Array(new HuffTable(AcProgBits, AcProgVals),
      new HuffTable(AcProgBits, AcProgVals))
    def sosHeader(comps: Array[Int], ss: Int, se: Int, ah: Int, al: Int): Unit =
      seg(0xDA, Array(comps.length) ++
        comps.flatMap(c => Array(c + 1, if (c == 0) 0x00 else 0x11)) ++
        Array(ss, se, (ah << 4) | al))
    // the component's true (unpadded) block grid — AC scans never
    // code padding blocks (the decoder walks the same grid)
    def trueGrid(c: Int): (Int, Int) = {
      val cw = (w * compH(c) + hs - 1) / hs
      val ch = (h * compV(c) + hs - 1) / hs
      ((cw + 7) / 8, (ch + 7) / 8)
    }

    def dcScan(al: Int, refine: Boolean): Unit = {
      sosHeader(Array(0, 1, 2), 0, 0, if (refine) al + 1 else 0, al)
      val bw = new BitWriter(out)
      val pred = new Array[Int](3)
      var rst = 0
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
          bw.flush(); m(0xD0 + (rst % 8)); rst += 1
          java.util.Arrays.fill(pred, 0)
        }
        val mx = mcu % mcusX; val my = mcu / mcusX
        var c = 0
        while (c < 3) {
          val tbl = if (c == 0) 0 else 1
          var by = 0
          while (by < compV(c)) {
            var bx = 0
            while (bx < compH(c)) {
              val off = ((my * compV(c) + by) * bpl(c) +
                mx * compH(c) + bx) * 64
              if (refine) bw.put((bufs(c)(off) >> al) & 1, 1)
              else {
                // DC point transform is an arithmetic shift (floor)
                val v = bufs(c)(off) >> al
                val diff = v - pred(c); pred(c) = v
                val s = magnitude(diff)
                bw.put(dcT(tbl).eCode(s), dcT(tbl).eSize(s))
                if (s > 0)
                  bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
              }
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcu += 1
      }
      bw.flush()
    }

    def acFirstScan(c: Int, ss: Int, se: Int, al: Int): Unit = {
      sosHeader(Array(c), ss, se, 0, al)
      val tbl = if (c == 0) 0 else 1
      val bw = new BitWriter(out)
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        var r = 0
        while ((2 << r) <= eobrun) r += 1 // r = floor(log2(eobrun))
        bw.put(acT(tbl).eCode(r << 4), acT(tbl).eSize(r << 4))
        if (r > 0) bw.put(eobrun - (1 << r), r)
        eobrun = 0
      }
      val (gw, gh) = trueGrid(c)
      var rst = 0
      var blk = 0
      val total = gw * gh
      while (blk < total) {
        if (restartEvery > 0 && blk > 0 && blk % restartEvery == 0) {
          flushEob(); bw.flush(); m(0xD0 + (rst % 8)); rst += 1
        }
        val off = ((blk / gw) * bpl(c) + blk % gw) * 64
        // AC point transform truncates toward zero (spec G.1.2.1)
        var last = -1
        var k = ss
        while (k <= se) {
          if ((math.abs(bufs(c)(off + k)) >> al) != 0) last = k
          k += 1
        }
        if (last < 0) { eobrun += 1; if (eobrun == 0x7FFF) flushEob() }
        else {
          flushEob()
          var run = 0
          k = ss
          while (k <= last) {
            val raw = bufs(c)(off + k)
            val a = math.abs(raw) >> al
            if (a == 0) run += 1
            else {
              while (run > 15) {
                bw.put(acT(tbl).eCode(0xF0), acT(tbl).eSize(0xF0))
                run -= 16
              }
              val v = if (raw < 0) -a else a
              val s = magnitude(v)
              bw.put(acT(tbl).eCode((run << 4) | s),
                acT(tbl).eSize((run << 4) | s))
              bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
              run = 0
            }
            k += 1
          }
          if (last < se) { eobrun += 1; if (eobrun == 0x7FFF) flushEob() }
        }
        blk += 1
      }
      flushEob()
      bw.flush()
    }

    def acRefineScan(c: Int, ss: Int, se: Int, al: Int): Unit = {
      sosHeader(Array(c), ss, se, al + 1, al)
      val tbl = if (c == 0) 0 else 1
      val bw = new BitWriter(out)
      var eobrun = 0
      // correction bits for blocks folded into a pending EOB run are
      // appended right after the EOB code (libjpeg's BE buffer)
      val pendingBE = new scala.collection.mutable.ArrayBuffer[Int]()
      def flushEob(): Unit = {
        if (eobrun > 0) {
          var r = 0
          while ((2 << r) <= eobrun) r += 1
          bw.put(acT(tbl).eCode(r << 4), acT(tbl).eSize(r << 4))
          if (r > 0) bw.put(eobrun - (1 << r), r)
          eobrun = 0
        }
        pendingBE.foreach(bit => bw.put(bit, 1))
        pendingBE.clear()
      }
      val (gw, gh) = trueGrid(c)
      var rst = 0
      var blk = 0
      val total = gw * gh
      while (blk < total) {
        if (restartEvery > 0 && blk > 0 && blk % restartEvery == 0) {
          flushEob(); bw.flush(); m(0xD0 + (rst % 8)); rst += 1
        }
        val off = ((blk / gw) * bpl(c) + blk % gw) * 64
        // EOB position: index of the last NEWLY-nonzero coefficient
        var eob = ss - 1
        var k = ss
        while (k <= se) {
          if ((math.abs(bufs(c)(off + k)) >> al) == 1) eob = k
          k += 1
        }
        var run = 0
        val pendingBR = new scala.collection.mutable.ArrayBuffer[Int]()
        def flushBR(): Unit = { pendingBR.foreach(b => bw.put(b, 1)); pendingBR.clear() }
        k = ss
        while (k <= se) {
          val raw = bufs(c)(off + k)
          val a = math.abs(raw) >> al
          if (a == 0) run += 1
          else {
            // zeros beyond the last newly-nonzero coef fold into the
            // EOB run; before it, overlong runs need explicit ZRLs
            while (run > 15 && k <= eob) {
              flushEob()
              bw.put(acT(tbl).eCode(0xF0), acT(tbl).eSize(0xF0))
              run -= 16
              flushBR()
            }
            if (a > 1) pendingBR += (a & 1) // history coef: correction bit
            else {
              flushEob()
              bw.put(acT(tbl).eCode((run << 4) | 1),
                acT(tbl).eSize((run << 4) | 1))
              bw.put(if (raw < 0) 0 else 1, 1) // sign of the new ±1
              flushBR()
              run = 0
            }
          }
          k += 1
        }
        if (run > 0 || pendingBR.nonEmpty) {
          eobrun += 1
          pendingBE ++= pendingBR
          if (eobrun == 0x7FFF || pendingBE.length > 900) flushEob()
        }
        blk += 1
      }
      flushEob()
      bw.flush()
    }

    dcScan(1, refine = false)
    acFirstScan(0, 1, 5, 1)
    acFirstScan(0, 6, 63, 1)
    acFirstScan(1, 1, 63, 1)
    acFirstScan(2, 1, 63, 1)
    dcScan(0, refine = true)
    acRefineScan(0, 1, 5, 0)
    acRefineScan(0, 6, 63, 0)
    acRefineScan(1, 1, 63, 0)
    acRefineScan(2, 1, 63, 0)
    m(0xD9) // EOI
    out.toByteArray
  }

  // ---- per-block-constant synthetics (the SQL-replayable oracle) ----

  /** Block-constant YCbCr values for block index b of image `id` —
    * closed forms any SQL engine replays. A constant 8x8 block is
    * DC-only under the DCT, so with quant=1 the decode returns these
    * exact values, and the RGB the oracle pins is [[ycbcrToRgb]] of
    * them.
    */
  def syntheticBlockY(id: Long, b: Int): Int = (((id * 7 + 16L * b) % 256 + 256) % 256).toInt
  def syntheticBlockCb(id: Long, b: Int): Int = (((id * 11 + 32L * b) % 256 + 256) % 256).toInt
  def syntheticBlockCr(id: Long, b: Int): Int = (((id * 13 + 8L * b) % 256 + 256) % 256).toInt

  /** A REAL baseline JPEG for image `id`: w = 8*(1 + id%4) and
    * h = 8*(1 + id%3) pixels, per-block-constant YCbCr from the
    * closed forms above, 4:4:4, quant 1. Runs the full pipeline —
    * standard-table Huffman, DC prediction across blocks, FDCT/IDCT —
    * yet decodes bit-exactly.
    */
  def jpegPayloadBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val yP = new Array[Int](w * h); val cbP = new Array[Int](w * h)
    val crP = new Array[Int](w * h)
    val wB = (w + 7) / 8
    var p = 0
    while (p < w * h) {
      val b = (p / w / 8) * wB + (p % w / 8)
      yP(p) = syntheticBlockY(id, b)
      cbP(p) = syntheticBlockCb(id, b)
      crP(p) = syntheticBlockCr(id, b)
      p += 1
    }
    encodeYcbcr(w, h, yP, cbP, crP, chromaSub = false, quant = 1,
      restartEvery = 0)
  }

  /** A REAL progressive (SOF2) JPEG for image `id`: same per-block-
    * constant closed forms as [[jpegPayloadBytes]] (caller picks the
    * dims). Constant blocks are DC-only, and progressive DC coding is
    * exact under successive approximation (shift + refinement bit
    * reassemble the value losslessly, AC scans reduce to pure EOB
    * runs), so the multi-scan pipeline — spectral selection, DC/AC
    * first + refinement passes — still decodes bit-exactly and the
    * same closed-form SQL oracle replays it.
    */
  def jpegProgressivePayloadBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val yP = new Array[Int](w * h); val cbP = new Array[Int](w * h)
    val crP = new Array[Int](w * h)
    val wB = (w + 7) / 8
    var p = 0
    while (p < w * h) {
      val b = (p / w / 8) * wB + (p % w / 8)
      yP(p) = syntheticBlockY(id, b)
      cbP(p) = syntheticBlockCb(id, b)
      crP(p) = syntheticBlockCr(id, b)
      p += 1
    }
    encodeProgressiveYcbcr(w, h, yP, cbP, crP, chromaSub = false, quant = 1,
      restartEvery = 0)
  }
}
