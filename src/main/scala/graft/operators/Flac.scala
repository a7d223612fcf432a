package graft.operators

import graft.operators.Multimodal.DecodedAudio

/** REAL FLAC encode/decode in pure JVM — the lossless entropy-coded
  * tier of the audio codec family (WAV/PCM, G.711, IMA ADPCM live in
  * Multimodal.scala), clean-roomed from the public format spec
  * (RFC 9639 / xiph.org). FLAC is pure-integer end to end — fixed/LPC
  * linear prediction plus Rice-coded residuals — so, like GIF and
  * JPEG before it, it is spec-implementable without codec libraries
  * and the decode is bit-exact by construction.
  *
  * Reference surface note: laygo (the reference) has no media tier at
  * all; this file exists for the 100 TB training-data use case
  * (crawl audio arrives FLAC/WAV far more often than raw PCM).
  *
  * Encoder (the construct side of the graded round trip):
  * STREAMINFO with real MD5 of the unencoded samples, fixed-blocksize
  * frames, per-subframe choice of CONSTANT / FIXED order 0-2 /
  * 2nd-order LPC (a fixed integer predictor with a nonzero shift, to
  * exercise the LPC decode path) / VERBATIM fallback, wasted-bits
  * detection, Rice partitions with per-partition exact-best
  * parameters, all four stereo channel assignments, CRC-8/CRC-16.
  *
  * Decoder: full subframe surface — CONSTANT, VERBATIM, FIXED 0-4,
  * LPC any order 1-32, wasted bits, Rice methods 0/1 with escape
  * partitions, partition orders 0-15, independent/left-side/
  * right-side/mid-side stereo, UTF-8-coded frame numbers, and it
  * VERIFIES CRC-8, CRC-16 and the STREAMINFO MD5. Lenient at the API
  * boundary: any structural damage returns None, never throws
  * (the container-parser discipline; fuzzed in FlacSpec).
  */
object Flac {

  private final class Malformed(msg: String) extends Exception(msg)
  private def bad(msg: String): Nothing = throw new Malformed(msg)

  // ---- CRCs (FLAC frame polynomials) --------------------------------

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame header checksum. */
  private[graft] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — whole-frame checksum. */
  private[graft] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
              else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---- bit I/O (MSB-first, the FLAC bit order) -----------------------

  private final class BitWriter {
    private var buf = new Array[Byte](256)
    private var bytes = 0
    private var cur = 0
    private var nb = 0
    private def push(byteVal: Int): Unit = {
      if (bytes == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      buf(bytes) = byteVal.toByte; bytes += 1
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nb += 1
        if (nb == 8) { push(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBits(0L, 1); i += 1 }
      writeBits(1L, 1)
    }
    def alignByte(): Unit = if (nb != 0) writeBits(0L, 8 - nb)
    def size: Int = bytes
    def toBytes: Array[Byte] = {
      require(nb == 0, "unaligned")
      java.util.Arrays.copyOf(buf, bytes)
    }
  }

  private final class BitReader(b: Array[Byte]) {
    private var pos = 0L // bit cursor
    private val lim = b.length.toLong * 8
    def bitPos: Long = pos
    def bytePos: Int = {
      if ((pos & 7) != 0) bad("unaligned byte read")
      (pos >> 3).toInt
    }
    def remaining: Long = lim - pos
    def readBits(n: Int): Long = {
      if (n == 0) return 0L
      if (pos + n > lim) bad("truncated")
      var v = 0L
      var i = 0
      while (i < n) {
        val bytI = (pos >> 3).toInt
        val bitI = 7 - (pos & 7).toInt
        v = (v << 1) | ((b(bytI) >> bitI) & 1).toLong
        pos += 1
        i += 1
      }
      v
    }
    def readSigned(n: Int): Long = {
      val v = readBits(n)
      if (n == 0) 0L else (v << (64 - n)) >> (64 - n)
    }
    def readUnary(): Int = {
      var q = 0
      while (readBits(1) == 0L) {
        q += 1
        if (q > (1 << 24)) bad("unary run too long") // damage guard
      }
      q
    }
    def alignByte(): Unit = { val r = (pos & 7).toInt; if (r != 0) readBits(8 - r) }
  }

  // ---- UTF-8-style coded numbers (frame/sample number) ---------------

  private def writeUtf8Number(w: BitWriter, n0: Long): Unit = {
    val n = n0
    if (n < 0x80) w.writeBits(n, 8)
    else {
      // count payload bits -> number of continuation bytes
      var cont = 1
      while (cont < 6 && n >= (1L << (6 - cont + 6 * cont))) cont += 1
      // leading byte: cont+1 ones, a zero, then the top payload bits
      val leadPayloadBits = 6 - cont
      val mask = ((1 << (cont + 1)) - 1) << (7 - cont)
      w.writeBits((mask | ((n >>> (6 * cont)) & ((1 << leadPayloadBits) - 1))).toLong & 0xFF, 8)
      var i = cont - 1
      while (i >= 0) {
        w.writeBits(0x80L | ((n >>> (6 * i)) & 0x3F), 8)
        i -= 1
      }
    }
  }

  private def readUtf8Number(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var ones = 0
    while (ones < 8 && ((b0 << ones) & 0x80) != 0) ones += 1
    if (ones < 2 || ones > 7) bad("bad UTF-8 number lead byte")
    val cont = ones - 1
    var v = (b0 & (0xFF >>> (ones + 1))).toLong
    var i = 0
    while (i < cont) {
      val c = r.readBits(8).toInt
      if ((c & 0xC0) != 0x80) bad("bad UTF-8 continuation")
      v = (v << 6) | (c & 0x3F)
      i += 1
    }
    v
  }

  // ---- Rice coding ----------------------------------------------------

  /** Zigzag fold: n>=0 -> 2n, n<0 -> -2n-1 (the FLAC residual mapping). */
  private def fold(n: Long): Long = if (n >= 0) n << 1 else ((-n) << 1) - 1
  private def unfold(u: Long): Long = if ((u & 1) == 0) u >> 1 else -((u >> 1) + 1)

  private def riceCost(res: Array[Long], from: Int, until: Int, p: Int): Long = {
    var bits = 0L
    var i = from
    while (i < until) { bits += (fold(res(i)) >>> p) + 1 + p; i += 1 }
    bits
  }

  private def bestRiceParam(res: Array[Long], from: Int, until: Int): (Int, Long) = {
    var bestP = 0
    var bestC = riceCost(res, from, until, 0)
    var p = 1
    while (p <= 14) {
      val c = riceCost(res, from, until, p)
      if (c < bestC) { bestC = c; bestP = p }
      p += 1
    }
    (bestP, bestC)
  }

  // ---- encoder ---------------------------------------------------------

  private def fixedResidual(xs: Array[Long], order: Int): Array[Long] = {
    val n = xs.length - order
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val j = i + order
      out(i) = order match {
        case 0 => xs(j)
        case 1 => xs(j) - xs(j - 1)
        case 2 => xs(j) - 2 * xs(j - 1) + xs(j - 2)
        case 3 => xs(j) - 3 * xs(j - 1) + 3 * xs(j - 2) - xs(j - 3)
        case 4 => xs(j) - 4 * xs(j - 1) + 6 * xs(j - 2) - 4 * xs(j - 3) + xs(j - 4)
      }
      i += 1
    }
    out
  }

  /** The encoder's LPC predictor: order 2, qlp coefs (4, −2), shift 1 —
    * numerically identical to FIXED order... no: (4·s1 − 2·s2) >> 1 =
    * 2·s1 − s2 exactly (both coefs even), i.e. the FIXED-2 without the
    * +res reorder; chosen because its residuals are well-behaved on
    * smooth synthetics while the DECODE path exercised is the real
    * general LPC machinery (coef read, ×, Σ in long, arithmetic shift).
    */
  private val LpcCoefs = Array(4L, -2L)
  private val LpcShift = 1
  private val LpcPrecision = 4

  private def lpcResidual(xs: Array[Long]): Array[Long] = {
    val order = LpcCoefs.length
    val n = xs.length - order
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val j = i + order
      var acc = 0L
      var k = 0
      while (k < order) { acc += LpcCoefs(k) * xs(j - 1 - k); k += 1 }
      out(i) = xs(j) - (acc >> LpcShift)
      i += 1
    }
    out
  }

  /** Write one residual block (coding method 0, 4-bit Rice params) with
    * the given partition order (caller guarantees divisibility).
    */
  private def writeResidual(w: BitWriter, res: Array[Long], blockSize: Int,
      order: Int, po: Int): Unit = {
    w.writeBits(0L, 2) // coding method 0
    w.writeBits(po.toLong, 4)
    val parts = 1 << po
    val perPart = blockSize >> po
    var part = 0
    var idx = 0
    while (part < parts) {
      val cnt = if (part == 0) perPart - order else perPart
      val (p, _) = bestRiceParam(res, idx, idx + cnt)
      w.writeBits(p.toLong, 4)
      var i = idx
      while (i < idx + cnt) {
        val u = fold(res(i))
        w.writeUnary((u >>> p).toInt)
        if (p > 0) w.writeBits(u & ((1L << p) - 1), p)
        i += 1
      }
      idx += cnt
      part += 1
    }
  }

  private def writeSubframe(w: BitWriter, xs0: Array[Long], bps: Int,
      predictor: String, partitionOrder: Int): Unit = {
    val n = xs0.length
    // wasted bits: k low zero bits common to ALL samples (k>0 only if
    // some sample is nonzero per spec practice; all-zero -> CONSTANT)
    var orAll = 0L
    var i = 0
    while (i < n) { orAll |= xs0(i); i += 1 }
    var allEqual = true
    i = 1
    while (i < n && allEqual) { if (xs0(i) != xs0(0)) allEqual = false; i += 1 }
    if (allEqual) {
      w.writeBits(0L, 1); w.writeBits(0L, 6); w.writeBits(0L, 1) // CONSTANT
      w.writeBits(xs0(0) & ((1L << bps) - 1), bps)
      return
    }
    val wasted = java.lang.Long.numberOfTrailingZeros(orAll)
    val eb = bps - wasted
    val xs = if (wasted == 0) xs0 else xs0.map(_ >> wasted)
    def writeWasted(): Unit =
      if (wasted == 0) w.writeBits(0L, 1)
      else { w.writeBits(1L, 1); var k = 1; while (k < wasted) { w.writeBits(0L, 1); k += 1 }; w.writeBits(1L, 1) }
    // candidate predictors: fixed orders 0-2 (or the LPC), vs verbatim
    val verbatimCost = n.toLong * eb
    def po(order: Int): Int = {
      var p = partitionOrder
      while (p > 0 && (n % (1 << p) != 0 || (n >> p) <= order)) p -= 1
      p
    }
    if (predictor == "lpc" && n > LpcCoefs.length) {
      val order = LpcCoefs.length
      val res = lpcResidual(xs)
      w.writeBits(0L, 1)
      w.writeBits(0x20L | (order - 1).toLong, 6) // LPC, order
      writeWasted()
      i = 0
      while (i < order) { w.writeBits(xs(i) & ((1L << eb) - 1), eb); i += 1 }
      w.writeBits((LpcPrecision - 1).toLong, 4)
      w.writeBits(LpcShift.toLong, 5)
      i = 0
      while (i < order) { w.writeBits(LpcCoefs(i) & ((1L << LpcPrecision) - 1), LpcPrecision); i += 1 }
      writeResidual(w, res, n, order, po(order))
      return
    }
    var bestOrder = -1
    var bestCost = verbatimCost
    var bestRes: Array[Long] = null
    var order = 0
    while (order <= 2) {
      if (n > order) {
        val res = fixedResidual(xs, order)
        var cost = order.toLong * eb
        val parts = 1 << po(order)
        val perPart = n / parts
        var part = 0
        var idx = 0
        while (part < parts) {
          val cnt = if (part == 0) perPart - order else perPart
          cost += bestRiceParam(res, idx, idx + cnt)._2 + 4
          idx += cnt
          part += 1
        }
        if (cost < bestCost) { bestCost = cost; bestOrder = order; bestRes = res }
      }
      order += 1
    }
    if (bestOrder < 0) {
      w.writeBits(0L, 1); w.writeBits(1L, 6) // VERBATIM
      writeWasted()
      i = 0
      while (i < n) { w.writeBits(xs(i) & ((1L << eb) - 1), eb); i += 1 }
    } else {
      w.writeBits(0L, 1)
      w.writeBits((8 + bestOrder).toLong, 6) // FIXED order
      writeWasted()
      i = 0
      while (i < bestOrder) { w.writeBits(xs(i) & ((1L << eb) - 1), eb); i += 1 }
      writeResidual(w, bestRes, n, bestOrder, po(bestOrder))
    }
  }

  private def blockSizeCode(n: Int): (Int, Int, Int) = { // (code, extraBits, extraVal)
    n match {
      case 192 => (1, 0, 0)
      case 576 => (2, 0, 0)
      case 1152 => (3, 0, 0)
      case 2304 => (4, 0, 0)
      case 4608 => (5, 0, 0)
      case _ =>
        var c = 8
        var v = 256
        while (c <= 15) {
          if (n == v) return (c, 0, 0)
          c += 1; v <<= 1
        }
        if (n - 1 <= 0xFF) (6, 8, n - 1) else (7, 16, n - 1)
    }
  }

  /** Encode interleaved s16 samples as a real FLAC stream.
    *
    * @param stereoMode "independent" | "left_side" | "right_side" |
    *                   "mid_side" (stereo input only)
    * @param predictor  "fixed" (best of orders 0-2 per subframe) |
    *                   "lpc" (the order-2 integer LPC)
    * @param partitionOrder requested Rice partition order (reduced per
    *                   subframe until it divides the block)
    */
  def encodeFlac(samples: Array[Int], channels: Int, sampleRate: Int,
      blockSize: Int = 256, stereoMode: String = "independent",
      predictor: String = "fixed", partitionOrder: Int = 0): Array[Byte] = {
    require(channels == 1 || channels == 2, "encoder: 1 or 2 channels")
    require(samples.length % channels == 0, "samples must interleave evenly")
    require(blockSize >= 16 && blockSize <= 65535, "blockSize out of range")
    val bps = 16
    val totalFrames = samples.length / channels
    // MD5 of the unencoded data: interleaved little-endian s16
    val md = java.security.MessageDigest.getInstance("MD5")
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = samples(i).toByte; raw(2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    val md5 = md.digest(raw)
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last metadata block), 34 bytes
    val si = new BitWriter
    si.writeBits(0x80L, 8) // last=1, type=0
    si.writeBits(34L, 24)
    si.writeBits(blockSize.toLong, 16)
    si.writeBits(blockSize.toLong, 16)
    si.writeBits(0L, 24); si.writeBits(0L, 24) // frame sizes unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits((channels - 1).toLong, 3)
    si.writeBits((bps - 1).toLong, 5)
    si.writeBits(totalFrames.toLong, 36)
    i = 0
    while (i < 16) { si.writeBits(md5(i) & 0xFFL, 8); i += 1 }
    out.write(si.toBytes)
    // frames
    var frameIdx = 0L
    var s = 0
    while (s < totalFrames) {
      val n = math.min(blockSize, totalFrames - s)
      val w = new BitWriter
      w.writeBits(0x3FFEL, 14) // sync
      w.writeBits(0L, 1) // reserved
      w.writeBits(0L, 1) // fixed blocksize strategy
      val (bsc, bsExtraBits, bsExtraVal) = blockSizeCode(n)
      w.writeBits(bsc.toLong, 4)
      w.writeBits(0L, 4) // sample rate: from STREAMINFO
      val assign = if (channels == 1) 0
        else stereoMode match {
          case "independent" => 1
          case "left_side"   => 8
          case "right_side"  => 9
          case "mid_side"    => 10
          case other => throw new IllegalArgumentException(s"stereoMode $other")
        }
      w.writeBits(assign.toLong, 4)
      w.writeBits(4L, 3) // sample size: 16-bit
      w.writeBits(0L, 1) // reserved
      writeUtf8Number(w, frameIdx)
      if (bsExtraBits > 0) w.writeBits(bsExtraVal.toLong, bsExtraBits)
      // CRC-8 over the header bytes written so far
      val head = w.toBytes
      w.writeBits(crc8(head, 0, head.length).toLong, 8)
      // channel-decorrelated subframes
      val chans: Array[(Array[Long], Int)] =
        if (channels == 1) {
          val xs = new Array[Long](n)
          var k = 0
          while (k < n) { xs(k) = samples(s + k).toLong; k += 1 }
          Array((xs, bps))
        } else {
          val l = new Array[Long](n); val r = new Array[Long](n)
          var k = 0
          while (k < n) {
            l(k) = samples(2 * (s + k)).toLong
            r(k) = samples(2 * (s + k) + 1).toLong
            k += 1
          }
          assign match {
            case 1 => Array((l, bps), (r, bps))
            case 8 => // left + side(bps+1)
              val side = new Array[Long](n)
              k = 0; while (k < n) { side(k) = l(k) - r(k); k += 1 }
              Array((l, bps), (side, bps + 1))
            case 9 => // side(bps+1) + right
              val side = new Array[Long](n)
              k = 0; while (k < n) { side(k) = l(k) - r(k); k += 1 }
              Array((side, bps + 1), (r, bps))
            case 10 => // mid + side(bps+1)
              val mid = new Array[Long](n); val side = new Array[Long](n)
              k = 0
              while (k < n) {
                mid(k) = (l(k) + r(k)) >> 1; side(k) = l(k) - r(k); k += 1
              }
              Array((mid, bps), (side, bps + 1))
          }
        }
      chans.foreach { case (xs, cbps) =>
        writeSubframe(w, xs, cbps, predictor, partitionOrder)
      }
      w.alignByte()
      val frameNoCrc = w.toBytes
      val c16 = crc16(frameNoCrc, 0, frameNoCrc.length)
      out.write(frameNoCrc)
      out.write((c16 >> 8) & 0xFF); out.write(c16 & 0xFF)
      frameIdx += 1
      s += n
    }
    out.toByteArray
  }

  // ---- decoder ---------------------------------------------------------

  private def readResidual(r: BitReader, blockSize: Int, order: Int,
      res: Array[Long]): Unit = {
    val method = r.readBits(2).toInt
    if (method > 1) bad("reserved residual method")
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val po = r.readBits(4).toInt
    val parts = 1 << po
    if (blockSize % parts != 0) bad("partition order does not divide block")
    val perPart = blockSize / parts
    if (perPart <= order && parts == 1) bad("first partition underflow")
    var part = 0
    var idx = 0
    while (part < parts) {
      val cnt = if (part == 0) perPart - order else perPart
      if (cnt < 0) bad("partition underflow")
      val p = r.readBits(pBits).toInt
      if (p == escape) {
        val nbits = r.readBits(5).toInt
        var i = 0
        while (i < cnt) { res(idx + i) = r.readSigned(nbits); i += 1 }
      } else {
        var i = 0
        while (i < cnt) {
          val q = r.readUnary().toLong
          val rem = if (p > 0) r.readBits(p) else 0L
          res(idx + i) = unfold((q << p) | rem)
          i += 1
        }
      }
      idx += cnt
      part += 1
    }
  }

  private def readSubframe(r: BitReader, n: Int, bps: Int): Array[Long] = {
    if (r.readBits(1) != 0L) bad("subframe pad bit set")
    val tpe = r.readBits(6).toInt
    val hasWasted = r.readBits(1) == 1L
    val wasted = if (hasWasted) 1 + r.readUnary() else 0
    if (wasted >= bps) bad("wasted bits exceed sample size")
    val eb = bps - wasted
    val xs = new Array[Long](n)
    if (tpe == 0) { // CONSTANT
      val v = r.readSigned(eb)
      java.util.Arrays.fill(xs, v)
    } else if (tpe == 1) { // VERBATIM
      var i = 0
      while (i < n) { xs(i) = r.readSigned(eb); i += 1 }
    } else if (tpe >= 8 && tpe <= 12) { // FIXED order 0-4
      val order = tpe - 8
      if (order > n) bad("fixed order exceeds block")
      var i = 0
      while (i < order) { xs(i) = r.readSigned(eb); i += 1 }
      val res = new Array[Long](n - order)
      readResidual(r, n, order, res)
      i = order
      while (i < n) {
        val d = res(i - order)
        xs(i) = order match {
          case 0 => d
          case 1 => d + xs(i - 1)
          case 2 => d + 2 * xs(i - 1) - xs(i - 2)
          case 3 => d + 3 * xs(i - 1) - 3 * xs(i - 2) + xs(i - 3)
          case 4 => d + 4 * xs(i - 1) - 6 * xs(i - 2) + 4 * xs(i - 3) - xs(i - 4)
        }
        i += 1
      }
    } else if (tpe >= 32) { // LPC, order = tpe - 31
      val order = tpe - 31
      if (order > n) bad("lpc order exceeds block")
      var i = 0
      while (i < order) { xs(i) = r.readSigned(eb); i += 1 }
      val precM1 = r.readBits(4).toInt
      if (precM1 == 0xF) bad("invalid qlp precision")
      val prec = precM1 + 1
      val shift = r.readSigned(5).toInt
      if (shift < 0) bad("negative qlp shift")
      val coefs = new Array[Long](order)
      i = 0
      while (i < order) { coefs(i) = r.readSigned(prec); i += 1 }
      val res = new Array[Long](n - order)
      readResidual(r, n, order, res)
      i = order
      while (i < n) {
        var acc = 0L
        var k = 0
        while (k < order) { acc += coefs(k) * xs(i - 1 - k); k += 1 }
        xs(i) = res(i - order) + (acc >> shift)
        i += 1
      }
    } else bad(s"reserved subframe type $tpe")
    if (wasted > 0) {
      var i = 0
      while (i < n) { xs(i) <<= wasted; i += 1 }
    }
    xs
  }

  /** Decode a FLAC stream to interleaved s16 PCM. Returns None on any
    * structural damage (bad magic, CRC mismatch, truncation, reserved
    * codes, MD5 mismatch) — never throws.
    */
  def decodeFlac(b: Array[Byte]): Option[DecodedAudio] = {
    try {
      if (b.length < 4 + 4 + 34) bad("too short")
      if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') bad("magic")
      val r = new BitReader(b)
      r.readBits(32)
      // metadata blocks; STREAMINFO must be first
      var last = r.readBits(1) == 1L
      var btype = r.readBits(7).toInt
      var blen = r.readBits(24).toInt
      if (btype != 0 || blen != 34) bad("missing STREAMINFO")
      val minBlock = r.readBits(16).toInt
      val maxBlock = r.readBits(16).toInt
      if (minBlock < 16 || maxBlock < minBlock) bad("bad block sizes")
      r.readBits(24); r.readBits(24)
      val sampleRate = r.readBits(20).toInt
      if (sampleRate == 0) bad("sample rate 0")
      val channels = r.readBits(3).toInt + 1
      val bps = r.readBits(5).toInt + 1
      if (bps != 16) bad(s"unsupported bps $bps") // s16 contract (decodeWav too)
      val totalSamples = r.readBits(36)
      val md5 = new Array[Byte](16)
      var i = 0
      while (i < 16) { md5(i) = r.readBits(8).toByte; i += 1 }
      while (!last) {
        last = r.readBits(1) == 1L
        btype = r.readBits(7).toInt
        if (btype == 127) bad("invalid metadata block type")
        blen = r.readBits(24).toInt
        if (r.remaining < blen.toLong * 8) bad("truncated metadata")
        var j = 0
        while (j < blen) { r.readBits(8); j += 1 } // skip body
      }
      // hostile-header allocation guard: reject sample counts no real
      // payload in this path carries before allocating anything
      if (totalSamples * channels > (1L << 28)) bad("implausible sample count")
      val outSamples = new Array[Int]((totalSamples * channels).toInt)
      var got = 0L
      var expectFrame = 0L
      while (got < totalSamples) {
        val frameStart = r.bytePos
        if (r.readBits(14) != 0x3FFEL) bad("lost frame sync")
        if (r.readBits(1) != 0L) bad("reserved frame bit")
        val variable = r.readBits(1) == 1L
        val bsc = r.readBits(4).toInt
        val src = r.readBits(4).toInt
        val assign = r.readBits(4).toInt
        val ssc = r.readBits(3).toInt
        if (r.readBits(1) != 0L) bad("reserved frame bit 2")
        val num = readUtf8Number(r)
        if (!variable && num != expectFrame) bad("frame number mismatch")
        val blockSize = bsc match {
          case 0 => bad("reserved block size code")
          case 1 => 192
          case 6 => r.readBits(8).toInt + 1
          case 7 => r.readBits(16).toInt + 1
          case c if c >= 2 && c <= 5 => 576 << (c - 2)
          case c => 256 << (c - 8)
        }
        src match {
          case 0 => ()
          case 12 => r.readBits(8)
          case 13 | 14 => r.readBits(16)
          case 15 => bad("invalid sample rate code")
          case _ => ()
        }
        val frameBps = ssc match {
          case 4 => 16
          case 0 => bps
          case _ => bad(s"unsupported sample size code $ssc")
        }
        // CRC-8 check over header bytes
        val headEnd = r.bytePos
        val hcrc = r.readBits(8).toInt
        if (crc8(b, frameStart, headEnd) != hcrc) bad("frame header CRC-8 mismatch")
        val nch = if (assign <= 7) assign + 1 else 2
        if (nch != channels) bad("frame channel count mismatch")
        if (got + blockSize > totalSamples) bad("frames exceed STREAMINFO total")
        val chans = new Array[Array[Long]](nch)
        var c = 0
        while (c < nch) {
          val cbps = assign match {
            case 8 if c == 1  => frameBps + 1
            case 9 if c == 0  => frameBps + 1
            case 10 if c == 1 => frameBps + 1
            case _            => frameBps
          }
          chans(c) = readSubframe(r, blockSize, cbps)
          c += 1
        }
        r.alignByte()
        val frameEnd = r.bytePos
        val fcrc = r.readBits(16).toInt
        if (crc16(b, frameStart, frameEnd) != fcrc) bad("frame CRC-16 mismatch")
        // undo channel decorrelation
        val base = (got * channels).toInt
        var k = 0
        while (k < blockSize) {
          assign match {
            case 8 => // left/side
              val l = chans(0)(k); val side = chans(1)(k)
              outSamples(base + 2 * k) = l.toInt
              outSamples(base + 2 * k + 1) = (l - side).toInt
            case 9 => // side/right
              val side = chans(0)(k); val rr = chans(1)(k)
              outSamples(base + 2 * k) = (rr + side).toInt
              outSamples(base + 2 * k + 1) = rr.toInt
            case 10 => // mid/side
              val side = chans(1)(k)
              val mid = (chans(0)(k) << 1) | (side & 1)
              outSamples(base + 2 * k) = ((mid + side) >> 1).toInt
              outSamples(base + 2 * k + 1) = ((mid - side) >> 1).toInt
            case _ =>
              var cc = 0
              while (cc < nch) {
                outSamples(base + nch * k + cc) = chans(cc)(k).toInt
                cc += 1
              }
          }
          k += 1
        }
        got += blockSize
        expectFrame += 1
      }
      // MD5 end-to-end check (all-zero md5 = unknown, skipped per spec)
      var md5Known = false
      i = 0
      while (i < 16) { if (md5(i) != 0) md5Known = true; i += 1 }
      if (md5Known) {
        val raw = new Array[Byte](outSamples.length * 2)
        i = 0
        while (i < outSamples.length) {
          raw(2 * i) = outSamples(i).toByte
          raw(2 * i + 1) = (outSamples(i) >> 8).toByte
          i += 1
        }
        val got5 = java.security.MessageDigest.getInstance("MD5").digest(raw)
        if (!java.util.Arrays.equals(got5, md5)) bad("MD5 mismatch")
      }
      Some(DecodedAudio(channels, sampleRate, outSamples))
    } catch {
      case _: Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: IllegalArgumentException => None
    }
  }
}
