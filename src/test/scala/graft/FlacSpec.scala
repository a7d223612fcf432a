package graft

import graft.operators.Flac

import scala.util.Random

/** FLAC codec properties: lossless round trips across the whole encode
  * surface (stereo assignments, predictors, partition orders, block
  * sizes, wasted bits, degenerate lengths), decode-never-throws under
  * truncation / corruption / hostile headers (the codec-tier
  * discipline), and bit-level pins for the decode-only paths the
  * encoder does not emit (Rice escape partitions, 5-bit-param method,
  * UTF-8 frame numbers past one byte).
  */
class FlacSpec extends SparkSpec {

  private def roundTrip(samples: Array[Int], channels: Int,
      blockSize: Int = 256, stereoMode: String = "independent",
      predictor: String = "fixed", po: Int = 0): Unit = {
    val b = Flac.encodeFlac(samples, channels, 8000, blockSize, stereoMode,
      predictor, po)
    val d = Flac.decodeFlac(b)
    assert(d.isDefined, "decode failed")
    assert(d.get.channels == channels && d.get.sampleRate == 8000)
    assert(d.get.samples.sameElements(samples),
      s"lossless violated (ch=$channels bs=$blockSize $stereoMode $predictor po=$po)")
  }

  test("round trip: 150 random clips over the full encode surface") {
    val rnd = new Random(29)
    val modes = Array("independent", "left_side", "right_side", "mid_side")
    (0 until 150).foreach { i =>
      val channels = 1 + rnd.nextInt(2)
      val frames = rnd.nextInt(700) // includes 0-frame clips
      val samples = Array.fill(frames * channels)(rnd.nextInt(65536) - 32768)
      roundTrip(samples, channels,
        blockSize = Array(16, 64, 192, 256, 576)(rnd.nextInt(5)),
        stereoMode = if (channels == 2) modes(rnd.nextInt(4)) else "independent",
        predictor = if (rnd.nextBoolean()) "lpc" else "fixed",
        po = rnd.nextInt(3))
    }
  }

  test("round trip: smooth ramps (fixed predictors win), constants, wasted bits") {
    // linear ramp -> FIXED order 2 residuals are zero
    roundTrip(Array.tabulate(600)(i => i * 7 - 2100), 1)
    // constant subframes
    roundTrip(Array.fill(300)(1234), 1)
    roundTrip(Array.fill(64)(-32768), 1, blockSize = 16)
    // all samples share 3 low zero bits -> wasted-bits path both ways
    val rnd = new Random(31)
    roundTrip(Array.fill(500)((rnd.nextInt(8192) - 4096) * 8), 1)
    // stereo wasted bits through mid/side
    roundTrip(Array.fill(400)((rnd.nextInt(4096) - 2048) * 4), 2,
      stereoMode = "mid_side")
    // extreme s16 endpoints through every stereo mode (side needs 17 bits)
    for (m <- Seq("independent", "left_side", "right_side", "mid_side"))
      roundTrip(Array.tabulate(128)(i =>
        if (i % 2 == 0) 32767 else -32768), 2, blockSize = 16, stereoMode = m)
  }

  test("truncation at every byte offset never throws, never misdecodes") {
    val samples = Array.tabulate(200)(i => (i * 131 + 7) % 65536 - 32768)
    val b = Flac.encodeFlac(samples, 2, 8000, blockSize = 64,
      stereoMode = "mid_side")
    (0 until b.length).foreach { cut =>
      val t = java.util.Arrays.copyOf(b, cut)
      val d = Flac.decodeFlac(t) // must not throw
      // a truncated stream can only succeed if it still contains every
      // frame — and then it must decode the exact samples
      d.foreach(a => assert(a.samples.sameElements(samples), s"cut=$cut"))
    }
  }

  test("single-byte corruption sweep never throws; CRC/MD5 catch sample damage") {
    val samples = Array.tabulate(150)(i => (i * 977 + 13) % 65536 - 32768)
    val b = Flac.encodeFlac(samples, 1, 8000, blockSize = 64)
    (0 until b.length).foreach { i =>
      val c = b.clone()
      c(i) = (c(i) ^ 0x41).toByte
      Flac.decodeFlac(c) match {
        case None => () // damage detected
        case Some(a) =>
          // only damage OUTSIDE the coded sample path may decode; the
          // samples must still be intact (MD5 would have caught them)
          assert(a.samples.sameElements(samples), s"silent corruption at byte $i")
      }
    }
  }

  test("hostile headers: bad magic, lying sizes, absurd counts, empty") {
    assert(Flac.decodeFlac(Array.emptyByteArray).isEmpty)
    assert(Flac.decodeFlac("fLaX".getBytes("US-ASCII")).isEmpty)
    assert(Flac.decodeFlac("fLaC".getBytes("US-ASCII")).isEmpty)
    val good = Flac.encodeFlac(Array.fill(100)(5), 1, 8000)
    // absurd STREAMINFO total-samples (bytes 4+4+18 .. +22 hold the
    // 36-bit count tail): force huge -> allocation guard must reject
    val hostile = good.clone()
    hostile(4 + 4 + 14) = 0xFF.toByte // top of sample-rate/ch/bps/total packing
    hostile(4 + 4 + 15) = 0xFF.toByte
    hostile(4 + 4 + 16) = 0xFF.toByte
    hostile(4 + 4 + 17) = 0xFF.toByte
    assert(Flac.decodeFlac(hostile).isEmpty, "hostile count must not allocate")
  }

  test("decode-only paths: Rice escape partition and 5-bit-param method") {
    // handcraft a stream via the encoder, then rewrite its single
    // 4-bit-Rice residual as an ESCAPED partition (raw 18-bit) and fix
    // the CRCs — decode must recover the identical samples
    // (simpler: pin the escape machinery on a hand-built bit level is
    // brittle; instead decode a stream built with a private writer)
    val xs = Array(100, -5, 37, 2000, -32768, 32767, 0, 1)
    val b = FlacTestVectors.escapeStream(xs)
    val d = Flac.decodeFlac(b)
    assert(d.isDefined, "escape stream must decode")
    assert(d.get.samples.sameElements(xs), s"${d.get.samples.toSeq}")
  }

  test("UTF-8 frame numbers: clips long enough for multi-byte frame indexes") {
    // 130 frames at blockSize 16 -> frame numbers cross the 1-byte
    // UTF-8 boundary (>= 128)
    val samples = Array.tabulate(16 * 130)(i => (i * 37) % 65536 - 32768)
    roundTrip(samples, 1, blockSize = 16)
  }

  test("graded construct: every id decodes and matches its closed form") {
    import spark.implicits._
    val df = graft.operators.Multimodal.syntheticFlacAudio(
      (0L until 24L).toDF("doc_id"), "doc_id")
    val out = graft.operators.Multimodal
      .audioStats(df, "doc_id", "flac", codec = "flac")
      .collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val channels = 1 + id % 2
      val frames = 40 + id % 60
      assert(r.getLong(1) == channels, s"id=$id channels")
      assert(r.getLong(3) == frames, s"id=$id frames")
      def sum(c: Int) = (0L until frames)
        .map(s => (((id + 7 * s + 3 * c) % 65536 + 65536) % 65536) - 32768).sum
      assert(r.getLong(4) == sum(0), s"id=$id c0_sum")
      if (channels == 2) assert(r.getLong(5) == sum(1), s"id=$id c1_sum")
    }
  }
}

/** Hand-rolled FLAC streams for decode-only paths (escape partitions)
  * — a minimal writer kept in test scope so the production encoder
  * stays honest about what it emits.
  */
object FlacTestVectors {

  def escapeStream(samples: Array[Int]): Array[Byte] = {
    val n = samples.length
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0; var nb = 0
    def wb(v: Long, w: Int): Unit = {
      var i = w - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt; nb += 1
        if (nb == 8) { bits.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    def align(): Unit = if (nb != 0) wb(0L, 8 - nb)
    // STREAMINFO
    wb(0x80L, 8); wb(34L, 24)
    wb(16L, 16); wb(16L, 16) // min/max block = 16 (n must be <= 16 here)
    require(n <= 16, "test vector keeps one short frame")
    wb(0L, 24); wb(0L, 24)
    wb(8000L, 20); wb(0L, 3); wb(15L, 5) // mono, 16 bps
    wb(n.toLong, 36)
    val md = java.security.MessageDigest.getInstance("MD5")
    val raw = new Array[Byte](n * 2)
    samples.indices.foreach { i =>
      raw(2 * i) = samples(i).toByte; raw(2 * i + 1) = (samples(i) >> 8).toByte
    }
    md.digest(raw).foreach(x => wb(x & 0xFFL, 8))
    val header = bits.toByteArray
    out.write(header)
    // one frame, blockSize = n via 8-bit-follows code, method-1 Rice
    // with an ESCAPED (raw 18-bit) single partition over a VERBATIM-
    // free FIXED-0 subframe
    val fb = new java.io.ByteArrayOutputStream()
    cur = 0; nb = 0
    def fwb(v: Long, w: Int): Unit = {
      var i = w - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt; nb += 1
        if (nb == 8) { fb.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    fwb(0x3FFEL, 14); fwb(0L, 1); fwb(0L, 1)
    fwb(6L, 4) // block size: 8-bit follows
    fwb(0L, 4) // sample rate from STREAMINFO
    fwb(0L, 4) // mono
    fwb(4L, 3); fwb(0L, 1) // 16-bit
    fwb(0L, 8) // frame number 0 (UTF-8, 1 byte)
    fwb((n - 1).toLong, 8)
    val headBytes = fb.toByteArray // nb == 0 here (header is aligned)
    fwb(Flac.crc8(headBytes, 0, headBytes.length).toLong, 8)
    // subframe: FIXED order 0, no wasted bits
    fwb(0L, 1); fwb(8L, 6); fwb(0L, 1)
    // residual: method 1 (5-bit params), partition order 0, ESCAPE
    fwb(1L, 2); fwb(0L, 4)
    fwb(0x1FL, 5) // escape code for method 1
    fwb(18L, 5)   // 18 raw bits per sample
    samples.foreach(s => fwb(s.toLong & 0x3FFFF, 18))
    if (nb != 0) fwb(0L, 8 - nb) // align
    val frameNoCrc = fb.toByteArray
    val c16 = Flac.crc16(frameNoCrc, 0, frameNoCrc.length)
    out.write(frameNoCrc)
    out.write((c16 >> 8) & 0xFF); out.write(c16 & 0xFF)
    out.toByteArray
  }
}
