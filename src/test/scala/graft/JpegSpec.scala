package graft

import graft.operators.{Jpeg, Multimodal}

/** The JPEG codec spec: the per-block-constant bit-exact contract the
  * SQL oracle relies on, plus fuzz over the full FDCT/Huffman path
  * (which the block-constant images, being DC-only, cannot reach).
  */
class JpegSpec extends SparkSpec {
  import spark.implicits._

  test("block-constant synthetics decode bit-exactly (the oracle contract)") {
    for (id <- Seq(0L, 1L, 5L, 17L, 123L, 9999L)) {
      val w = (8 * (1 + id % 4)).toInt; val h = (8 * (1 + id % 3)).toInt
      val img = Jpeg.decode(Jpeg.jpegPayloadBytes(id, w, h))
        .getOrElse(fail(s"id=$id failed to decode"))
      assert(img.kind == "jpeg" && img.width == w && img.height == h)
      val wB = w / 8
      for (p <- 0 until w * h) {
        val b = (p / w / 8) * wB + (p % w / 8)
        val (r, g, bl) = Jpeg.ycbcrToRgb(
          Jpeg.syntheticBlockY(id, b),
          Jpeg.syntheticBlockCb(id, b),
          Jpeg.syntheticBlockCr(id, b))
        assert((img.rgb(p * 3), img.rgb(p * 3 + 1), img.rgb(p * 3 + 2)) ==
          ((r, g, bl)), s"id=$id pixel $p block $b")
      }
    }
  }

  test("fuzz: arbitrary rasters survive the full FDCT/Huffman round trip") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 150) {
      // non-multiple-of-8 dims exercise edge replication + cropping
      val w = 1 + rnd.nextInt(25)
      val h = 1 + rnd.nextInt(20)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256))
      val sub = rnd.nextBoolean()
      val restart = if (rnd.nextBoolean()) 1 + rnd.nextInt(3) else 0
      val src =
        if (!sub) rgb
        else {
          // with 4:2:0 the chroma box-average is lossy by design; use a
          // constant base color + per-pixel GRAY offset (equal deltas on
          // R,G,B leave Cb/Cr untouched — the BT.601 chroma coefficients
          // sum to zero), so only the luma DCT error remains and the
          // tolerance below stays meaningful
          val base = Array(rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))
          val lo = -base.min; val hi = 255 - base.max
          val d = Array.fill(w * h)(lo + rnd.nextInt(hi - lo + 1))
          Array.tabulate(w * h * 3)(i => base(i % 3) + d(i / 3))
        }
      val enc = Jpeg.encode(w, h, src, chromaSub = sub, quant = 1,
        restartEvery = restart)
      val img = Jpeg.decode(enc).getOrElse(
        fail(s"trial $trial: decode failed (w=$w h=$h sub=$sub rst=$restart)"))
      assert(img.width == w && img.height == h)
      var maxErr = 0
      for (i <- 0 until w * h * 3)
        maxErr = math.max(maxErr, math.abs(img.rgb(i) - src(i)))
      // quant=1 is near-lossless: color-transform rounding (~1.2) +
      // coefficient rounding through the IDCT (~2.7) + final rounding
      assert(maxErr <= 6,
        s"trial $trial: maxErr=$maxErr (w=$w h=$h sub=$sub rst=$restart)")
    }
  }

  test("restart markers: DC prediction resets, block-constant stays exact") {
    val id = 7L; val w = 32; val h = 16 // 4x2 blocks, restart every MCU
    val n = w * h
    val wB = w / 8
    val yP = Array.tabulate(n)(p => Jpeg.syntheticBlockY(id, (p / w / 8) * wB + (p % w / 8)))
    val cbP = Array.tabulate(n)(p => Jpeg.syntheticBlockCb(id, (p / w / 8) * wB + (p % w / 8)))
    val crP = Array.tabulate(n)(p => Jpeg.syntheticBlockCr(id, (p / w / 8) * wB + (p % w / 8)))
    val enc = Jpeg.encodeYcbcr(w, h, yP, cbP, crP, chromaSub = false,
      quant = 1, restartEvery = 1)
    assert(enc.containsSlice(Array(0xFF.toByte, 0xD0.toByte)), "RST0 must be emitted")
    val img = Jpeg.decode(enc).getOrElse(fail("restart decode failed"))
    for (p <- 0 until n) {
      val b = (p / w / 8) * wB + (p % w / 8)
      val (r, g, bl) = Jpeg.ycbcrToRgb(yP(p), cbP(p), crP(p))
      assert((img.rgb(p * 3), img.rgb(p * 3 + 1), img.rgb(p * 3 + 2)) == ((r, g, bl)),
        s"pixel $p block $b")
    }
  }

  test("quantization is honored (quant > 1 still decodes, dims exact)") {
    val rnd = new scala.util.Random(7)
    val w = 24; val h = 16
    val rgb = Array.fill(w * h * 3)(rnd.nextInt(256))
    for (q <- Seq(2, 8, 32)) {
      val img = Jpeg.decode(Jpeg.encode(w, h, rgb, quant = q))
        .getOrElse(fail(s"quant=$q decode failed"))
      assert(img.width == w && img.height == h)
    }
  }

  test("malformed JPEG is data, not an exception") {
    val good = Jpeg.jpegPayloadBytes(3L, 16, 16)
    // every truncation point: None or a clean decode, never a throw
    var i = 0
    while (i < good.length) {
      Jpeg.decode(good.take(i)) // must not throw
      i += math.max(1, good.length / 64)
    }
    // truncation INSIDE the entropy-coded scan must be None (a lost
    // EOI after complete MCU data is tolerated, like real decoders)
    val sosIdx = {
      var j = 2
      while (!((good(j) & 0xFF) == 0xFF && (good(j + 1) & 0xFF) == 0xDA)) j += 1
      j
    }
    assert(Jpeg.decode(good.take(sosIdx + 16)).isEmpty)
    // random single-byte corruption: never a throw
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Jpeg.decode(b) // Some or None both fine; throwing is the bug
    }
    // a baseline stream with the SOF marker flipped to SOF2 is a
    // MALFORMED progressive stream (its scan header says Ss=0,Se=63 —
    // a progressive DC scan must be 0..0): None, not a throw
    val prog = good.clone()
    val sofIdx = {
      var j = 2
      while (!((prog(j) & 0xFF) == 0xFF && (prog(j + 1) & 0xFF) == 0xC0)) j += 1
      j
    }
    prog(sofIdx + 1) = 0xC2.toByte
    assert(Jpeg.decode(prog).isEmpty)
  }

  test("progressive block-constant synthetics decode bit-exactly (oracle contract)") {
    for (id <- Seq(0L, 1L, 5L, 17L, 123L, 9999L)) {
      val w = (8 * (1 + id % 3)).toInt; val h = (8 * (1 + id % 4)).toInt
      val img = Jpeg.decode(Jpeg.jpegProgressivePayloadBytes(id, w, h))
        .getOrElse(fail(s"id=$id failed to decode"))
      assert(img.kind == "jpeg" && img.width == w && img.height == h)
      val wB = w / 8
      for (p <- 0 until w * h) {
        val b = (p / w / 8) * wB + (p % w / 8)
        val (r, g, bl) = Jpeg.ycbcrToRgb(
          Jpeg.syntheticBlockY(id, b),
          Jpeg.syntheticBlockCb(id, b),
          Jpeg.syntheticBlockCr(id, b))
        assert((img.rgb(p * 3), img.rgb(p * 3 + 1), img.rgb(p * 3 + 2)) ==
          ((r, g, bl)), s"id=$id pixel $p block $b")
      }
    }
  }

  test("progressive decodes pixel-identically to baseline (same coefficients)") {
    // both encoders quantize through the shared fdctQuant, so for any
    // input, any quant, any sampling, any restart interval, the decoded
    // rasters must MATCH EXACTLY — this drives every progressive path:
    // DC successive approximation + refinement, split AC bands with
    // EOB runs, AC refinement correction bits, per-scan RSTn markers
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 120) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(32)
      val n = w * h
      val yP = Array.fill(n)(rnd.nextInt(256))
      val cbP = Array.fill(n)(rnd.nextInt(256))
      val crP = Array.fill(n)(rnd.nextInt(256))
      val sub = rnd.nextBoolean()
      val quant = Seq(1, 2, 8, 32)(rnd.nextInt(4))
      val restart = if (rnd.nextBoolean()) 1 + rnd.nextInt(4) else 0
      val base = Jpeg.decode(Jpeg.encodeYcbcr(w, h, yP, cbP, crP,
        chromaSub = sub, quant = quant, restartEvery = restart))
        .getOrElse(fail(s"trial $trial: baseline decode failed"))
      val prog = Jpeg.decode(Jpeg.encodeProgressiveYcbcr(w, h, yP, cbP, crP,
        chromaSub = sub, quant = quant, restartEvery = restart))
        .getOrElse(fail(s"trial $trial: progressive decode failed " +
          s"(w=$w h=$h sub=$sub q=$quant rst=$restart)"))
      assert(prog.width == w && prog.height == h)
      assert(java.util.Arrays.equals(base.rgb, prog.rgb),
        s"trial $trial: progressive != baseline (w=$w h=$h sub=$sub q=$quant rst=$restart)")
    }
  }

  test("malformed progressive JPEG is data, not an exception") {
    val good = Jpeg.jpegProgressivePayloadBytes(3L, 16, 24)
    var i = 0
    while (i < good.length) {
      Jpeg.decode(good.take(i)) // must not throw
      i += math.max(1, good.length / 96)
    }
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 400) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Jpeg.decode(b) // Some or None both fine; throwing is the bug
    }
    // bit-level corruption inside scan data too
    for (_ <- 0 until 200) {
      val b = good.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      Jpeg.decode(b)
    }
  }

  test("decodeImage routes progressive JPEGs (SOF2 signature is plain FFD8)") {
    val img = Multimodal.decodeImage(Jpeg.jpegProgressivePayloadBytes(2L, 16, 8))
    assert(img.exists(_.kind == "jpeg"))
    assert(Multimodal.parseImageMeta(
      Jpeg.jpegProgressivePayloadBytes(5L, 24, 16)) == (("jpeg", 24L, 16L)))
  }

  test("decodeImage routes JPEG payloads; header-only streams stay None") {
    val full = Multimodal.decodeImage(Jpeg.jpegPayloadBytes(2L, 8, 8))
    assert(full.exists(_.kind == "jpeg"))
    // the 51-byte header-only jpegPayload (no scan) must not decode
    val hdr = spark.range(1).toDF("doc_id")
      .select(Multimodal.jpegPayload(
        org.apache.spark.sql.functions.lit(4),
        org.apache.spark.sql.functions.lit(4)).as("b"))
      .head.getAs[Array[Byte]](0)
    assert(Multimodal.decodeImage(hdr).isEmpty)
  }

  test("parseImageMeta reads dims from real encoded JPEGs") {
    val enc = Jpeg.jpegPayloadBytes(5L, 24, 16)
    assert(Multimodal.parseImageMeta(enc) == (("jpeg", 24L, 16L)))
  }
}
