package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private val media = Seq(
    (1L, bytes(0x89, 0x50, 0x4E, 0x47, 1, 2, 3)),            // png magic
    (2L, bytes(0xFF, 0xD8, 0xFF, 0xE0, 9, 9)),               // jpeg magic
    (3L, bytes(0x52, 0x49, 0x46, 0x46, 0, 0)),               // riff magic
    (4L, "plain text payload".getBytes("UTF-8"))
  ).toDF("id", "payload")

  test("sniffKind recognizes container magic bytes in the scan stage") {
    val kinds = media.select(col("id"), Multimodal.sniffKind(col("payload")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds == Map(1L -> "png", 2L -> "jpeg", 3L -> "riff", 4L -> "unknown"))
  }

  test("mediaMeta carries kind, size, and content checksum") {
    val m = media.select(col("id"), Multimodal.mediaMeta(col("payload")).as("meta"))
      .select(col("id"), col("meta.kind"), col("meta.n_bytes"), col("meta.checksum"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(m.contains((1L, "png", 7L)))
    assert(m.contains((4L, "unknown", 18L)))
  }

  test("extractFeatures: partition-parallel decode plumbing with stable schema") {
    val out = Multimodal.extractFeatures(media, "id", "payload", featureDim = 4)
    assert(out.schema.fieldNames.toSeq == Seq("id", "kind", "n_bytes", "feature"))
    val rows = out.collect()
    assert(rows.length == 4)
    val png = rows.find(_.getLong(0) == 1L).get
    assert(png.getString(1) == "png")
    assert(png.getLong(2) == 7L)
    assert(png.getSeq[Float](3).length == 4)
  }

  test("decode stub is deterministic (same bytes, same features)") {
    val a = Multimodal.decodeStub("payload".getBytes, 4)
    val b = Multimodal.decodeStub("payload".getBytes, 4)
    assert(a._1 == b._1 && a._2.toSeq == b._2.toSeq)
  }

  test("frameSample yields n evenly spaced deterministic positions") {
    val df = Seq((1L, Array.fill(100)(7.toByte))).toDF("id", "payload")
    val frames = Multimodal.frameSample(df, "id", "payload", 4).collect()
      .map(r => (r.getAs[Long]("frame_idx"), r.getAs[Long]("frame_pos"))).sorted
    assert(frames.toSeq == Seq((0L, 0L), (1L, 25L), (2L, 50L), (3L, 75L)))
  }

  test("parseImageMeta reads real PNG IHDR dimensions") {
    // genuine header bytes of a 1920x1080 RGBA PNG (signature + IHDR)
    val png = bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x07, 0x80,   // width  1920
      0x00, 0x00, 0x04, 0x38,   // height 1080
      0x08, 0x06, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00)
    assert(Multimodal.parseImageMeta(png) == ("png", 1920L, 1080L))
    // truncated past the magic: kind survives, dims do not
    assert(Multimodal.parseImageMeta(png.take(10)) == ("png", 0L, 0L))
  }

  test("parseImageMeta walks JPEG markers to SOF (baseline and progressive)") {
    def seg(marker: Int, payload: Int*): Seq[Int] =
      Seq(0xFF, marker, (payload.length + 2) >> 8, (payload.length + 2) & 0xFF) ++ payload
    val dims = Seq(0x08, 0x01, 0x00, 0x02, 0x80, 0x03) // prec, h=256, w=640, 3 comps
    // SOF0 after APP0 + COM + DQT — the walk must skip by lengths
    val baseline = bytes((Seq(0xFF, 0xD8) ++
      seg(0xE0, 0x4A, 0x46, 0x49, 0x46, 0x00) ++
      seg(0xFE, 0x68, 0x69) ++
      seg(0xDB, 0x00, 0x01, 0x02) ++
      seg(0xC0, dims: _*) ++ Seq(0xFF, 0xD9)): _*)
    assert(Multimodal.parseImageMeta(baseline) == ("jpeg", 640L, 256L))
    // progressive (SOF2 = 0xC2) parses identically
    val progressive = bytes((Seq(0xFF, 0xD8) ++
      seg(0xE1, 0x45, 0x78, 0x69, 0x66) ++
      seg(0xC2, dims: _*)): _*)
    assert(Multimodal.parseImageMeta(progressive) == ("jpeg", 640L, 256L))
    // DHT (C4) is NOT a frame header and must be skipped, not parsed
    val withDht = bytes((Seq(0xFF, 0xD8) ++
      seg(0xC4, 0x00, 0x11, 0x22, 0x33, 0x44, 0x55) ++
      seg(0xC0, dims: _*)): _*)
    assert(Multimodal.parseImageMeta(withDht) == ("jpeg", 640L, 256L))
    // EOI before any SOF: jpeg kind, no dims; garbage: unknown
    assert(Multimodal.parseImageMeta(bytes(0xFF, 0xD8, 0xFF, 0xD9)) == ("jpeg", 0L, 0L))
    assert(Multimodal.parseImageMeta("not an image".getBytes) == ("unknown", 0L, 0L))
  }

  test("constructed payloads round-trip through imageMeta (the query contract)") {
    val df = Seq((2L, 800, 600), (3L, 33, 47)).toDF("id", "w", "h")
      .select(col("id"),
        when(col("id") % 2 === 0, Multimodal.pngPayload(col("w"), col("h")))
          .otherwise(Multimodal.jpegPayload(col("w"), col("h"))).as("payload"))
    val out = Multimodal.imageMeta(df, "id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out == Set((2L, "png", 800L, 600L, 33L), (3L, "jpeg", 33L, 47L, 51L)))
  }

  test("parseImageMeta: BMP and PPM headers (the containers the decoder knows)") {
    // BMP dims from the LE i32 fields; negative (top-down) height
    // reports its magnitude
    val bmp = Multimodal.encodeBmp(7, 3, Array.fill(7 * 3 * 3)(0))
    assert(Multimodal.parseImageMeta(bmp) == (("bmp", 7L, 3L)))
    val topDown = bmp.clone()
    topDown(22) = (-3).toByte; topDown(23) = 0xFF.toByte
    topDown(24) = 0xFF.toByte; topDown(25) = 0xFF.toByte
    assert(Multimodal.parseImageMeta(topDown) == (("bmp", 7L, 3L)))
    // PPM P6 with a comment between the magic and the dims
    val ppm = ("P6\n# a comment\n12 34\n255\n").getBytes("UTF-8") ++
      Array.fill(12 * 34 * 3)(0.toByte)
    assert(Multimodal.parseImageMeta(ppm) == (("ppm", 12L, 34L)))
    // truncated headers degrade to dims 0, never throw
    assert(Multimodal.parseImageMeta("BM".getBytes) == (("bmp", 0L, 0L)))
    assert(Multimodal.parseImageMeta("P6 #".getBytes) == (("ppm", 0L, 0L)))
  }

  test("decodeImage: BMP bottom-up and top-down storage yield the same logical raster") {
    val id = 42L; val w = 5; val h = 3
    val bottomUp = Multimodal.bmpPayloadBytes(id, w, h)
    val up = Multimodal.decodeImage(bottomUp).get
    assert(up.kind == "bmp" && up.width == w && up.height == h)
    // logical pixel p channel c must equal the synthetic formula —
    // proves the decoder undid the bottom-up flip AND the BGR order
    for (p <- 0 until w * h; c <- 0 until 3)
      assert(up.rgb(p * 3 + c) == Multimodal.syntheticPixel(id, p, c),
        s"pixel $p channel $c")
    // craft the TOP-DOWN variant of the same image: negate height,
    // store rows in logical order; decode must be identical
    val topDown = bottomUp.clone()
    val negH = -h
    topDown(22) = negH.toByte; topDown(23) = (negH >> 8).toByte
    topDown(24) = (negH >> 16).toByte; topDown(25) = (negH >> 24).toByte
    val stride = (w * 3 + 3) & ~3
    for (y <- 0 until h; i <- 0 until stride)
      topDown(54 + y * stride + i) = bottomUp(54 + (h - 1 - y) * stride + i)
    val down = Multimodal.decodeImage(topDown).get
    assert(down.rgb.toSeq == up.rgb.toSeq, "top-down decode differs from bottom-up")
  }

  test("decodeImage: PPM P6 with header comment; malformed payloads are None") {
    val id = 7L; val w = 4; val h = 6
    val img = Multimodal.decodeImage(Multimodal.ppmPayloadBytes(id, w, h)).get
    assert(img.kind == "ppm" && img.width == w && img.height == h)
    for (p <- 0 until w * h; c <- 0 until 3)
      assert(img.rgb(p * 3 + c) == Multimodal.syntheticPixel(id, p, c))
    // malformed class: None, never a throw
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeImage("not an image at all".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Multimodal.bmpPayloadBytes(1L, 4, 4).take(40)).isEmpty)
    assert(Multimodal.decodeImage("P6\n4 4\n255".getBytes).isEmpty) // truncated pixels
    assert(Multimodal.decodeImage("P6\n4 4\n65535\n".getBytes).isEmpty) // 16-bit maxval
    // fuzz: random byte soup must decode to None or a valid raster
    val rnd = new scala.util.Random(4242)
    for (_ <- 0 until 200) {
      val soup = Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte)
      soup.take(2) match {
        case _ => Multimodal.decodeImage(soup) // must not throw
      }
    }
  }

  test("pixelStats: weighted sums catch a row-order bug plain sums would miss") {
    // decode a 1-image frame and check both sum families against the
    // closed form the oracle uses
    val df = Seq(Tuple1(10L)).toDF("doc_id")
    val out = Multimodal.pixelStats(
      Multimodal.syntheticImages(df, "doc_id"), "doc_id", "img").collect().head
    val id = 10L; val w = (2 + id % 7).toInt; val h = (2 + id % 5).toInt; val n = w * h
    def sum(c: Int) = (0 until n).map(p => Multimodal.syntheticPixel(id, p, c).toLong).sum
    def wsum(c: Int) = (0 until n).map(p => (p + 1L) * Multimodal.syntheticPixel(id, p, c)).sum
    assert(out.getString(1) == "bmp" && out.getLong(2) == w && out.getLong(3) == h)
    assert((out.getLong(5), out.getLong(6), out.getLong(7)) == ((sum(0), sum(1), sum(2))))
    assert((out.getLong(8), out.getLong(9), out.getLong(10)) == ((wsum(0), wsum(1), wsum(2))))
    // null payload through the full operator: unknown row, no throw
    val withNull = Seq((1L, Array[Byte](1, 2, 3)), (2L, null))
      .toDF("doc_id", "img")
    val rows = Multimodal.pixelStats(withNull, "doc_id", "img").collect()
    assert(rows.forall(_.getString(1) == "unknown"))
  }

  test("decodePng: full inflate+unfilter round trip, every filter type") {
    // h = 7 rows with filter (id+y) mod 5 ⇒ all five filter types
    // appear inside ONE image; pixels must come back exactly
    val id = 3L; val w = 5; val h = 7
    val png = Multimodal.pngPayloadBytes(id, w, h)
    val img = Multimodal.decodeImage(png).get
    assert(img.kind == "png" && img.width == w && img.height == h)
    for (p <- 0 until w * h; c <- 0 until 3)
      assert(img.rgb(p * 3 + c) == Multimodal.syntheticPixel(id, p, c),
        s"pixel $p channel $c mis-decoded")
  }

  test("decodePng: corruption is data — bad CRC, truncation, bad filter") {
    val png = Multimodal.pngPayloadBytes(7L, 4, 4)
    assert(Multimodal.decodeImage(png).isDefined)
    // flip one IDAT payload byte: chunk CRC must catch it
    val corrupt = png.clone()
    corrupt(45) = (corrupt(45) ^ 0x01).toByte
    assert(Multimodal.decodeImage(corrupt).isEmpty, "CRC verify must reject")
    // truncate mid-IDAT
    assert(Multimodal.decodeImage(png.take(png.length - 20)).isEmpty)
    // header-only PNG (multimodal_meta's placeholder-CRC payload): None
    val headerOnly = spark.range(1).select(
      Multimodal.pngPayload(lit(4), lit(4)).as("b")).collect().head.getAs[Array[Byte]](0)
    assert(Multimodal.decodeImage(headerOnly).isEmpty)
  }

  test("pixelStats over synthetic PNGs matches the closed-form oracle") {
    val df = Seq(Tuple1(11L), Tuple1(24L), Tuple1(102L)).toDF("doc_id")
    val rows = Multimodal.pixelStats(
      Multimodal.syntheticPngImages(df, "doc_id"), "doc_id", "img").collect()
    rows.foreach { out =>
      val id = out.getLong(0)
      val w = (2 + id % 6).toInt; val h = (2 + id % 5).toInt; val n = w * h
      def sum(c: Int) = (0 until n).map(p => Multimodal.syntheticPixel(id, p, c).toLong).sum
      def wsum(c: Int) = (0 until n).map(p => (p + 1L) * Multimodal.syntheticPixel(id, p, c)).sum
      assert(out.getString(1) == "png" && out.getLong(2) == w && out.getLong(3) == h)
      assert((out.getLong(5), out.getLong(6), out.getLong(7)) == ((sum(0), sum(1), sum(2))))
      assert((out.getLong(8), out.getLong(9), out.getLong(10)) == ((wsum(0), wsum(1), wsum(2))))
    }
  }

  test("decodeWav: RIFF chunk walk, mono and stereo s16le round trip") {
    for (id <- Seq(4L, 7L)) { // even = mono, odd = stereo
      val ch = (1 + id % 2).toInt; val frames = 10
      val wav = Multimodal.wavPayloadBytes(id, frames, ch)
      val a = Multimodal.decodeWav(wav).get
      assert(a.channels == ch && a.sampleRate == 8000)
      assert(a.samples.length == frames * ch)
      for (s <- 0 until frames; c <- 0 until ch)
        assert(a.samples(s * ch + c) == Multimodal.syntheticSample(id, s, c))
    }
    // negative samples survive the sign extension
    assert(Multimodal.syntheticSample(0L, 0, 0) == -32768)
    val a0 = Multimodal.decodeWav(Multimodal.wavPayloadBytes(0L, 3, 1)).get
    assert(a0.samples(0) == -32768)
  }

  test("decodeWav: malformed audio is data, not an exception") {
    val wav = Multimodal.wavPayloadBytes(3L, 8, 2)
    assert(Multimodal.decodeWav(wav.take(30)).isEmpty)            // truncated header
    assert(Multimodal.decodeWav(wav.take(wav.length - 4)).isEmpty) // truncated data
    val nonPcm = wav.clone(); nonPcm(20) = 3                       // IEEE-float format tag
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
    assert(Multimodal.decodeWav("RIFFxxxxAVI LIST".getBytes).isEmpty) // not WAVE
  }

  test("audioStats matches the closed-form oracle for mono and stereo") {
    val rows = Multimodal.audioStats(
      Multimodal.syntheticAudio(Seq(Tuple1(6L), Tuple1(13L)).toDF("doc_id"), "doc_id"),
      "doc_id", "wav").collect()
    rows.foreach { out =>
      val id = out.getLong(0)
      val ch = (1 + id % 2).toInt; val n = (40 + id % 60).toInt
      def sum(c: Int) = if (c >= ch) 0L
        else (0 until n).map(s => Multimodal.syntheticSample(id, s, c).toLong).sum
      def wsum(c: Int) = if (c >= ch) 0L
        else (0 until n).map(s => (s + 1L) * Multimodal.syntheticSample(id, s, c)).sum
      assert(out.getLong(1) == ch && out.getLong(2) == 8000L && out.getLong(3) == n)
      assert((out.getLong(4), out.getLong(5)) == ((sum(0), sum(1))))
      assert((out.getLong(6), out.getLong(7)) == ((wsum(0), wsum(1))))
    }
  }

  test("decodeAviFrames: frame-exact extraction, bottom-up BGR, stride pad") {
    val id = 9L; val w = 5; val h = 3; val n = 4 // w=5 -> padded stride
    val frames = Multimodal.decodeAviFrames(
      Multimodal.aviPayloadBytes(id, w, h, n)).get
    assert(frames.length == n)
    frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.width == w && img.height == h)
      for (p <- 0 until w * h; c <- 0 until 3)
        assert(img.rgb(p * 3 + c) == Multimodal.syntheticVideoPixel(id, f, p, c),
          s"frame $f pixel $p channel $c")
    }
  }

  test("decodeAviFrames: malformed video is data, not an exception") {
    val avi = Multimodal.aviPayloadBytes(5L, 4, 4, 3)
    assert(Multimodal.decodeAviFrames(avi.take(60)).isEmpty)  // truncated
    val compressed = avi.clone()
    // strf biCompression lives after 'strf' len + 16 bytes; flip it
    val strfOff = avi.indexOfSlice("strf".getBytes)
    compressed(strfOff + 8 + 16) = 1 // BI_RLE8
    assert(Multimodal.decodeAviFrames(compressed).isEmpty)
    assert(Multimodal.decodeAviFrames("RIFFxxxxWAVEfmt ".getBytes).isEmpty)
  }

  test("videoFrameStats explodes one row per frame, oracle closed form") {
    val rows = Multimodal.videoFrameStats(
      Multimodal.syntheticVideos(Seq(Tuple1(7L), Tuple1(10L)).toDF("doc_id"), "doc_id"),
      "doc_id", "avi").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc(7L).length == (2 + 7 % 4) && byDoc(10L).length == (2 + 10 % 4))
    rows.foreach { out =>
      val id = out.getLong(0); val f = out.getLong(1).toInt
      val w = (2 + id % 5).toInt; val h = (2 + id % 3).toInt; val n = w * h
      def sum(c: Int) = (0 until n).map(p =>
        Multimodal.syntheticVideoPixel(id, f, p, c).toLong).sum
      def wsum(c: Int) = (0 until n).map(p =>
        (p + 1L) * Multimodal.syntheticVideoPixel(id, f, p, c)).sum
      assert(out.getLong(2) == w && out.getLong(3) == h)
      assert((out.getLong(4), out.getLong(5), out.getLong(6)) == ((sum(0), sum(1), sum(2))))
      assert((out.getLong(7), out.getLong(8), out.getLong(9)) == ((wsum(0), wsum(1), wsum(2))))
    }
  }

  test("decodePng: RGBA (color type 6) decodes with alpha dropped") {
    // hand-build a 2x2 RGBA PNG, filter 0 rows: pixel p has
    // rgb = (10p, 10p+1, 10p+2), alpha = 200+p (must be dropped)
    val w = 2; val h = 2
    val raw = new Array[Byte]((w * 4 + 1) * h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = y * w + x
      val off = y * (w * 4 + 1) + 1 + x * 4
      raw(off) = (10 * p).toByte; raw(off + 1) = (10 * p + 1).toByte
      raw(off + 2) = (10 * p + 2).toByte; raw(off + 3) = (200 + p).toByte
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](1024)
    while (!defl.finished()) buf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunk(t: String, d: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] =
        Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      out.write(be32(d.length.toLong)); out.write(t.getBytes("US-ASCII"))
      out.write(d)
      val crc = new java.util.zip.CRC32()
      crc.update(t.getBytes("US-ASCII")); crc.update(d)
      out.write(be32(crc.getValue))
    }
    val ihdr = Array[Byte](0, 0, 0, w.toByte, 0, 0, 0, h.toByte, 8, 6, 0, 0, 0)
    chunk("IHDR", ihdr); chunk("IDAT", buf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    val img = Multimodal.decodeImage(out.toByteArray).get
    assert(img.width == w && img.height == h)
    for (p <- 0 until w * h; c <- 0 until 3)
      assert(img.rgb(p * 3 + c) == 10 * p + c, s"pixel $p channel $c")
  }

  test("decode operators tolerate empty and degenerate inputs") {
    val empty = spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
      .select(col("doc_id"))
    assert(Multimodal.pixelStats(
      Multimodal.syntheticPngImages(empty, "doc_id"), "doc_id", "img").count() == 0)
    assert(Multimodal.audioStats(
      Multimodal.syntheticAudio(empty, "doc_id"), "doc_id", "wav").count() == 0)
    assert(Multimodal.videoFrameStats(
      Multimodal.syntheticVideos(empty, "doc_id"), "doc_id", "avi").count() == 0)
    // garbage payloads: stats rows degrade, frame rows vanish, no throw
    val junk = Seq((1L, Array[Byte](1, 2, 3, 4)), (2L, null))
      .toDF("doc_id", "bin")
    assert(Multimodal.audioStats(junk, "doc_id", "bin")
      .collect().forall(_.getLong(1) == 0L))
    assert(Multimodal.videoFrameStats(junk, "doc_id", "bin").count() == 0)
  }

  test("fuzz: arbitrary rasters round-trip through PNG encode/decode") {
    // 150 random (dims, content, filter-choice) cases — the decoder
    // must invert the encoder for content with no structure at all,
    // not just the closed-form synthetic images
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 150) {
      val w = 1 + rnd.nextInt(12); val h = 1 + rnd.nextInt(12)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256))
      val filters = Array.fill(h)(rnd.nextInt(5))
      val png = Multimodal.encodePng(w, h, rgb, y => filters(y))
      val img = Multimodal.decodeImage(png)
        .getOrElse(fail(s"trial $trial: failed to decode w=$w h=$h filters=${filters.toSeq}"))
      assert(img.width == w && img.height == h)
      assert(img.rgb.sameElements(rgb),
        s"trial $trial: pixel mismatch w=$w h=$h filters=${filters.toSeq}")
    }
  }

  test("fuzz: arbitrary PCM clips round-trip through WAV encode/decode") {
    val rnd = new scala.util.Random(8138102L)
    for (trial <- 0 until 150) {
      val ch = 1 + rnd.nextInt(4)
      val frames = 1 + rnd.nextInt(200)
      val samples = Array.fill(frames * ch)(rnd.nextInt(65536) - 32768)
      val rate = 1 + rnd.nextInt(48000)
      val wav = Multimodal.encodeWav(samples, ch, rate)
      val a = Multimodal.decodeWav(wav)
        .getOrElse(fail(s"trial $trial: failed to decode ch=$ch frames=$frames"))
      assert(a.channels == ch && a.sampleRate == rate)
      assert(a.samples.sameElements(samples),
        s"trial $trial: sample mismatch ch=$ch frames=$frames")
    }
  }

  test("utf8 payload round-trips through binary column") {
    val df = Seq((1L, "héllo wörld")).toDF("id", "text")
    val back = df.select(decode(Multimodal.utf8Payload(col("text")), "UTF-8").as("t"))
      .collect().head.getString(0)
    assert(back == "héllo wörld")
  }

  private def putBE32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >> 24).toByte; b(off + 1) = (v >> 16).toByte
    b(off + 2) = (v >> 8).toByte; b(off + 3) = v.toByte
  }
  private def putLE32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }
  private def readLE32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  test("decodePng: CRC-valid header claiming absurd dims is data, not an OOM") {
    // a real tiny PNG whose IHDR is patched to claim 100000x100000 with
    // a RECOMPUTED (valid) CRC: the decoder must reject on the
    // dims-vs-IDAT plausibility check before allocating anything
    val big = Multimodal.encodePng(2, 2, Array.fill(12)(0), _ => 0).clone()
    putBE32(big, 16, 100000); putBE32(big, 20, 100000)
    val crc = new java.util.zip.CRC32()
    crc.update(big, 12, 17) // IHDR type + 13 data bytes
    putBE32(big, 29, crc.getValue.toInt)
    assert(Multimodal.decodeImage(big).isEmpty)
    // and dims whose rowBytes*h overflows Int entirely
    val huge = Multimodal.encodePng(2, 2, Array.fill(12)(0), _ => 0).clone()
    putBE32(huge, 16, 0x7FFFFFF0); putBE32(huge, 20, 0x7FFFFFF0)
    val crc2 = new java.util.zip.CRC32()
    crc2.update(huge, 12, 17)
    putBE32(huge, 29, crc2.getValue.toInt)
    assert(Multimodal.decodeImage(huge).isEmpty)
  }

  test("decodeAviFrames: avih dims that overflow Int arithmetic are data") {
    val avi = Multimodal.aviPayloadBytes(5L, 4, 4, 2).clone()
    val avihOff = avi.indexOfSlice("avih".getBytes) + 8
    putLE32(avi, avihOff + 32, 46341) // 46341^2 * 3 > Int.MaxValue
    putLE32(avi, avihOff + 36, 46341)
    assert(Multimodal.decodeAviFrames(avi).isEmpty) // None, not a throw
  }

  test("decodeAviFrames: a second audio stream must not clobber the video format") {
    val id = 3L; val w = 4; val h = 3; val n = 2
    val base = Multimodal.aviPayloadBytes(id, w, h, n)
    def chunk(t: String, d: Array[Byte]): Array[Byte] = {
      val hdr = new Array[Byte](8)
      System.arraycopy(t.getBytes("US-ASCII"), 0, hdr, 0, 4)
      putLE32(hdr, 4, d.length)
      hdr ++ d ++ (if (d.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    }
    // audio strl: strh fccType 'auds', then a 20-byte WAVEFORMATEX-ish
    // strf whose byte 14 (wBitsPerSample) = 16 — the bytes that used to
    // masquerade as a 16-bit video format and poison the decode
    val audioStrf = new Array[Byte](20); audioStrf(14) = 16
    val strl = {
      val body = chunk("strh", "auds".getBytes("US-ASCII") ++ new Array[Byte](52)) ++
        chunk("strf", audioStrf)
      val hdr = new Array[Byte](12)
      System.arraycopy("LIST".getBytes("US-ASCII"), 0, hdr, 0, 4)
      putLE32(hdr, 4, body.length + 4)
      System.arraycopy("strl".getBytes("US-ASCII"), 0, hdr, 8, 4)
      hdr ++ body
    }
    // splice the audio strl at the end of the hdrl LIST body, fixing
    // the hdrl and RIFF lengths
    val hIdx = base.indexOfSlice("hdrl".getBytes)
    val hdrlLen = readLE32(base, hIdx - 4)
    val insertAt = hIdx + 4 + (hdrlLen - 4)
    val out = base.take(insertAt) ++ strl ++ base.drop(insertAt)
    putLE32(out, hIdx - 4, hdrlLen + strl.length)
    putLE32(out, 4, readLE32(base, 4) + strl.length)
    val frames = Multimodal.decodeAviFrames(out)
      .getOrElse(fail("multi-stream AVI must still decode its video track"))
    assert(frames.length == n)
    for ((img, f) <- frames.zipWithIndex; p <- 0 until w * h; c <- 0 until 3)
      assert(img.rgb(p * 3 + c) == Multimodal.syntheticVideoPixel(id, f, p, c))
  }

  test("dHash: a PNG and a BMP of the SAME raster collide exactly") {
    val (w, h) = (19, 17)
    val rgb = Array.tabulate(w * h * 3)(i => Multimodal.syntheticPixel(11L, i / 3, i % 3))
    val png = Multimodal.encodePng(w, h, rgb, y => y % 5)
    val bmp = Multimodal.encodeBmp(w, h, rgb)
    val hPng = Multimodal.dHash64(Multimodal.decodeImage(png).get)
    val hBmp = Multimodal.dHash64(Multimodal.decodeImage(bmp).get)
    assert(hPng == hBmp, s"cross-format dHash mismatch: $hPng != $hBmp")
    // and a STRUCTURALLY different raster does not collide (a mere
    // constant brightness shift would: dHash is difference-based,
    // invariant to uniform shifts away from wraparound — the point
    // of a perceptual hash)
    val rgb2 = Array.tabulate(w * h * 3)(i => (11 + 7 * (i / 3) + i % 3) % 256)
    val hOther = Multimodal.dHash64(Multimodal.decodeImage(Multimodal.encodeBmp(w, h, rgb2)).get)
    assert(hOther != hPng)
  }

  test("dHash: the planted one-pixel perturbation flips at most 2 bits") {
    import spark.implicits._
    // ids 0 and 6 share raster key 6? no - key = id % 37: use ids 3 and 40
    // (key 3, id 3 perturbed % 3 == 0, id 40 not) encoded PNG/BMP resp.
    val dh = Multimodal.imageDHash(
      Multimodal.syntheticNearDupImages(Seq(3L, 40L).toDF("doc_id"), "doc_id"),
      "doc_id", "img").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ham = java.lang.Long.bitCount(dh(3L) ^ dh(40L))
    assert(ham <= 2, s"perturbation moved $ham bits")
  }

  test("image_phash_neardup pipeline: cross-format copies pair at Hamming 0") {
    import spark.implicits._
    // ids 1 and 38 share key 1 (neither perturbed), BMP vs PNG
    val pairs = graft.operators.Dedup.hashNearDups(
      Multimodal.imageDHash(
        Multimodal.syntheticNearDupImages(Seq(1L, 38L, 2L).toDF("doc_id"), "doc_id"),
        "doc_id", "img"),
      "doc_id", "dhash", 3).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 38L, 0L)), s"got ${pairs.toSeq}")
  }

  test("videoFrameDHash: frames sharing a raster key collide ACROSS videos") {
    import spark.implicits._
    // nKeys = 37: video 1 frame 0 has key 1; video 38 frame 0 has key
    // 38 % 37 = 1 — same raster, neither slot perturbed ((1+0) % 3 != 0,
    // (38+0) % 3 != 0) ⇒ identical dHash; video 2 frame 0 (key 2) differs
    val dh = Multimodal.videoFrameDHash(
      Multimodal.syntheticNearDupVideos(Seq(1L, 38L, 2L).toDF("doc_id"), "doc_id", 37),
      "doc_id", "avi").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(dh((1L, 0L)) == dh((38L, 0L)), "shared-key frames must hash equal")
    assert(dh((1L, 0L)) != dh((2L, 0L)), "different keys must differ")
    // a PERTURBED slot ((2+1) % 3 == 0, key 3) vs a clean slot with the
    // same key ((1+2) % 3 == 0 is perturbed too — use video 40 frame 0:
    // key 3, (40+0) % 3 != 0 clean): planted near-dup at Hamming ≤ 2
    val dh2 = Multimodal.videoFrameDHash(
      Multimodal.syntheticNearDupVideos(Seq(2L, 40L).toDF("doc_id"), "doc_id", 37),
      "doc_id", "avi").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ham = java.lang.Long.bitCount(dh2((2L, 1L)) ^ dh2((40L, 0L)))
    assert(ham <= 2, s"perturbation moved $ham bits (guarantee is <= 2; " +
      "0 is legitimate when the nudged cell mean stays on its side of " +
      "both neighboring comparisons)")
  }

  test("audioFingerprint: WAV and FLAC re-encodings of the same PCM collide") {
    import spark.implicits._
    // ids 2 and 39 share key 2 (2 % 37 = 39 % 37), WAV vs FLAC, neither
    // perturbed (2 % 3 != 0, 39 % 3 == 0 — no wait, 39 % 3 == 0 IS
    // perturbed; use 2 and 76: 76 % 37 = 2, 76 % 3 != 0, 76 even → WAV;
    // pick 113: 113 % 37 = 2, odd → FLAC, 113 % 3 != 0 clean)
    val fp = Multimodal.audioFingerprint(
      Multimodal.syntheticNearDupAudio(Seq(2L, 113L, 4L).toDF("doc_id"), "doc_id", 37),
      "doc_id", "clip").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(2L) == fp(113L), "lossless re-encodings must fingerprint equal")
    assert(fp(2L) != fp(4L), "different keys must differ")
    // perturbed twin (39 % 37 = 2, 39 % 3 == 0): Hamming ≤ 2 vs clean
    val fpP = Multimodal.audioFingerprint(
      Multimodal.syntheticNearDupAudio(Seq(2L, 39L).toDF("doc_id"), "doc_id", 37),
      "doc_id", "clip").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ham = java.lang.Long.bitCount(fpP(2L) ^ fpP(39L))
    assert(ham <= 2, s"one-sample perturbation moved $ham bits")
  }

  test("audioFingerprint64 is amplitude-offset invariant and length-guarded") {
    // +100 on every sample shifts every segment mean equally: the
    // comparison bits cannot move (the time-axis analog of dHash's
    // brightness invariance)
    val n = 200
    val base = Array.tabulate(n)(s => Multimodal.audioDupSample(5L, s))
    val shifted = base.map(v => math.min(v + 100, 32767))
    val a = Multimodal.DecodedAudio(1, 8000, base)
    val b = Multimodal.DecodedAudio(1, 8000, shifted)
    // clamp at 32767 can flip bits; restrict to a clip where no sample
    // clamps so the invariance is exact
    if (!base.exists(_ > 32767 - 100))
      assert(Multimodal.audioFingerprint64(a) == Multimodal.audioFingerprint64(b))
    // sub-65-sample clips have no 65-segment partition: None, not junk
    assert(Multimodal.audioFingerprint64(
      Multimodal.DecodedAudio(1, 8000, base.take(64))).isEmpty)
  }

  test("audioFingerprint64Trimmed: trim(pad ++ clip ++ pad') == trim(clip) exactly") {
    val clip = Array.tabulate(200)(s => Multimodal.audioDupSample(5L, s))
    val lead = Array.tabulate(6)(p => Multimodal.audioPadSample(5L, p))
    val trail = Array.tabulate(4)(p => Multimodal.audioPadSample(5L, 100 + p))
    assert(lead.forall(v => math.abs(v) < 512) && trail.forall(v => math.abs(v) < 512),
      "pad samples must be sub-threshold by construction")
    val plain = Multimodal.audioFingerprint64Trimmed(
      Multimodal.DecodedAudio(1, 8000, clip))
    val padded = Multimodal.audioFingerprint64Trimmed(
      Multimodal.DecodedAudio(1, 8000, lead ++ clip ++ trail))
    assert(plain.isDefined && plain == padded,
      "padding must be invisible to the trimmed fingerprint")
    // the UNtrimmed fingerprint is NOT pad-invariant — the reason the
    // trimmed variant exists
    assert(Multimodal.audioFingerprint64(
      Multimodal.DecodedAudio(1, 8000, clip)) !=
      Multimodal.audioFingerprint64(
        Multimodal.DecodedAudio(1, 8000, lead ++ clip ++ trail)))
    // an all-silence clip trims to nothing: None, not junk
    assert(Multimodal.audioFingerprint64Trimmed(
      Multimodal.DecodedAudio(1, 8000, lead ++ trail)).isEmpty)
  }

  test("padded pipeline: WAV and FLAC padded re-encodings collide at Hamming 0") {
    import spark.implicits._
    // 2 and 113 share key 2 (WAV vs FLAC, neither perturbed) but get
    // DIFFERENT pad amounts (lead 2%7=2 vs 113%7=1; trail 0 vs 2):
    // only genuine pad-invariance makes them equal
    val fp = Multimodal.audioFingerprintTrimmed(
      Multimodal.syntheticNearDupAudioPadded(
        Seq(2L, 113L, 4L).toDF("doc_id"), "doc_id", 37),
      "doc_id", "clip").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(2L) == fp(113L),
      "padded lossless re-encodings must fingerprint equal")
    assert(fp(2L) != fp(4L), "different keys must differ")
  }

  test("videoShotSegments: hand-built frame index segments exactly") {
    import spark.implicits._
    // video 1: dhashes [0, 0, -1L, -1L, -1L] — bit distance 64 at
    // frame 2 → shots [0..1] and [2..4]; keyframe = argmin
    // (popcount, frame): frame 0 (pc 0) and frame 2 (pc 64)
    val idx = Seq(
      (1L, 0L, 0L), (1L, 1L, 0L), (1L, 2L, -1L), (1L, 3L, -1L), (1L, 4L, -1L),
      // video 2: distance 1 (≤ threshold) never splits
      (2L, 0L, 0L), (2L, 1L, 1L))
      .toDF("doc_id", "frame_idx", "dhash")
    val got = Multimodal.videoShotSegments(idx, "doc_id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((1L, 0L, 2L, 0L), (1L, 2L, 3L, 2L), (2L, 0L, 2L, 0L)),
      s"got $got")
  }

  test("video_shot_segments corpus: planted boundaries detected, spans cover the clip") {
    import spark.implicits._
    val docs = (0L until 12L).toDF("doc_id")
    val segs = Multimodal.videoShotSegments(
      Multimodal.videoFrameDHash(
        Multimodal.syntheticShotVideos(docs, "doc_id"), "doc_id", "avi"),
      "doc_id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    segs.groupBy(_._1).foreach { case (id, ss) =>
      val nFrames = 4 + id % 5
      val shotLen = 2 + id % 2
      // spans tile the clip exactly
      assert(ss.map(_._3).sum == nFrames, s"video $id spans must cover all frames")
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._2 + a._3 == b._2, s"video $id spans must tile")
        case _ => ()
      }
      // planted structure: boundaries exactly at shot-length multiples
      // (cross-shot rasters are independent pseudo-random draws; the
      // within-shot wobble is ≤ 4 bits, under the threshold)
      assert(sorted.map(_._2).toSeq ==
        (0L until nFrames by shotLen).toSeq,
        s"video $id: got starts ${sorted.map(_._2).toSeq}")
      // keyframe falls inside its span
      sorted.foreach { case (_, st, len, kf) =>
        assert(kf >= st && kf < st + len)
      }
    }
  }
}
