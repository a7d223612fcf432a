package graft

import scala.util.Random

import graft.operators.{Gif, Multimodal}

/** GIF codec conformance + fuzz. The JDK's ImageIO GIF plugin is the
  * external ground truth: our encoder's output must decode pixel-exact
  * under ImageIO, and our decoder must read ImageIO-written GIFs — the
  * two directions together rule out a compensating encoder/decoder bug
  * (e.g. a shared off-by-one in the LZW width-bump schedule).
  */
class GifSpec extends SparkSpec {

  private def syntheticRgb(id: Long, p: Int, c: Int): Int =
    (((id + 3L * (((id + p) % 256 + 256) % 256) + c) % 256 + 256) % 256).toInt

  private def decodeViaImageIO(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not read our GIF")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h * 3)
    var p = 0
    while (p < w * h) {
      val argb = img.getRGB(p % w, p / w)
      out(p * 3) = (argb >> 16) & 0xFF
      out(p * 3 + 1) = (argb >> 8) & 0xFF
      out(p * 3 + 2) = argb & 0xFF
      p += 1
    }
    (w, h, out)
  }

  test("encoder conformance: ImageIO decodes our GIFs pixel-exactly (both interlace modes)") {
    (0L until 40L).foreach { id => // even ids plain, odd interlaced
      val (w, h) = ((2 + id % 6).toInt, (5 + id % 5).toInt)
      val bytes = Gif.gifPayloadBytes(id, w, h)
      val (gw, gh, rgb) = decodeViaImageIO(bytes)
      assert((gw, gh) == (w, h), s"id=$id dims")
      (0 until w * h * 3).foreach { i =>
        assert(rgb(i) == syntheticRgb(id, i / 3, i % 3),
          s"id=$id pixel ${i / 3} ch ${i % 3}: ${rgb(i)}")
      }
    }
  }

  test("our decoder equals ImageIO on our own payloads") {
    (0L until 40L).foreach { id =>
      val bytes = Gif.gifPayloadBytes(id, (2 + id % 6).toInt, (5 + id % 5).toInt)
      val dec = Gif.decode(bytes)
      assert(dec.nonEmpty, s"id=$id decode failed")
      val (gw, gh, rgb) = decodeViaImageIO(bytes)
      assert(dec.get.width == gw && dec.get.height == gh)
      assert(dec.get.rgb.toSeq == rgb.toSeq, s"id=$id pixel divergence vs ImageIO")
    }
  }

  test("decoder conformance: reads ImageIO-WRITTEN gifs (foreign encoder)") {
    val rnd = new Random(7)
    Seq((13, 9), (64, 48), (1, 1), (255, 2)).foreach { case (w, h) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w * h).foreach { p =>
        // small random palette so ImageIO's GIF writer needs no dither
        val v = rnd.nextInt(16) * 17
        img.setRGB(p % w, p / w, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", bos), "ImageIO has no gif writer?")
      val dec = Gif.decode(bos.toByteArray)
      assert(dec.nonEmpty, s"${w}x$h ImageIO gif not decoded")
      assert(dec.get.width == w && dec.get.height == h)
      (0 until w * h).foreach { p =>
        val argb = img.getRGB(p % w, p / w)
        assert(dec.get.rgb(p * 3) == ((argb >> 16) & 0xFF) &&
          dec.get.rgb(p * 3 + 1) == ((argb >> 8) & 0xFF) &&
          dec.get.rgb(p * 3 + 2) == (argb & 0xFF), s"${w}x$h pixel $p")
      }
    }
  }

  test("LZW width growth and 4096-cap clear: big high-entropy raster round-trips") {
    // 128x128 = 16384 px of seeded noise forces codes through 9->12
    // bits AND past the 4096 ceiling (mid-stream CLEAR + dict reset);
    // verified against ImageIO too, so the bump schedule is per-spec
    val rnd = new Random(42)
    val (w, h) = (128, 128)
    val indices = Array.fill(w * h)(rnd.nextInt(256))
    val palette = Array.tabulate(256 * 3)(i => (i / 3 * 7 + i % 3 * 11) % 256)
    val bytes = Gif.encodeGif(w, h, indices, palette, interlaced = false)
    val dec = Gif.decode(bytes)
    assert(dec.nonEmpty, "big raster decode failed")
    (0 until w * h).foreach { p =>
      assert(dec.get.rgb(p * 3) == palette(indices(p) * 3), s"pixel $p")
    }
    val (gw, gh, rgb) = decodeViaImageIO(bytes)
    assert((gw, gh) == (w, h) && rgb.toSeq == dec.get.rgb.toSeq,
      "ImageIO disagrees on the width-growth payload")
  }

  test("truncation at every byte offset never throws and never mis-decodes") {
    val full = Gif.gifPayloadBytes(7L, 5, 6) // interlaced path
    val want = Gif.decode(full).get.rgb.toSeq
    (0 until full.length).foreach { cut =>
      val r = Gif.decode(java.util.Arrays.copyOfRange(full, 0, cut)) // must not throw
      r.foreach(d => assert(d.rgb.toSeq == want,
        s"cut=$cut produced a DIFFERENT decode instead of None"))
    }
  }

  test("single-byte corruption sweep never throws") {
    val full = Gif.gifPayloadBytes(11L, 6, 5)
    (0 until full.length).foreach { i =>
      val c = full.clone(); c(i) = (c(i) ^ 0x5a).toByte
      Gif.decode(c) // lenient: None or a decode, never an exception
    }
  }

  test("syntheticGifImages + pixelStats: closed-form sums per doc") {
    import spark.implicits._
    val df = Multimodal.pixelStats(
      Multimodal.syntheticGifImages((0L until 20L).toDF("doc_id"), "doc_id"),
      "doc_id", "img")
    df.collect().foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((2 + id % 6).toInt, (5 + id % 5).toInt)
      assert(r.getString(1) == "gif" && r.getLong(2) == w && r.getLong(3) == h)
      val n = w * h
      (0 until 3).foreach { c =>
        val sum = (0 until n).map(p => syntheticRgb(id, p, c).toLong).sum
        val wsum = (0 until n).map(p => (p + 1L) * syntheticRgb(id, p, c)).sum
        assert(r.getLong(5 + c) == sum, s"id=$id ch$c plain sum")
        assert(r.getLong(8 + c) == wsum, s"id=$id ch$c weighted sum")
      }
    }
  }
}
