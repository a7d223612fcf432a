package graft

import graft.operators.Multimodal

import scala.util.Random

/** G.711 + IMA ADPCM codec properties: canonical-code round trips,
  * quantization error bounds, bit-exact decoder agreement with the
  * encoder's reconstruction, and decode-never-throws under truncation,
  * corruption, and hostile headers (the r8 hardening contract:
  * malformed media is data, not an exception).
  */
class AudioCodecSpec extends SparkSpec {

  test("G.711: encode(decode(code)) == code for all 256 codes, both laws") {
    (0 until 256).foreach { c =>
      assert(Multimodal.alawEncode(Multimodal.alawDecode(c)) == c, s"A-law code $c")
      // µ-law has two zero codes (127 = -0, 255 = +0); the encoder
      // canonicalizes -0 to 255 per G.711 — every other code is fixed
      if (c == 127)
        assert(Multimodal.mulawEncode(Multimodal.mulawDecode(c)) == 255, "µ-law -0")
      else
        assert(Multimodal.mulawEncode(Multimodal.mulawDecode(c)) == c, s"µ-law code $c")
    }
  }

  test("G.711: quantization is idempotent and error-bounded on random s16") {
    val rnd = new Random(42)
    (0 until 5000).foreach { _ =>
      val v = rnd.nextInt(65536) - 32768
      val qa = Multimodal.alawDecode(Multimodal.alawEncode(v))
      val qu = Multimodal.mulawDecode(Multimodal.mulawEncode(v))
      // idempotence: the decode levels are fixed points of the coder
      assert(Multimodal.alawDecode(Multimodal.alawEncode(qa)) == qa)
      assert(Multimodal.mulawDecode(Multimodal.mulawEncode(qu)) == qu)
      // largest-segment step is 1024 in s16 terms for both laws
      assert(math.abs(qa - v) <= 1024, s"A-law err at $v -> $qa")
      assert(math.abs(qu - v) <= 1024, s"µ-law err at $v -> $qu")
    }
  }

  test("companded WAV: container round trip is exact on canonical levels") {
    val rnd = new Random(7)
    (0 until 50).foreach { i =>
      val alaw = i % 2 == 0
      val table = if (alaw) Multimodal.alawDecodeTable else Multimodal.mulawDecodeTable
      val channels = 1 + rnd.nextInt(2)
      val frames = 1 + rnd.nextInt(200)
      val samples = Array.fill(frames * channels)(table(rnd.nextInt(256)))
      val wav = Multimodal.encodeWavCompanded(samples, channels, 8000, alaw)
      val dec = Multimodal.decodeWav(wav)
      assert(dec.isDefined)
      assert(dec.get.channels == channels && dec.get.sampleRate == 8000)
      assert(dec.get.samples.sameElements(samples), s"case $i")
    }
  }

  test("ADPCM: decode == encoder reconstruction bit-exactly, 150 random clips") {
    val rnd = new Random(13)
    (0 until 150).foreach { i =>
      val channels = 1 + rnd.nextInt(2)
      val spb = 9 + 8 * rnd.nextInt(8) // 9, 17, ..., 65
      val blocks = 1 + rnd.nextInt(4)
      val frames = spb * blocks
      // mix of smooth and jumpy content to drive the step adaptation
      var cur = rnd.nextInt(65536) - 32768
      val samples = Array.fill(frames * channels) {
        cur = if (rnd.nextInt(10) == 0) rnd.nextInt(65536) - 32768
        else math.max(-32768, math.min(32767, cur + rnd.nextInt(2001) - 1000))
        cur
      }
      val (wav, rec) = Multimodal.encodeWavAdpcm(samples, channels, 8000, spb)
      val dec = Multimodal.decodeWav(wav)
      assert(dec.isDefined, s"case $i undecodable")
      assert(dec.get.channels == channels && dec.get.sampleRate == 8000)
      assert(dec.get.samples.sameElements(rec), s"case $i reconstruction mismatch")
    }
  }

  test("ADPCM: per-block-constant signals reproduce exactly (query contract)") {
    (0L until 40L).foreach { id =>
      val spb = 9
      val nBlocks = (2 + id % 3).toInt
      val channels = (1 + id % 2).toInt
      val samples = Array.tabulate(spb * nBlocks * channels) { j =>
        val f = j / channels; val c = j % channels
        ((id * 31 + (f / spb) * 17 + c * 7) % 65536).toInt - 32768
      }
      val (wav, _) = Multimodal.encodeWavAdpcm(samples, channels, 8000, spb)
      val dec = Multimodal.decodeWav(wav)
      assert(dec.isDefined && dec.get.samples.sameElements(samples), s"id $id")
    }
  }

  test("decode never throws: truncation and corruption sweeps") {
    val rnd = new Random(99)
    val payloads = Seq(
      Multimodal.encodeWavCompanded(Array.fill(120)(rnd.nextInt(65536) - 32768), 2, 8000, alaw = true),
      Multimodal.encodeWavCompanded(Array.fill(99)(rnd.nextInt(65536) - 32768), 1, 8000, alaw = false),
      Multimodal.encodeWavAdpcm(Array.fill(9 * 3 * 2)(rnd.nextInt(65536) - 32768), 2, 8000, 9)._1)
    payloads.foreach { p =>
      (0 until 100).foreach { _ =>
        val cut = rnd.nextInt(p.length + 1)
        Multimodal.decodeWav(p.take(cut)) // must not throw
        val mut = p.clone()
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
        Multimodal.decodeWav(mut) // must not throw; None or garbage data both fine
      }
    }
  }

  test("hostile ADPCM headers are rejected, not allocated") {
    val good = Multimodal.encodeWavAdpcm(
      Array.fill(9 * 2)(0), 1, 8000, 9)._1
    // samplesPerBlock inflated (bytes 38-39 of the fmt extension) to
    // force a huge sample allocation if the bounds checks were missing;
    // 0x7FF9 keeps the 8k+1 shape so the rejection is the align/bound
    // check, not the shape check
    val evil = good.clone()
    evil(38) = 0xF9.toByte; evil(39) = 0x7F.toByte
    assert(Multimodal.decodeWav(evil).isEmpty)
    // blockAlign zeroed -> division/modulo hazards
    val evil2 = good.clone()
    evil2(32) = 0; evil2(33) = 0
    assert(Multimodal.decodeWav(evil2).isEmpty)
    // step index past the table end
    val evil3 = good.clone()
    // find the data chunk: fmt(20)+fact(4) layout puts data at 12+28+12+8=60
    evil3(60 + 2) = 120.toByte
    assert(Multimodal.decodeWav(evil3).isEmpty)
  }
}
