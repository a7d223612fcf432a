package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.operators.{Tar, Warc}

class TarSpec extends SparkSpec {

  private def mk(ms: (String, String)*): Array[Byte] =
    Tar.archive(ms.map { case (n, d) => n -> d.getBytes(UTF_8) })

  test("member round trip recovers name and exact bytes (binary-safe)") {
    val data = Array.tabulate[Byte](700)(i => (i * 7 % 256).toByte)
    val ms = Tar.parse(Tar.archive(Seq("42.img" -> data)))
    assert(ms.length == 1)
    assert(ms.head.name == "42.img")
    assert(java.util.Arrays.equals(ms.head.data, data))
  }

  test("multi-member archive parses in order, empty members included") {
    val ms = Tar.parse(mk("1.txt" -> "alpha", "1.json" -> "",
      "2.txt" -> "a" * 513)) // data spanning two blocks
    assert(ms.map(_.name) == List("1.txt", "1.json", "2.txt"))
    assert(ms.map(_.data.length) == List(5, 0, 513))
  }

  test("ustar header invariants: magic, version, octal size, verified checksum") {
    val one = Tar.member("7.txt", "payload!".getBytes(UTF_8))
    assert(new String(one, 257, 5, UTF_8) == "ustar")
    assert(one(263) == '0' && one(264) == '0')
    assert(one(156) == '0') // regular file
    // size field: 11 octal digits + NUL
    assert(new String(one, 124, 11, UTF_8) == "00000000010" && one(135) == 0)
    // stored checksum equals a recount with the field spaced out
    var sum = 0L
    (0 until 512).foreach { i =>
      sum += (if (i >= 148 && i < 156) ' '.toInt else one(i) & 0xFF)
    }
    assert(java.lang.Long.parseLong(
      new String(one, 148, 6, UTF_8), 8) == sum)
  }

  test("truncation at EVERY byte offset never throws and yields a member prefix") {
    val full = mk("1.txt" -> "aaaa", "2.txt" -> "bbbb", "3.txt" -> "cccc")
    val clean = Tar.parse(full).map(_.name)
    (0 until full.length).foreach { cut =>
      val names = Tar.parse(java.util.Arrays.copyOf(full, cut)).map(_.name)
      assert(names == clean.take(names.length),
        s"truncation at $cut must yield a clean member prefix")
    }
  }

  test("single-byte corruption sweep never throws; header damage stops the walk") {
    val full = mk("1.txt" -> "aaaa", "2.txt" -> "bbbb")
    (0 until full.length).foreach { i =>
      val dam = full.clone()
      dam(i) = (dam(i) ^ 0x5A).toByte
      val ms = Tar.parse(dam) // must not throw
      assert(ms.length <= 2)
    }
    // corrupting the first header's checksum digits kills everything
    val csDam = full.clone()
    csDam(148) = '7'; csDam(149) = '7'
    assert(Tar.parse(csDam).isEmpty)
  }

  test("end-of-archive zero block stops the walk before trailing garbage") {
    val full = mk("1.txt" -> "live")
    val withJunk = full ++ Array.fill[Byte](512)('x')
    assert(Tar.parse(withJunk).map(_.name) == List("1.txt"))
  }

  test("roundTrip: samples reassemble by key; json/text/img graded; gzip transparent") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source")).limit(40).cache()
    Seq(false, true).foreach { gz =>
      val rt = Tar.roundTrip(docs, "doc_id", "text", "source", gzip = gz)
        .cache()
      assert(rt.count() == docs.count(), s"gzip=$gz: one sample per doc")
      assert(rt.where(col("n_members") =!= 3).count() == 0)
      // text member matches the source column byte-for-byte
      val joined = rt.join(docs.withColumnRenamed("text", "src_text"), "doc_id")
      assert(joined.where(col("text") =!= col("src_text")).count() == 0)
      // img member length = the closed-form BMP size of the id dims
      assert(joined.where(col("img_bytes") =!= expr(
        "54 + ((((2 + doc_id % 5) * 3 + 3) div 4) * 4) * (2 + doc_id % 3)"))
        .count() == 0)
      rt.unpersist()
    }
    docs.unpersist()
  }

  test("roundTrip payload BYTE equality: recovered img bytes re-encode identically") {
    // DuckDB can only grade the length; byte equality of the binary
    // member is pinned here — parse the shard directly and compare
    // against a fresh encode of the same raster
    val one = spark.range(5, 6).toDF("doc_id")
      .withColumn("text", lit("t")).withColumn("source", lit("s"))
    val id = 5L
    val w = (2 + id % 5).toInt; val h = (2 + id % 3).toInt
    val rgb = Array.tabulate(w * h * 3)(i =>
      graft.operators.Multimodal.syntheticPixel(id, i / 3, i % 3))
    val expected = graft.operators.Multimodal.encodeBmp(w, h, rgb)
    // rebuild the shard the way roundTrip's construct half does and
    // pull the img member out of the raw tar
    val members = Seq(
      s"$id.txt" -> "t".getBytes(UTF_8),
      s"$id.json" -> s"""{"doc_id":$id,"source":"s"}""".getBytes(UTF_8),
      s"$id.img" -> expected)
    val got = Tar.parse(Tar.archive(members)).find(_.name == s"$id.img").get
    assert(java.util.Arrays.equals(got.data, expected))
    // and the DataFrame path agrees on the length for the same id
    val rt = Tar.roundTrip(one, "doc_id", "text", "source")
    assert(rt.select(col("img_bytes")).collect().head.getLong(0)
      == expected.length.toLong)
  }

  test("lenient key parse: a member whose stem is not a long is dropped, not thrown") {
    val blob = mk("notanum.txt" -> "x", "9.txt" -> "y", "9.json" -> "{}")
    // drive through the parse+assembly logic via a 1-row binary DF is
    // overkill here; the contract lives in parse + the roundTrip
    // assembly, which keys on toLongOption — simulate it directly
    val keys = Tar.parse(blob).map { m =>
      val dot = m.name.lastIndexOf('.')
      (if (dot < 0) m.name else m.name.substring(0, dot))
    }.distinct.flatMap(_.toLongOption)
    assert(keys == List(9L))
  }

  test("gunzip + parse: a truncated .tar.gz yields the members recovered so far") {
    val tar = mk("1.txt" -> ("z" * 600), "2.txt" -> "tail")
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(tar); g.finish(); g.close()
    val gz = bos.toByteArray
    (0 until gz.length).foreach { cut =>
      val ms = Tar.parse(Warc.gunzipMembers(java.util.Arrays.copyOf(gz, cut)))
      assert(ms.length <= 2) // never throws, never invents members
    }
  }
}
