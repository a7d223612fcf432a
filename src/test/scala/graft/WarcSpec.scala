package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.Warc

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def blob(payloads: Seq[(String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    payloads.foreach { case (uri, p) =>
      bos.write(Warc.record(uri, "2026-01-01T00:00:00Z", p.getBytes(UTF_8)))
    }
    bos.toByteArray
  }

  test("single-record round trip recovers uri, date, length, payload bytes") {
    val payload = "hello warc world"
    val recs = Warc.parse(
      Warc.record("https://x.test/1", "2026-01-01T00:00:00Z", payload.getBytes(UTF_8)))
    assert(recs.length == 1)
    assert(recs.head.uri == "https://x.test/1")
    assert(recs.head.date == "2026-01-01T00:00:00Z")
    assert(recs.head.contentLength == payload.length)
    assert(new String(recs.head.payload, UTF_8) == payload)
  }

  test("multi-record blob parses all records in order, including empty payloads") {
    val recs = Warc.parse(blob(Seq(
      "u/1" -> "first", "u/2" -> "", "u/3" -> "third payload\r\nwith crlf inside")))
    assert(recs.map(_.uri) == List("u/1", "u/2", "u/3"))
    assert(recs.map(_.contentLength) == List(5L, 0L, 31L))
    assert(new String(recs(2).payload, UTF_8).contains("crlf inside"))
  }

  test("truncation at EVERY byte offset never throws and yields a prefix") {
    val full = blob(Seq("u/1" -> "aaaa", "u/2" -> "bbbb", "u/3" -> "cccc"))
    val clean = Warc.parse(full).map(_.uri)
    (0 until full.length).foreach { cut =>
      val recs = Warc.parse(java.util.Arrays.copyOfRange(full, 0, cut))
      assert(recs.map(_.uri) == clean.take(recs.length),
        s"cut=$cut not a clean prefix")
      assert(recs.length <= 3)
    }
  }

  test("corrupt magic / lying Content-Length / missing terminator stop cleanly") {
    val good = blob(Seq("u/1" -> "aaaa", "u/2" -> "bbbb"))
    // corrupt the second record's magic
    val r1len = Warc.record("u/1", "2026-01-01T00:00:00Z", "aaaa".getBytes(UTF_8)).length
    val bad1 = good.clone(); bad1(r1len) = 'X'
    assert(Warc.parse(bad1).map(_.uri) == List("u/1"))
    // Content-Length larger than the blob
    val lying = Warc.record("u/1", "d", "abc".getBytes(UTF_8))
    val idx = new String(lying, UTF_8).indexOf("Content-Length: 3")
    val bad2 = new String(lying, UTF_8).replace("Content-Length: 3", "Content-Length: 9")
      .getBytes(UTF_8)
    assert(idx > 0 && Warc.parse(bad2).isEmpty)
    // clipped terminator
    val bad3 = java.util.Arrays.copyOfRange(good, 0, r1len - 1)
    assert(Warc.parse(bad3).isEmpty)
  }

  test("single-byte corruption sweep never throws") {
    val full = blob(Seq("u/1" -> "aaaa", "u/2" -> "bbbb"))
    (0 until full.length).foreach { i =>
      val c = full.clone(); c(i) = (c(i) ^ 0x5a).toByte
      val recs = Warc.parse(c) // must not throw
      assert(recs.length <= 2)
    }
  }

  test("roundTrip operator recovers every doc against its source row") {
    val docs = Seq(
      (1L, "alpha beta", "s1"), (2L, "gamma", "s1"), (3L, "delta epsilon zeta", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Warc.roundTrip(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "s1", 10L, "alpha beta"), (2L, "s1", 5L, "gamma"),
      (3L, "s2", 18L, "delta epsilon zeta")))
  }

  test("gzip members: multi-member stream round trip, truncation and corruption sweeps") {
    val r1 = Warc.recordGz("https://e.org/1", "2026-01-01T00:00:00Z",
      "hello world".getBytes("UTF-8"))
    val r2 = Warc.recordGz("https://e.org/2", "2026-01-01T00:00:00Z",
      Array.empty[Byte])
    val blob = r1 ++ r2
    // concatenated members decompress transparently into both records
    val recs = Warc.parse(Warc.gunzipMembers(blob))
    assert(recs.map(_.uri) == List("https://e.org/1", "https://e.org/2"))
    assert(new String(recs(0).payload, "UTF-8") == "hello world")
    // truncation at every byte offset: never throws, yields a prefix
    (0 until blob.length).foreach { cut =>
      val got = Warc.parse(Warc.gunzipMembers(blob.take(cut)))
      assert(got.length <= 2)
    }
    // single-byte corruption sweep: never throws (gzip CRC or the
    // record walker stops cleanly)
    (0 until blob.length).foreach { i =>
      val bad = blob.clone(); bad(i) = (bad(i) ^ 0x5a).toByte
      Warc.parse(Warc.gunzipMembers(bad))
    }
    // non-gzip garbage is empty, not an exception
    assert(Warc.gunzipMembers("not gzip at all".getBytes("UTF-8")).isEmpty)
  }

  test("gzip roundTrip operator recovers every doc, same truth as the plain path") {
    val docs = Seq(
      (1L, "café au lait", "a/b"), (2L, "", "s1"), (3L, "naïve plain", "s2"))
      .toDF("doc_id", "text", "source")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    val plain = key(Warc.roundTrip(docs, "doc_id", "text", "source"))
    val gz = key(Warc.roundTrip(docs, "doc_id", "text", "source",
      gzipMembers = true))
    assert(gz == plain)
    assert(gz == Seq((1L, "a/b", 13L, "café au lait"), (2L, "s1", 0L, ""),
      (3L, "s2", 12L, "naïve plain")))
  }

  test("roundTrip is safe for group values containing '/', empty, and multibyte text") {
    // keys travel in dedicated headers, not the URI path — a slashed
    // or empty group used to mis-attribute every record in the blob;
    // content_length is the UTF-8 BYTE count, not the char count
    val docs = Seq(
      (1L, "café", "a/b/c"), (2L, "naïve", ""), (3L, "plain", "s1"))
      .toDF("doc_id", "text", "source")
    val out = Warc.roundTrip(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a/b/c", 5L, "café"), (2L, "", 6L, "naïve"), (3L, "s1", 5L, "plain")))
  }
}
