package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500) container handling — the format web crawls
  * actually arrive in. A .warc file is a concatenation of records:
  *
  * {{{
  * WARC/1.0\r\n
  * <header: value>\r\n ...
  * Content-Length: N\r\n
  * \r\n
  * <N payload bytes>\r\n\r\n
  * }}}
  *
  * Same discipline as the codec tier (Multimodal.scala): the graded
  * query MANUFACTURES valid .warc blobs from row fields (one blob per
  * source — the "file" granularity; in production the blob is the
  * file read via `binaryFile`), then the parser walks them back from
  * raw bytes, and the round trip is graded against the source-field
  * oracle. The parser is LENIENT the way a crawl reader must be:
  * malformed input yields the records parsed so far, never an
  * exception (fuzz-hardened in WarcSpec).
  *
  * Scale shape: blobs parse independently (partition-parallel
  * mapPartitions over binary), records stream out of one forward
  * walk — no backtracking, O(blob) per task.
  */
object Warc {

  private val CRLF = "\r\n"

  /** One WARC/1.0 response record for a payload. Content-Length is the
    * payload byte count, per spec; header order is fixed so construct
    * is deterministic. `extraHeaders` append after the standard four
    * (ISO 28500 allows extension fields) — [[roundTrip]] uses them to
    * carry its row keys instead of packing them into the URI path.
    */
  def record(uri: String, date: String, payload: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder()
      .append("WARC/1.0").append(CRLF)
      .append("WARC-Type: response").append(CRLF)
      .append("WARC-Target-URI: ").append(uri).append(CRLF)
      .append("WARC-Date: ").append(date).append(CRLF)
    extraHeaders.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(CRLF) }
    val header = sb
      .append("Content-Length: ").append(payload.length).append(CRLF)
      .append(CRLF)
      .toString.getBytes(UTF_8)
    val out = new Array[Byte](header.length + payload.length + 4)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(payload, 0, out, header.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** One record as its OWN gzip member (RFC 1952 multi-member stream;
    * the ISO 28500 annex layout CommonCrawl ships as .warc.gz): members
    * concatenate into one file, so a byte-range reader can decompress a
    * single record without touching the rest.
    */
  def recordGz(uri: String, date: String, payload: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record(uri, date, payload, extraHeaders))
    gz.finish(); gz.close()
    bos.toByteArray
  }

  /** Decompress a (possibly multi-member) gzip stream LENIENTLY:
    * java.util.zip walks concatenated members transparently, and
    * damaged or truncated input yields the bytes recovered so far —
    * never an exception (the downstream [[parse]] is already built to
    * stop at structural damage, so a half-recovered last record drops
    * cleanly). Same stops-never-throws contract as the rest of the
    * container tier.
    */
  def gunzipMembers(blob: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(blob))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: java.io.IOException => () }
    out.toByteArray
  }

  final case class WarcRecord(
      uri: String, date: String, contentLength: Long, payload: Array[Byte],
      headers: Map[String, String] = Map.empty)

  /** Walk a .warc blob into its records. Lenient: stops at the first
    * structural damage (bad magic, missing Content-Length, truncated
    * payload) and returns what parsed cleanly before it.
    */
  def parse(blob: Array[Byte]): List[WarcRecord] = {
    val out = List.newBuilder[WarcRecord]
    var off = 0
    var ok = true
    while (ok && off < blob.length) {
      val headEnd = indexOf(blob, off, s"$CRLF$CRLF".getBytes(UTF_8))
      if (headEnd < 0) ok = false
      else {
        val head = new String(blob, off, headEnd - off, UTF_8)
        val lines = head.split(CRLF)
        if (lines.isEmpty || lines(0) != "WARC/1.0") ok = false
        else {
          val hs = lines.drop(1).flatMap { l =>
            val i = l.indexOf(": ")
            if (i < 0) None else Some(l.substring(0, i) -> l.substring(i + 2))
          }.toMap
          hs.get("Content-Length").flatMap(s => s.toLongOption) match {
            case Some(n) if n >= 0 && headEnd + 4 + n + 4 <= blob.length =>
              val body = java.util.Arrays.copyOfRange(
                blob, headEnd + 4, headEnd + 4 + n.toInt)
              // record terminator must be present, per spec
              val t = headEnd + 4 + n.toInt
              if (blob(t) == '\r' && blob(t + 1) == '\n'
                && blob(t + 2) == '\r' && blob(t + 3) == '\n') {
                out += WarcRecord(hs.getOrElse("WARC-Target-URI", ""),
                  hs.getOrElse("WARC-Date", ""), n, body, hs)
                off = t + 4
              } else ok = false
            case _ => ok = false
          }
        }
      }
    }
    out.result()
  }

  private def indexOf(hay: Array[Byte], from: Int, needle: Array[Byte]): Int = {
    var i = from
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Construct-then-parse round trip over the corpus: one .warc blob
    * per group (deterministic doc order inside each blob), parsed back
    * record-by-record from raw bytes. Output one row per recovered
    * record: (id, group, content_length, text) — graded against the
    * source fields directly, which the parser cannot see.
    */
  def roundTrip(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      docsPerBlob: Int = 256,
      gzipMembers: Boolean = false): DataFrame = {
    // blob granularity is (group, id-range) so no blob row outgrows a
    // task at any corpus size — the file granularity a real crawl
    // writes; the group and id travel in DEDICATED record headers
    // (WARC-Record-ID + an extension field), so the output is
    // blob-layout-independent and a group value containing '/' (or
    // an empty group) can't be mis-split out of the URI path
    val blobs = df
      .groupBy(col(groupCol).as("g"),
        floor(col(idCol).cast("long") / docsPerBlob).as("shard"))
      .agg(sort_array(collect_list(struct(col(idCol).cast("long").as("id"),
        col(textCol).as("text")))).as("docs"))
    val blobType = StructType(Seq(StructField("blob", BinaryType)))
    val built = blobs.mapPartitions { it =>
      it.map { r =>
        val g = r.getString(0)
        val bos = new java.io.ByteArrayOutputStream()
        r.getSeq[Row](2).foreach { d =>
          val mk = if (gzipMembers) recordGz _ else record _
          bos.write(mk(s"https://example.org/$g/${d.getLong(0)}",
            "2026-01-01T00:00:00Z", d.getString(1).getBytes(UTF_8),
            Seq("WARC-Record-ID" -> s"<urn:graft:${d.getLong(0)}>",
              "X-Warc-Group" -> g)))
        }
        Row(bos.toByteArray)
      }
    }(org.apache.spark.sql.Encoders.row(blobType))
    val outType = StructType(Seq(
      StructField("doc_id", LongType), StructField(groupCol, StringType),
      StructField("content_length", LongType), StructField("text", StringType)))
    built.mapPartitions { it =>
      it.flatMap { r =>
        val raw = r.getAs[Array[Byte]](0)
        val bytes = if (gzipMembers) gunzipMembers(raw) else raw
        parse(bytes).flatMap { rec =>
          // group and id ride in dedicated headers; the payload text is
          // what the parser recovered from raw bytes, graded against
          // the source. The id parse is LENIENT like the rest of the
          // walker (Content-Length already is): a record whose header
          // block parses but whose WARC-Record-ID is missing/damaged
          // is DROPPED, never allowed to throw and fail the task —
          // stops-never-throws is the container-parser contract.
          rec.headers.getOrElse("WARC-Record-ID", "")
            .stripPrefix("<urn:graft:").stripSuffix(">").toLongOption
            .map { id =>
              Row(id, rec.headers.getOrElse("X-Warc-Group", ""),
                rec.contentLength, new String(rec.payload, UTF_8))
            }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outType))
  }
}
