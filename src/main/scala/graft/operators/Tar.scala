package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style ustar (.tar) shard handling — the
  * tar-of-samples container multimodal training pipelines actually
  * ship (a shard is a .tar whose members group by basename key:
  * `000017.jpg` + `000017.json` + `000017.txt` form ONE sample).
  * This is the one interchange container the WARC/JSONL tier doesn't
  * cover, and it needs no codec: ustar headers (POSIX.1-1988) are
  * fixed-offset octal fields in 512-byte blocks, member data follows
  * zero-padded to the block size, and the archive ends with two zero
  * blocks.
  *
  * Same discipline as the WARC tier (Warc.scala): the graded query
  * MANUFACTURES valid multi-member shards from row fields (one shard
  * per (source, id-range) — file granularity, no blob outgrows a
  * task), a LENIENT pure-JVM walker parses members back from raw
  * bytes (forward-only, O(blob), checksum-verified,
  * stops-never-throws on damage — truncation/corruption fuzz in
  * TarSpec), samples reassemble row-locally by basename key, and the
  * round trip is graded against source fields the parser never sees.
  * The .tar.gz variant is the same walker behind the lenient
  * multi-member gunzip the WARC tier already ships
  * ([[Warc.gunzipMembers]] — java.util.zip IS zlib).
  *
  * Scale shape: shards parse independently (partition-parallel
  * mapPartitions over binary), members stream out of one forward
  * walk; at 100 TB the shard is the file read via `binaryFile` and
  * the sample rows (not the tar bytes) are what shuffles downstream.
  */
object Tar {

  /** One ustar header + data block run for a member. Name must fit
    * the 100-byte field (WebDataset keys are short by construction);
    * size fits the 11-digit octal field to 8 GiB — both asserted, a
    * shard writer must fail loudly, not truncate.
    */
  def member(name: String, data: Array[Byte]): Array[Byte] = {
    val nameB = name.getBytes(UTF_8)
    require(nameB.length <= 100, s"ustar name field is 100 bytes: $name")
    require(data.length <= 0x1FFFFFFFFL, "ustar size field caps at 8 GiB")
    val hdr = new Array[Byte](512)
    System.arraycopy(nameB, 0, hdr, 0, nameB.length)
    def octal(off: Int, len: Int, v: Long): Unit = {
      // len-1 octal digits, NUL-terminated (the POSIX layout)
      val s = java.lang.Long.toOctalString(v)
      val pad = "0" * (len - 1 - s.length) + s
      val b = pad.getBytes(UTF_8)
      System.arraycopy(b, 0, hdr, off, b.length)
      hdr(off + len - 1) = 0
    }
    octal(100, 8, 420)          // mode 0644
    octal(108, 8, 0)            // uid
    octal(116, 8, 0)            // gid
    octal(124, 12, data.length) // size
    octal(136, 12, 0)           // mtime (deterministic construct)
    hdr(156) = '0'              // typeflag: regular file
    System.arraycopy("ustar".getBytes(UTF_8), 0, hdr, 257, 5)
    hdr(262) = 0                // magic NUL
    hdr(263) = '0'; hdr(264) = '0' // version "00"
    // checksum: header bytes summed with the chksum field as spaces,
    // stored as 6 octal digits + NUL + space
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += hdr(i) & 0xFF; i += 1 }
    val cs = java.lang.Long.toOctalString(sum)
    val csPad = "0" * (6 - cs.length) + cs
    System.arraycopy(csPad.getBytes(UTF_8), 0, hdr, 148, 6)
    hdr(154) = 0; hdr(155) = ' '
    val dataBlocks = (data.length + 511) / 512 * 512
    val out = new Array[Byte](512 + dataBlocks)
    System.arraycopy(hdr, 0, out, 0, 512)
    System.arraycopy(data, 0, out, 512, data.length)
    out
  }

  /** Assemble members into one .tar blob (two zero end blocks). */
  def archive(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    members.foreach { case (n, d) => bos.write(member(n, d)) }
    bos.write(new Array[Byte](1024)) // end-of-archive marker
    bos.toByteArray
  }

  final case class TarMember(name: String, data: Array[Byte])

  /** Walk a .tar blob into its members. Lenient the way a corpus
    * reader must be: stops at the end-of-archive zero block OR at the
    * first structural damage (bad magic, bad checksum, unparseable
    * size, truncated data) and returns the members parsed cleanly
    * before it — never an exception.
    */
  def parse(blob: Array[Byte]): List[TarMember] = {
    val out = List.newBuilder[TarMember]
    var off = 0
    var ok = true
    while (ok && off + 512 <= blob.length) {
      var allZero = true
      var i = 0
      while (allZero && i < 512) { if (blob(off + i) != 0) allZero = false; i += 1 }
      if (allZero) ok = false // end-of-archive (first zero block)
      else if (!(blob(off + 257) == 'u' && blob(off + 258) == 's'
        && blob(off + 259) == 't' && blob(off + 260) == 'a'
        && blob(off + 261) == 'r')) ok = false
      else {
        // verify the stored checksum against a recount (chksum field
        // read as spaces) — corrupted headers stop the walk
        var stored = 0L
        var sawDigit = false
        i = 148
        var csOk = true
        while (csOk && i < 156) {
          val c = blob(off + i) & 0xFF
          if (c >= '0' && c <= '7') { stored = stored * 8 + (c - '0'); sawDigit = true }
          else if (c != 0 && c != ' ') csOk = false
          i += 1
        }
        var sum = 0L
        i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else blob(off + i) & 0xFF)
          i += 1
        }
        val size = parseOctal(blob, off + 124, 12)
        if (!csOk || !sawDigit || stored != sum || size < 0) ok = false
        else {
          val dataEnd = off + 512 + size
          if (dataEnd > blob.length) ok = false // truncated data
          else {
            var end = off
            while (end < off + 100 && blob(end) != 0) end += 1
            val name = new String(blob, off, end - off, UTF_8)
            out += TarMember(name,
              java.util.Arrays.copyOfRange(blob, off + 512, dataEnd.toInt))
            off = off + 512 + ((size.toInt + 511) / 512 * 512)
          }
        }
      }
    }
    out.result()
  }

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    var seen = false
    while (i < off + len) {
      val c = b(i) & 0xFF
      if (c >= '0' && c <= '7') {
        v = v * 8 + (c - '0'); seen = true
        if (v > 0x1FFFFFFFFL) return -1
      } else if (c == 0 || c == ' ') { if (seen) return v }
      else return -1
      i += 1
    }
    if (seen) v else -1
  }

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append("\\u%04x".format(c.toInt))
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Construct-then-parse WebDataset round trip over the corpus: one
    * .tar shard per (source, id-range), each doc contributing THREE
    * members under its key — `<id>.txt` (the text), `<id>.json`
    * (metadata: doc_id + source), `<id>.img` (a REAL BMP raster from
    * the codec tier, dims a closed form of the id) — then the lenient
    * walker parses shards back, samples reassemble by basename key
    * row-locally, and each sample emits (doc_id, source, text,
    * n_members, img_bytes): id/text/json graded against source
    * fields, the binary member by its closed-form byte length (byte
    * EQUALITY of payloads is spec-pinned in TarSpec; DuckDB can't
    * rebuild a BMP).
    */
  def roundTrip(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      docsPerShard: Int = 256,
      gzip: Boolean = false): DataFrame = {
    val shards = df
      .groupBy(col(groupCol).as("g"),
        floor(col(idCol).cast("long") / docsPerShard).as("shard"))
      .agg(sort_array(collect_list(struct(col(idCol).cast("long").as("id"),
        col(textCol).as("text")))).as("docs"))
    val blobType = StructType(Seq(StructField("blob", BinaryType)))
    val built = shards.mapPartitions { it =>
      it.map { r =>
        val g = r.getString(0)
        val members = r.getSeq[Row](2).flatMap { d =>
          val id = d.getLong(0)
          val w = (2 + id % 5).toInt; val h = (2 + id % 3).toInt
          val rgb = new Array[Int](w * h * 3)
          var i = 0
          while (i < rgb.length) {
            rgb(i) = Multimodal.syntheticPixel(id, i / 3, i % 3); i += 1
          }
          Seq(
            s"$id.txt" -> d.getString(1).getBytes(UTF_8),
            s"$id.json" ->
              s"""{"doc_id":$id,"source":"${jsonEscape(g)}"}""".getBytes(UTF_8),
            s"$id.img" -> Multimodal.encodeBmp(w, h, rgb))
        }
        val tar = archive(members)
        Row(if (gzip) {
          val bos = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write(tar); gz.finish(); gz.close()
          bos.toByteArray
        } else tar)
      }
    }(org.apache.spark.sql.Encoders.row(blobType))
    val outType = StructType(Seq(
      StructField("doc_id", LongType), StructField("json", StringType),
      StructField("text", StringType), StructField("n_members", LongType),
      StructField("img_bytes", LongType)))
    built.mapPartitions { it =>
      it.flatMap { r =>
        val raw = r.getAs[Array[Byte]](0)
        val bytes = if (gzip) Warc.gunzipMembers(raw) else raw
        // sample assembly by basename key — row-local, insertion-
        // ordered so output is deterministic whatever the member
        // interleaving; a key whose stem isn't a long is DROPPED
        // (lenient, the container-parser contract), never a throw
        val samples = scala.collection.mutable.LinkedHashMap
          .empty[String, List[TarMember]]
        parse(bytes).foreach { m =>
          val dot = m.name.lastIndexOf('.')
          val key = if (dot < 0) m.name else m.name.substring(0, dot)
          samples(key) = m :: samples.getOrElse(key, Nil)
        }
        samples.iterator.flatMap { case (key, ms) =>
          key.toLongOption.map { id =>
            def ext(e: String): Option[TarMember] =
              ms.find(_.name.endsWith("." + e))
            Row(id,
              ext("json").map(m => new String(m.data, UTF_8)).orNull,
              ext("txt").map(m => new String(m.data, UTF_8)).orNull,
              ms.length.toLong,
              ext("img").map(_.data.length.toLong)
                .getOrElse(null).asInstanceOf[Any])
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outType))
  }
}
