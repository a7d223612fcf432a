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

  test("utf8 payload round-trips through binary column") {
    val df = Seq((1L, "héllo wörld")).toDF("id", "text")
    val back = df.select(decode(Multimodal.utf8Payload(col("text")), "UTF-8").as("t"))
      .collect().head.getString(0)
    assert(back == "héllo wörld")
  }
}
