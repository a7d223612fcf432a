package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video ride through the
  * pipeline as opaque `binary` columns plus a typed metadata struct.
  *
  * The Spark-side plumbing — schema, batch shape, partition-parallel
  * decode via `mapPartitions` over binary rows — is real and tested.
  * The codec step itself is STUBBED with a deterministic fake
  * (`decodeStub`): the container has no image/audio libraries, and at
  * deployment the stub body is replaced by the real decoder (e.g.
  * libjpeg/ffmpeg bindings) with an identical signature.
  */
object Multimodal {

  /** Metadata struct carried next to every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Wrap a UTF-8 text column as a binary payload (used by tests and
    * the synthetic tables, which carry no real media bytes).
    */
  def utf8Payload(text: Column): Column = encode(text, "UTF-8")

  /** Container sniffing from magic bytes — pure expressions, runs in
    * the scan stage. Recognizes PNG/JPEG/RIFF(WAV-AVI)/MP4-ftyp.
    */
  def sniffKind(bin: Column): Column =
    when(hex(substring(bin, 1, 4)) === "89504E47", "png")
      .when(hex(substring(bin, 1, 3)) === "FFD8FF", "jpeg")
      .when(hex(substring(bin, 1, 4)) === "52494646", "riff")
      .when(hex(substring(bin, 5, 4)) === "66747970", "mp4")
      .otherwise("unknown")

  /** Typed metadata for a payload column. Checksum = xxhash64 of the
    * bytes (cheap content id for exact dedup of media).
    */
  def mediaMeta(bin: Column): Column =
    struct(
      sniffKind(bin).as("kind"),
      octet_length(bin).cast("long").as("n_bytes"),
      xxhash64(bin).as("checksum"))

  /** Output schema of the (stubbed) feature extractor. */
  def featureSchema(idField: StructField): StructType = StructType(Seq(
    idField,
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** Partition-parallel decode + feature extraction over binary
    * payloads. This is the real distribution plumbing (one decoder
    * instance per partition, streaming over rows, no driver
    * involvement); only the per-payload byte→feature function is a
    * deterministic stand-in for a codec.
    *
    * @param featureDim length of the produced feature vector
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String, featureDim: Int = 8): DataFrame = {
    val idField  = df.schema(idCol)
    val idIdx    = df.schema.fieldIndex(idCol)
    val binIdx   = df.schema.fieldIndex(binCol)
    val outType  = featureSchema(idField)
    val enc      = org.apache.spark.sql.Encoders.row(outType)
    df.mapPartitions { it =>
      // per-partition decoder init would happen here (codec handles,
      // GPU context, …) — once per task, not per row
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val (kind, feat) = decodeStub(bytes, featureDim)
        Row(r.get(idIdx), kind, bytes.length.toLong, feat)
      }
    }(enc)
  }

  /** STUB decoder: deterministic fake features from the payload bytes.
    * Replace the body with a real codec at deployment; the signature
    * (bytes in, kind + fixed-dim float features out) is the contract.
    */
  def decodeStub(bytes: Array[Byte], featureDim: Int): (String, Array[Float]) = {
    val kind =
      if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 0x50) "png"
      else if (bytes.length >= 3 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else "unknown"
    val feat = new Array[Float](featureDim)
    var i = 0
    while (i < bytes.length) {
      feat(i % featureDim) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    (kind, feat)
  }

  /** Deterministic frame sampling plumbing for video-like payloads:
    * slice `n` evenly spaced byte windows (stand-in for frame decode)
    * as one row per sample — the explode/partition shape a real frame
    * sampler produces.
    */
  def frameSample(df: DataFrame, idCol: String, binCol: String, n: Int): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(binCol)).cast("long").as("n_bytes"),
      explode(sequence(lit(0L), lit(n - 1L))).as("frame_idx"))
      .withColumn("frame_pos", floor(col("frame_idx") * col("n_bytes") / n).cast("long"))
      .select(col(idCol), col("frame_idx"), col("frame_pos"))
}
