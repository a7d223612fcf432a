package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

import graft.Pipeline

/** Source bindings — laygo pipelines start from Python iterables
  * (pipeline.py:94); graft pipelines start from distributed sources.
  * Local collections are supported for parity (and tests), files for
  * real work. All readers return lazy scans: filters/projections
  * applied later in the pipeline reach the file scan via Catalyst.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): Pipeline =
    Pipeline(spark.read.parquet(path))

  def csv(spark: SparkSession, path: String, header: Boolean = true,
      inferSchema: Boolean = true): Pipeline =
    Pipeline(spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path))

  def json(spark: SparkSession, path: String): Pipeline =
    Pipeline(spark.read.json(path))

  /** Local collection → distributed dataset (laygo `Pipeline(data)`). */
  def values[T: Encoder](spark: SparkSession, data: Seq[T]): Pipeline =
    Pipeline(spark.createDataset(data)(implicitly[Encoder[T]]).toDF())

  /** Typed dataset passthrough for case-class rows. */
  def dataset[T](ds: Dataset[T]): Pipeline = Pipeline(ds.toDF())

  /** Numeric range source (laygo tests' `range(n)` inputs). */
  def range(spark: SparkSession, n: Long): Pipeline =
    Pipeline(spark.range(n).toDF("id"))

  /** Streaming file source — the unbounded analogue; pair with
    * graft.streaming.Streams transforms.
    */
  def streamParquet(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Stream ONE table of a testdata sf directory. The file-stream
    * source only accepts directories, and the driver's layout varies:
    * `dir/name.parquet` is a single FILE in driver-generated dirs but
    * a DIRECTORY of part files in DataGen replicas. Stream the table
    * dir directly when it is one; otherwise stream the parent dir with
    * a pathGlobFilter so only the table's file is listed (not every
    * other table's — the filter prunes at listing time, before I/O).
    */
  def streamTable(spark: SparkSession, dir: String, name: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new java.io.File(s"$dir/$name.parquet")
    if (p.isDirectory) spark.readStream.schema(schema).parquet(p.toString)
    else spark.readStream.schema(schema)
      .option("pathGlobFilter", s"$name.parquet").parquet(dir)
  }

  /** Shuffle/state-store partition count for a streaming replay over
    * one table, derived from its on-disk bytes: one partition per
    * ~4 MB of compressed parquet, clamped to [1, 32768]. Streaming
    * plans get no AQE coalescing, so this is the streaming twin of
    * the advisory-size rule the batch queries rely on — input-derived
    * at ANY scale, never a constant tuned to local mode or the
    * cluster. The per-partition target is deliberately SMALLER than a
    * batch shuffle partition's: the stateful replays run a CPU-bound
    * state machine per event (sessionize/dedup-window), so a
    * partition here is a unit of COMPUTE parallelism, not just
    * shuffle-buffer sizing — measured at sf1 (20 MB events), one
    * partition serialized stream_dedup_window to 8.9 s where five
    * read the r17 level; at sf0.1 (2 MB) both targets give 1
    * partition and the 32 RocksDB instances the constant session
    * width used to create stay gone. At 100 TB the 32768 cap
    * dominates either target.
    */
  def sizedShufflePartitions(dir: String, name: String): Int = {
    val p = new java.io.File(s"$dir/$name.parquet")
    val bytes =
      if (p.isDirectory)
        Option(p.listFiles()).map(_.map(_.length).sum).getOrElse(0L)
      else p.length()
    val per = 4L << 20
    math.max(1L, math.min(32768L, (bytes + per - 1) / per)).toInt
  }
}
