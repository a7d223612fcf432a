package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** Terminal sinks beyond the driver-local ones on Pipeline.
  *
  * Laygo's HTTP transformer (transformers/http.py:60,97) ships chunks
  * to remote worker processes over HTTP — its distribution layer. On
  * Spark the cluster IS the distribution layer, so the surviving use
  * case is egress: pushing results to an external service from the
  * executors, batched per partition. `foreachPartitionPush` is that
  * pattern with the transport injected (tests inject a collector; a
  * real deployment injects an HTTP/queue client) — one client per
  * partition, never per row, never through the driver.
  */
object Sinks {

  /** Push rows to an external system, batched per partition.
    *
    * @param mkClient  constructed once per partition (connection setup)
    * @param push      called per batch of rows
    * @param close     called once per partition
    * @param batchSize rows per push call
    */
  def foreachPartitionPush[C](
      df: DataFrame,
      mkClient: () => C,
      push: (C, Seq[Row]) => Unit,
      close: C => Unit,
      batchSize: Int = 1000): Unit =
    df.foreachPartition { (it: Iterator[Row]) =>
      val client = mkClient()
      try it.grouped(batchSize).foreach(batch => push(client, batch))
      finally close(client)
    }

  /** Partitioned parquet writer — the durable sink for 100 TB outputs:
    * partition columns prune downstream scans, writer-side maxRecords
    * keeps file sizes bounded.
    */
  def parquetPartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val w = df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Full materialization with zero result movement (noop sink). */
  def consume(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Training-shard writer: the end of the corpus pipeline. Rows get
    * [[graft.operators.Corpus.shuffleShards]]' deterministic scrambled
    * order (nShards independent windowed orders — never one global
    * ORDER BY), then land as one partition directory per shard with
    * rows physically sorted by their within-shard position, so a
    * training job reads each shard file sequentially in the intended
    * order. Reproducible: same corpus + seed → byte-identical shard
    * layout on any cluster.
    */
  def writeTrainingShards(
      df: DataFrame,
      idCol: String,
      path: String,
      nShards: Int,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val order = graft.operators.Corpus.shuffleShards(df, idCol, nShards)
    df.join(order, Seq(idCol))
      .repartition(nShards, org.apache.spark.sql.functions.col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy("shard")
      .parquet(path)
  }

  /** Bucketed managed table: pre-shuffles once at write time so every
    * later equi-join/aggregation on the bucket key runs with NO
    * exchange — the co-located-join strategy for fact tables that are
    * joined repeatedly at 100 TB. Bucket count should match the
    * target cluster's parallelism, not the data size of one write.
    */
  def parquetBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
