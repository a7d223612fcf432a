package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming mirrors of the batch operators.
  *
  * Laygo's `buffer`/iterator pipelines approximate streaming on one
  * machine (pipeline.py:221,264); the Spark-native reading is
  * Structured Streaming: the same declarative transforms applied to an
  * unbounded source with watermark-bounded state. Every `Transformer`
  * built from Column expressions (map/filter/flatten/…) already works
  * on a streaming DataFrame unchanged — these helpers add the
  * state-bound pieces (windows, sessionization) that need watermarks.
  *
  * State design for scale: all aggregations are keyed, watermarks
  * bound state size, and sessionization uses per-key timeouts —
  * nothing accumulates unboundedly on a 1000-executor cluster.
  */
object Streams {

  /** Tumbling-window aggregate with watermark — the streaming
    * `reducePerKey`. Late data beyond `watermarkDelay` is dropped and
    * window state is evicted, keeping state bounded.
    */
  def windowedAgg(
      events: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      windowLength: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowLength) +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session windows via the built-in gap-based session_window — the
    * streaming mirror of the batch `events_sessionize` query.
    */
  def sessionWindowAgg(
      events: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      gap: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy((session_window(col(tsCol), gap) +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Running per-key state with explicit `GroupState` — laygo's
    * mutable shared-context pattern (context/parallel.py:21) done the
    * way that scales: state is partitioned by key, checkpointed, and
    * timed out, never a process-global dict.
    *
    * Emits (key, runningCount, runningSum) on every update.
    */
  def runningTotals(
      events: Dataset[(String, Double)]): Dataset[(String, Long, Double)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (String, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Long, Double)]) =>
          val (c0, s0) = state.getOption.getOrElse((0L, 0.0))
          var c = c0
          var s = s0
          rows.foreach { r => c += 1; s += r._2 }
          state.update((c, s))
          (key, c, s)
      }
  }

  /** Watermarked streaming dedup — exact dedup for unbounded sources:
    * duplicate keys arriving within the watermark horizon are dropped;
    * state for keys older than the watermark is evicted, keeping the
    * dedup table bounded (the streaming mirror of `Dedup.exact`).
    */
  def dedupWithinWatermark(
      events: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Windowed stream-stream inner join: both sides watermarked, join
    * condition bounded by an event-time range so each side's buffered
    * state is evicted once the other side's watermark passes — the
    * only join shape that runs unbounded without unbounded state.
    */
  def streamStreamJoin(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      watermarkDelay: String,
      key: String,
      maxLag: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxLag"))
  }

  /** Stream → noop-style sink for tests/benchmarks: process all
    * available data once and stop (Trigger.AvailableNow semantics via
    * processAllAvailable on a memory sink).
    */
  def runToMemory(df: DataFrame, name: String, outputMode: OutputMode): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** One-shot batch-over-stream execution with Trigger.AvailableNow:
    * processes everything available at start time (possibly as several
    * rate-limited micro-batches) and terminates. This is the mode the
    * batch↔streaming equivalence harness runs — same parquet in, same
    * rows out as the batch operator.
    */
  def runToMemoryAvailableNow(df: DataFrame, name: String, outputMode: OutputMode): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
