package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.jdk.CollectionConverters._

/** Data-source binding + sinks — the Spark-native analogue of laygo's
  * `Pipeline` (reference: laygo/pipeline.py:71).
  *
  * Differences forced by scale:
  *   - laygo's pipeline is a single-use Python iterator; here the
  *     pipeline wraps an immutable logical plan, so it is re-runnable
  *     and every sink triggers one distributed execution;
  *   - sinks that move data to the driver (`toList`, `first`) are
  *     explicit about it; the distributed sinks (`each`, `consume`)
  *     never collect;
  *   - `branch` caches the source once and derives children from the
  *     cached plan — laygo's producer/consumer queues (pipeline.py:367)
  *     become one shared scan plus N cheap filtered subplans.
  */
final class Pipeline private (
    val spark: SparkSession,
    private val df: DataFrame,
    val context: PipelineContext) {

  /** Current logical plan (non-terminal escape hatch). */
  def toDF: DataFrame = df

  /** Typed view of the pipeline for case-class rows (compile-time
    * field checking; see TypedOps for typed aggregation).
    */
  def toDS[T: org.apache.spark.sql.Encoder]: org.apache.spark.sql.Dataset[T] = df.as[T]

  private def next(d: DataFrame): Pipeline = new Pipeline(spark, d, context)

  /** Attach/override context config — laygo `Pipeline.context`
    * (pipeline.py:119).
    */
  def withContext(kv: (String, String)*): Pipeline =
    new Pipeline(spark, df, context.updated(kv: _*))

  /** Build-and-apply a transformer — laygo `transform` (pipeline.py:143). */
  def transform(f: Transformer => Transformer): Pipeline =
    apply(f(Transformer.identity))

  /** Apply a prebuilt transformer — laygo `apply` (pipeline.py:176). */
  def apply(t: Transformer): Pipeline = next(t.run(df, context))

  /** Apply a raw plan function — laygo `apply` with a callable. */
  def apply(f: DataFrame => DataFrame): Pipeline = next(f(df))

  /** Read-ahead decoupling — laygo `buffer` (pipeline.py:221). Spark
    * already pipelines within a stage, so "buffering" means: persist
    * the upstream result (materialized once, readable ahead by any
    * number of downstream stages) and optionally rebalance partitions
    * so downstream parallelism is decoupled from upstream layout.
    */
  def buffer(numPartitions: Int = 0): Pipeline = {
    val repart = if (numPartitions > 0) df.repartition(numPartitions) else df
    next(repart.persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** `buffer` with laygo's second knob (pipeline.py:221
    * `buffer(size, batch_size)`): `batchRows` bounds the rows per
    * buffered chunk. On Spark "chunk" = partition, so the partition
    * count derives from the ACTUAL row count — persist first, take the
    * count off the materialized buffer (one cached-scan job, the cost
    * laygo's eager queue fill also pays), then rebalance to
    * ceil(rows / batchRows) partitions capped at `numPartitions`
    * (the queue-depth knob) when both are given.
    */
  def buffer(numPartitions: Int, batchRows: Long): Pipeline = {
    require(batchRows >= 1, "batchRows must be at least 1")
    val buffered = df.persist(StorageLevel.MEMORY_AND_DISK)
    val parts = ((buffered.count() + batchRows - 1) / batchRows).toInt.max(1)
    val target = if (numPartitions > 0) math.min(parts, numPartitions) else parts
    next(buffered.repartition(target))
  }

  // ---- terminal sinks (pipeline.py:264-365) -------------------------

  /** Materialize to the driver — laygo `to_list` (pipeline.py:280).
    * Returns (rows, final context) like the reference.
    */
  def toList(): (Seq[Row], Map[String, Any]) =
    (df.collect().toSeq, context.toMap)

  /** Streaming iteration on the driver — laygo `__iter__`
    * (pipeline.py:264). `toLocalIterator` keeps only one partition in
    * flight, the honest equivalent of laygo's lazy iterator.
    */
  def iterator: Iterator[Row] = df.toLocalIterator().asScala

  /** First n rows with limit pushed into the plan — laygo `first(n)`
    * (pipeline.py:321). Never collect-then-slice.
    */
  def first(n: Int = 1): (Seq[Row], Map[String, Any]) = {
    require(n >= 1, "n must be at least 1")
    (df.limit(n).collect().toSeq, context.toMap)
  }

  /** Distributed per-row side effect — laygo `each` (pipeline.py:297).
    * Runs on executors; nothing is collected.
    */
  def each(f: Row => Unit): (Unit, Map[String, Any]) = {
    df.foreach(f)
    ((), context.toMap)
  }

  /** Arrival-order driver consumption — laygo's threaded strategy with
    * `ordered=False` (strategies/threaded.py:13): the handler receives
    * each chunk's rows AS ITS TASK COMPLETES, not in partition-index
    * order, so a straggler partition never blocks results that are
    * already done. (`iterator`/`toList` restore deterministic order;
    * this sink deliberately does not.) One partition's rows are
    * buffered at a time on the driver per completion — bounded like
    * `toLocalIterator`, but without its head-of-line blocking.
    */
  def eachArrival(f: Seq[Row] => Unit): (Unit, Map[String, Any]) = {
    spark.sparkContext.runJob(
      df.rdd,
      (rows: Iterator[Row]) => rows.toArray,
      (_: Int, rows: Array[Row]) => f(rows.toSeq))
    ((), context.toMap)
  }

  /** Full materialization without result movement — laygo `consume`
    * (pipeline.py:346). The noop sink executes the complete plan
    * (side effects, observe metrics, accumulators all fire).
    */
  def consume(): (Unit, Map[String, Any]) = {
    df.write.format("noop").mode("overwrite").save()
    ((), context.toMap)
  }

  // ---- branch (pipeline.py:367-556) ---------------------------------

  /** Unconditional fan-out: every row to every branch — laygo `branch`
    * with a plain map (pipeline.py:496). The source plan is cached
    * once; each branch is a derived plan over the cache.
    */
  def branch(branches: Seq[(String, Transformer)]): (Map[String, DataFrame], Map[String, Any]) = {
    if (branches.isEmpty) { consume(); return (Map.empty, context.toMap) } // laygo: {} (pipeline.py:518)
    val src = df.persist(StorageLevel.MEMORY_AND_DISK)
    val out = branches.map { case (name, t) => name -> t.run(src, context) }.toMap
    (out, context.toMap)
  }

  /** Conditional routing, first match wins — laygo `branch(…,
    * first_match=True)` (pipeline.py:390). One pass assigns each row
    * its branch via a first-match `when` chain (provably disjoint),
    * then each branch filters the cached assignment.
    */
  def branchRouter(
      branches: Seq[(String, Column, Transformer)]): (Map[String, DataFrame], Map[String, Any]) = {
    if (branches.isEmpty) { consume(); return (Map.empty, context.toMap) } // laygo: {} (pipeline.py:518)
    // First-match chain: when(c1, n1).when(c2, n2)… — order preserved.
    val assign = branches.tail.foldLeft(when(branches.head._2, branches.head._1)) {
      case (acc, (name, cond, _)) => acc.when(cond, name)
    }
    val src = df.withColumn("__branch", assign).persist(StorageLevel.MEMORY_AND_DISK)
    val out = branches.map { case (name, _, t) =>
      name -> t.run(src.where(col("__branch") === name).drop("__branch"), context)
    }.toMap
    (out, context.toMap)
  }

  /** Conditional broadcast: every matching branch gets the row — laygo
    * `branch(…, first_match=False)` (pipeline.py:424). Cached source,
    * per-branch predicate filter.
    */
  def branchBroadcast(
      branches: Seq[(String, Column, Transformer)]): (Map[String, DataFrame], Map[String, Any]) = {
    if (branches.isEmpty) { consume(); return (Map.empty, context.toMap) } // laygo: {} (pipeline.py:518)
    val src = df.persist(StorageLevel.MEMORY_AND_DISK)
    val out = branches.map { case (name, cond, t) =>
      name -> t.run(src.where(cond), context)
    }.toMap
    (out, context.toMap)
  }
}

object Pipeline {
  /** Bind one or more sources; several sources are chained like laygo's
    * `Pipeline(*data)` (pipeline.py:108) via unionByName.
    */
  def apply(first: DataFrame, rest: DataFrame*): Pipeline = {
    val spark = first.sparkSession
    val df = rest.foldLeft(first)((a, b) => a.unionByName(b, allowMissingColumns = true))
    new Pipeline(spark, df, PipelineContext(spark))
  }

  def apply(df: DataFrame, ctx: PipelineContext): Pipeline =
    new Pipeline(df.sparkSession, df, ctx)
}
