package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable, lazy plan transformation — the Spark-native analogue of
  * laygo's `Transformer` (reference: laygo/transformers/transformer.py:135).
  *
  * Laygo composes per-chunk Python lambdas; here every operator is a
  * builder over Spark's logical plan, so the whole chain stays inside
  * Catalyst: filters push down to the scan, projections prune columns,
  * and the fused chain runs in whole-stage codegen. A laygo "chunk" is
  * a Spark partition; the chunk-at-a-time strategies (sequential /
  * threaded / process, in strategies dir) collapse into Spark's own task
  * scheduling and need no user-facing API.
  *
  * A `Transformer` is immutable: composing returns a new value, which
  * also subsumes `Transformer.from_transformer` (transformer.py:166) —
  * reuse is just reuse of the value.
  */
final class Transformer private (
    private[graft] val run: (DataFrame, PipelineContext) => DataFrame)
    extends Serializable {

  /** Compose with another transformer — laygo `apply` (transformer.py:335). */
  def andThen(next: Transformer): Transformer =
    new Transformer((df, ctx) => next.run(this.run(df, ctx), ctx))

  private def pipe(op: (DataFrame, PipelineContext) => DataFrame): Transformer =
    new Transformer((df, ctx) => op(this.run(df, ctx), ctx))

  // ---- row-level ops (transformer.py:229,245,269) -------------------

  /** Projection map — laygo `map` with a full-row output expression. */
  def map(cols: Column*): Transformer = pipe((df, _) => df.select(cols: _*))

  /** Context-aware map: the builder sees the context (broadcast config
    * as literal Columns), mirroring laygo's `map(lambda x, ctx: …)`.
    */
  def mapCtx(f: PipelineContext => Seq[Column]): Transformer =
    pipe((df, ctx) => df.select(f(ctx): _*))

  /** Add/replace a single derived field (map that keeps the row). */
  def withField(name: String, col: Column): Transformer =
    pipe((df, _) => df.withColumn(name, col))

  /** Arbitrary plan rewrite — escape hatch mirroring `Pipeline.apply`
    * with a raw callable (pipeline.py:176).
    */
  def mapPlan(f: DataFrame => DataFrame): Transformer = pipe((df, _) => f(df))

  /** Predicate filter — laygo `filter`; lands in parquet PushedFilters. */
  def filter(pred: Column): Transformer = pipe((df, _) => df.where(pred))

  /** Context-aware filter — laygo `filter(lambda x, ctx: …)`. */
  def filterCtx(f: PipelineContext => Column): Transformer =
    pipe((df, ctx) => df.where(f(ctx)))

  /** Flatten a collection column into rows — laygo `flatten`
    * (transformer.py:269) as the `explode` generator.
    */
  def flatten(col: Column, as: String): Transformer =
    pipe((df, _) => df.withColumn(as, explode(col)))

  // ---- side effects (transformer.py:288) ----------------------------

  /** Side-effect observation without a second pass — laygo `tap`.
    * Spark's `observe` attaches metric aggregates to the plan; they
    * are published when the query runs, costing zero extra scans.
    */
  def tap(name: String, metric: Column, metrics: Column*): Transformer =
    pipe((df, _) => df.observe(name, metric, metrics: _*))

  /** Tap with a retrievable handle: metrics land in the passed
    * `Observation` after the next action, the closest analogue of
    * laygo's tap-into-context (observe side-channel, zero extra pass).
    */
  def tapInto(obs: org.apache.spark.sql.Observation, metric: Column, metrics: Column*): Transformer =
    pipe((df, _) => df.observe(obs, metric, metrics: _*))

  /** Per-row side effect counted into a context accumulator — laygo's
    * `tap(print)` idiom. CAVEAT: accumulator updates inside a
    * transformation are at-least-once under Spark's execution model —
    * task retries, speculative execution, or running TWO actions over
    * the same plan each re-add. Read the counter after exactly one
    * action, or use `tapInto` (observe) for exactly-once metrics.
    */
  def tapCount(counterName: String): Transformer =
    pipe { (df, ctx) =>
      val acc = ctx.counter(counterName)
      df.mapPartitions { it => it.map { r => acc.add(1L); r } }(
        org.apache.spark.sql.Encoders.row(df.schema))
    }

  // ---- aggregation (transformer.py:428,462) -------------------------

  /** Whole-dataset reduce (laygo terminal `reduce`): global agg. */
  def reduceGlobal(agg0: Column, aggs: Column*): Transformer =
    pipe((df, _) => df.agg(agg0, aggs: _*))

  /** Keyed reduce. Laygo's `per_chunk=True` reduce collapses each
    * chunk; the scalable Spark reading is partial (map-side) combine
    * per partition followed by a merge — exactly what groupBy().agg()
    * of built-in aggregates compiles to.
    */
  def reducePerKey(keys: Seq[Column], aggs: Seq[Column]): Transformer =
    pipe((df, _) => df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*))

  /** Literal per-chunk reduce — one aggregate row per partition
    * (chunk = partition), keyed by `spark_partition_id`. Matches laygo
    * `reduce(..., per_chunk=True)` (transformer.py:436) exactly; note
    * the result depends on the current partitioning, so pair with
    * `setChunker` for deterministic chunk boundaries.
    */
  def reducePerChunk(aggs: Seq[Column]): Transformer =
    pipe((df, _) =>
      df.groupBy(spark_partition_id().as("chunk")).agg(aggs.head, aggs.tail: _*))

  /** Custom chunking — laygo `set_chunker` (transformer.py:186). A
    * laygo chunk is a Spark partition, so re-chunking is repartitioning:
    * by count, or by key columns for co-located downstream work.
    */
  def setChunker(numPartitions: Int, keys: Column*): Transformer =
    pipe { (df, _) =>
      if (keys.isEmpty) df.repartition(numPartitions)
      else df.repartition(numPartitions, keys: _*)
    }

  /** Rows-per-chunk sizing — laygo `chunk_size` (transformer.py:36),
    * the reference's default chunking knob. The partition count comes
    * from the optimizer's PLAN-TIME row estimate (CBO rowCount when
    * available, else sizeInBytes over the schema's row width) — no job
    * runs at build time, per SURVEY §4 rule 1. The estimate makes the
    * chunk size approximate, which is the right trade: an exact count
    * would cost a full extra pass over 100 TB before the real work.
    */
  def setChunkerByRows(rowsPerChunk: Long): Transformer = {
    require(rowsPerChunk >= 1, "rowsPerChunk must be at least 1")
    pipe { (df, _) =>
      val stats = df.queryExecution.optimizedPlan.stats
      val estRows = stats.rowCount.map(_.toLong).getOrElse {
        val rowWidth = math.max(1, df.schema.defaultSize)
        (stats.sizeInBytes / rowWidth).min(BigInt(Long.MaxValue)).toLong
      }
      val parts = ((estRows + rowsPerChunk - 1) / rowsPerChunk)
        .max(1L).min(1 << 20).toInt
      df.repartition(parts)
    }
  }

  // ---- control flow (transformer.py:346,537) ------------------------

  /** Iterate `body` while `condition(df)` holds, at most `maxIterations`
    * times — laygo `loop`. Lineage is cut with `localCheckpoint` every
    * `checkpointInterval` rounds (without it, iteration N re-executes
    * rounds 1..N-1 and the plan grows without bound — fatal at scale;
    * checkpointing EVERY round would instead pay a full materialization
    * per iteration).
    */
  def loop(
      body: Transformer,
      condition: DataFrame => Boolean,
      maxIterations: Int,
      checkpointInterval: Int = 3): Transformer =
    pipe { (df0, ctx) =>
      var df = df0
      var i = 0
      while (i < maxIterations && condition(df)) {
        val next = body.run(df, ctx)
        df = if ((i + 1) % checkpointInterval == 0) next.localCheckpoint() else next
        i += 1
      }
      df
    }

  /** Guard the rest of the pipeline on a context/driver predicate —
    * laygo `short_circuit`. The guard is evaluated once on the driver
    * (cheap aggregate or context check); on trigger the pipeline halts.
    */
  def shortCircuit(guard: (DataFrame, PipelineContext) => Boolean): Transformer =
    pipe { (df, ctx) =>
      if (guard(df, ctx))
        throw new IllegalStateException("Short-circuit condition met, stopping execution.")
      df
    }

  // ---- error handling (transformer.py:488, errors.py:25) ------------

  /** Chunk-isolated try/catch — laygo `catch`. In Spark a task failure
    * kills the job, so the scalable translation is: run `attempt`
    * built from try-expressions (try_cast, try_divide) or null-safe ones, split rows on
    * `isError`, hand the error bucket to `handler` (laygo's on_error
    * chain, errors.py:25), and continue with ok ∪ handled.
    * `handler` defaults to dropping the bad rows, like laygo's
    * "return []" default (transformer.py:533).
    */
  def catchErrors(
      attempt: Transformer,
      isError: Column,
      handler: ErrorHandler = ErrorHandler.drop): Transformer =
    pipe { (df, ctx) =>
      val out  = attempt.run(df, ctx)
      val ok   = out.where(!isError)
      val bad  = out.where(isError)
      handler.handle(bad, ctx) match {
        case Some(replaced) => ok.unionByName(replaced, allowMissingColumns = true)
        case None           => ok
      }
    }
}

object Transformer {
  /** Identity transformer — laygo `create_transformer` (transformer.py:36). */
  val identity: Transformer = new Transformer((df, _) => df)

  def apply(f: (DataFrame, PipelineContext) => DataFrame): Transformer =
    new Transformer(f)
}

/** Ordered error-handler chain over the quarantine bucket — laygo
  * `ErrorHandler` (errors.py:25-61). Each handler may transform the
  * error rows (e.g. tag + route to a dead-letter sink); `None` means
  * the rows are dropped from the main flow.
  */
final class ErrorHandler private (
    handlers: Vector[(DataFrame, PipelineContext) => Option[DataFrame]])
    extends Serializable {

  def onError(h: (DataFrame, PipelineContext) => Option[DataFrame]): ErrorHandler =
    new ErrorHandler(handlers :+ h)

  /** Run the chain; the last non-None result wins (laygo's handlers
    * run in registration order for side effects, errors.py:52).
    */
  def handle(bad: DataFrame, ctx: PipelineContext): Option[DataFrame] =
    handlers.foldLeft(Option.empty[DataFrame]) { (acc, h) =>
      h(bad, ctx).orElse(acc)
    }
}

object ErrorHandler {
  /** Default: drop error rows (laygo returns [] on chunk failure). */
  val drop: ErrorHandler = new ErrorHandler(Vector.empty)

  /** Keep error rows, tagged with a status column — quarantine. */
  def quarantine(tag: (DataFrame, PipelineContext) => DataFrame): ErrorHandler =
    new ErrorHandler(Vector((df, ctx) => Some(tag(df, ctx))))
}
