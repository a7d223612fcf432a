package graft

import org.apache.spark.sql.{Dataset, Encoder}

import scala.util.{Failure, Success, Try}

/** Fully generic typed twin of [[Transformer]] — the `Dataset[T]`
  * analogue of laygo's `Transformer[In, Out]`
  * (laygo/transformers/transformer.py:135), carrying both type
  * parameters so composition is checked at compile time end to end.
  *
  * Positioning vs the DataFrame surface: the typed ops run arbitrary
  * Scala functions per element, which costs an encoder
  * deserialize/serialize round trip per row and opts out of
  * whole-stage codegen — exactly the cost laygo pays for per-chunk
  * Python lambdas, minus the interpreter. Use this surface when the
  * transformation genuinely needs JVM objects (laygo-parity
  * ergonomics, compile-time field checks); stay on [[Transformer]]'s
  * Column builders when the logic is expressible relationally — that
  * is the 100 TB path. Both surfaces share [[PipelineContext]], so a
  * chain can drop from typed to columnar mid-pipeline via
  * [[TypedTransformer.toRows]] + `Dataset.as[U]`.
  *
  * A `TypedTransformer` is immutable; composing returns a new value
  * (subsumes laygo `from_transformer`, transformer.py:166).
  */
final class TypedTransformer[In, Out] private (
    private[graft] val run: (Dataset[In], PipelineContext) => Dataset[Out])
    extends Serializable {

  /** Compose — laygo `apply`/`from_transformer` (transformer.py:335). */
  def andThen[U](next: TypedTransformer[Out, U]): TypedTransformer[In, U] =
    new TypedTransformer((ds, ctx) => next.run(this.run(ds, ctx), ctx))

  /** laygo `apply(lambda t: ...)` — build-and-attach in one step. */
  def apply[U](
      f: TypedTransformer[In, Out] => TypedTransformer[In, U]): TypedTransformer[In, U] =
    f(this)

  private def pipe[U](
      op: (Dataset[Out], PipelineContext) => Dataset[U]): TypedTransformer[In, U] =
    new TypedTransformer((ds, ctx) => op(this.run(ds, ctx), ctx))

  // ---- row-level ops (transformer.py:229,245,269) -------------------

  /** Element map — laygo `map` (transformer.py:229). */
  def map[U: Encoder](f: Out => U): TypedTransformer[In, U] =
    pipe((ds, _) => ds.map(f))

  /** Context-aware map: the function is built once per run from the
    * context (broadcast-config reads happen at plan time, not per
    * row), mirroring laygo's `map(lambda x, ctx: …)`.
    */
  def mapCtx[U: Encoder](f: PipelineContext => Out => U): TypedTransformer[In, U] =
    pipe((ds, ctx) => ds.map(f(ctx)))

  /** Predicate filter — laygo `filter` (transformer.py:245). */
  def filter(p: Out => Boolean): TypedTransformer[In, Out] =
    pipe((ds, _) => ds.filter(p))

  /** Context-aware filter — laygo `filter(lambda x, ctx: …)`. */
  def filterCtx(f: PipelineContext => Out => Boolean): TypedTransformer[In, Out] =
    pipe((ds, ctx) => ds.filter(f(ctx)))

  /** One-to-many map. */
  def flatMap[U: Encoder](f: Out => IterableOnce[U]): TypedTransformer[In, U] =
    pipe((ds, _) => ds.flatMap(f))

  /** Flatten a collection-valued stage — laygo `flatten`
    * (transformer.py:269), typed via the element-evidence overloads
    * laygo spells as `@overload` stubs (transformer.py:263-267).
    */
  def flatten[U](implicit ev: Out <:< IterableOnce[U],
      enc: Encoder[U]): TypedTransformer[In, U] =
    pipe((ds, _) => ds.flatMap(o => ev(o)))

  // ---- side effects (transformer.py:288) ----------------------------

  /** Per-element side effect, value preserved — laygo `tap`. Runs
    * distributed inside the task; at-least-once under retries (same
    * caveat as [[Transformer.tapCount]]).
    */
  def tap(f: Out => Unit)(implicit enc: Encoder[Out]): TypedTransformer[In, Out] =
    pipe((ds, _) => ds.map { o => f(o); o })

  /** Count rows passing this point into a context accumulator —
    * laygo's `tap(print)` idiom with a driver-readable counter.
    */
  def tapCount(counterName: String)(
      implicit enc: Encoder[Out]): TypedTransformer[In, Out] =
    pipe { (ds, ctx) =>
      val acc = ctx.counter(counterName)
      ds.map { o => acc.add(1L); o }
    }

  // ---- aggregation (transformer.py:428,462) -------------------------

  /** Whole-dataset typed reduce — laygo terminal `reduce`
    * (transformer.py:462) with the distributive merge made explicit,
    * so it runs as map-side partial aggregation (see
    * [[TypedOps.foldAggregator]]).
    */
  def reduce[B: Encoder](zero: B, f: (B, Out) => B,
      merge: (B, B) => B): TypedTransformer[In, B] =
    pipe((ds, _) =>
      ds.select(TypedOps.foldAggregator[Out, B, B](zero, f, merge, identity)))

  /** Keyed typed reduce — groupByKey + reduceGroups (partial-agg
    * capable, unlike a repartition-then-fold).
    */
  def reduceByKey[K: Encoder](key: Out => K)(f: (Out, Out) => Out)(
      implicit enc: Encoder[(K, Out)]): TypedTransformer[In, (K, Out)] =
    pipe((ds, _) => ds.groupByKey(key).reduceGroups(f))

  /** Literal per-chunk reduce — one folded value per partition (chunk
    * = partition), laygo `reduce(..., per_chunk=True)`
    * (transformer.py:428). Result depends on the partitioning; pair
    * with [[setChunker]] for deterministic chunks.
    */
  def reducePerChunk[B: Encoder](zero: B)(f: (B, Out) => B): TypedTransformer[In, B] =
    pipe((ds, _) => ds.mapPartitions(it => Iterator.single(it.foldLeft(zero)(f))))

  /** Re-chunk — laygo `set_chunker` (transformer.py:186); a chunk is a
    * partition.
    */
  def setChunker(numPartitions: Int): TypedTransformer[In, Out] =
    pipe((ds, _) => ds.repartition(numPartitions))

  // ---- control flow (transformer.py:346,537) ------------------------

  /** Iterate `body` while `condition` holds — laygo `loop`
    * (transformer.py:346). Same lineage-cut protocol as
    * [[Transformer.loop]]: localCheckpoint every `checkpointInterval`
    * rounds so the plan cannot grow without bound.
    */
  def loop(body: TypedTransformer[Out, Out], condition: Dataset[Out] => Boolean,
      maxIterations: Int, checkpointInterval: Int = 3): TypedTransformer[In, Out] =
    pipe { (ds0, ctx) =>
      var ds = ds0
      var i = 0
      while (i < maxIterations && condition(ds)) {
        val next = body.run(ds, ctx)
        ds = if ((i + 1) % checkpointInterval == 0) next.localCheckpoint() else next
        i += 1
      }
      ds
    }

  /** Driver-side guard — laygo `short_circuit` (transformer.py:537). */
  def shortCircuit(
      guard: (Dataset[Out], PipelineContext) => Boolean): TypedTransformer[In, Out] =
    pipe { (ds, ctx) =>
      if (guard(ds, ctx))
        throw new IllegalStateException("Short-circuit condition met, stopping execution.")
      ds
    }

  // ---- error handling (transformer.py:488) --------------------------

  /** Element-isolated try/catch — laygo `catch` (transformer.py:488)
    * at element granularity: apply `f`, route failures through
    * `handler` (laygo's on_error chain); `None` drops the element
    * (laygo's "return []" default, transformer.py:533). A task never
    * dies for a data error.
    */
  def catchMap[U: Encoder](f: Out => U,
      handler: (Out, Throwable) => Option[U] = (_: Out, _: Throwable) => None)
      : TypedTransformer[In, U] =
    pipe((ds, _) => ds.flatMap { o =>
      Try(f(o)) match {
        case Success(u) => Iterator.single(u)
        case Failure(e) => handler(o, e).iterator
      }
    })

  /** Escape hatch to the relational surface: hand the typed stage's
    * Dataset to a plan-level rewrite (mirrors `Pipeline.apply` with a
    * raw callable, pipeline.py:176).
    */
  def toRows[U](f: Dataset[Out] => Dataset[U]): TypedTransformer[In, U] =
    pipe((ds, _) => f(ds))
}

object TypedTransformer {
  /** Identity — laygo `create_transformer[T]` (transformer.py:36). */
  def identity[T]: TypedTransformer[T, T] =
    new TypedTransformer((ds, _) => ds)

  def apply[In, Out](
      f: (Dataset[In], PipelineContext) => Dataset[Out]): TypedTransformer[In, Out] =
    new TypedTransformer(f)
}

/** Typed pipeline head — `Pipeline` (pipeline.py:108) over a
  * `Dataset[T]`. Thin by design: sources/sinks/branching stay on the
  * DataFrame [[Pipeline]] (schema-dynamic by nature); this wrapper
  * exists so a fully typed chain can run source→transform→sink without
  * leaving `Dataset[T]`.
  */
final class TypedPipeline[T] private (
    val ds: Dataset[T], val context: PipelineContext) {

  def transform[U](t: TypedTransformer[T, U]): TypedPipeline[U] =
    new TypedPipeline(t.run(ds, context), context)

  def transform[U](f: TypedTransformer[T, T] => TypedTransformer[T, U]): TypedPipeline[U] =
    transform(f(TypedTransformer.identity[T]))

  /** laygo `Pipeline.to_list` (pipeline.py:280) — driver-bounded. */
  def toList(): Seq[T] = ds.collect().toSeq

  /** laygo `Pipeline.first(n)` (pipeline.py:321). */
  def first(n: Int = 1): Seq[T] = ds.head(n).toSeq

  /** laygo `Pipeline.__iter__` (pipeline.py:264) — streamed partitions. */
  def iterator: Iterator[T] = {
    import scala.jdk.CollectionConverters._
    ds.toLocalIterator().asScala
  }

  /** laygo `Pipeline.each` (pipeline.py:297) — distributed foreach. */
  def each(f: T => Unit): Unit = ds.foreach(f)

  /** laygo `Pipeline.consume` (pipeline.py:346) — run for effects.
    * The iterator must be DRAINED: partitions are pull-based, so a
    * no-op that ignores the iterator would skip upstream side effects.
    */
  def consume(): Unit = ds.foreachPartition((it: Iterator[T]) => it.foreach(_ => ()))
}

object TypedPipeline {
  def apply[T](ds: Dataset[T]): TypedPipeline[T] =
    new TypedPipeline(ds, PipelineContext(ds.sparkSession))

  def apply[T](ds: Dataset[T], ctx: PipelineContext): TypedPipeline[T] =
    new TypedPipeline(ds, ctx)
}
