package graft

import org.apache.spark.sql.{Dataset, Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Dataset[T]` surface — compile-time field checking for the
  * pipelines where a case class models the row (the brief's guidance:
  * `Dataset[T]` where type safety helps, `DataFrame` where schema is
  * dynamic).
  *
  * Laygo's terminal `reduce(f, initial)` (transformer.py:462) folds
  * arbitrary Scala functions. The scalable Spark translation is an
  * `Aggregator[IN, BUF, OUT]`: the fold must be decomposed into
  * reduce (within partition) + merge (across partitions) so it can
  * run as a map-side partial aggregate — a plain left fold cannot
  * distribute. `foldAggregator` packages that contract.
  */
object TypedOps {

  /** Build a typed aggregator from laygo-style fold pieces.
    *
    * @param zeroB   initial accumulator (laygo `initial`)
    * @param reduceF fold one element into the accumulator
    * @param mergeF  combine two partial accumulators (the piece laygo
    *                never needed on one machine, and the reason its
    *                reduce can't distribute as written)
    */
  def foldAggregator[IN, BUF: Encoder, OUT: Encoder](
      zeroB: BUF,
      reduceF: (BUF, IN) => BUF,
      mergeF: (BUF, BUF) => BUF,
      finishF: BUF => OUT): TypedColumn[IN, OUT] =
    new Aggregator[IN, BUF, OUT] {
      override def zero: BUF = zeroB
      override def reduce(b: BUF, a: IN): BUF = reduceF(b, a)
      override def merge(b1: BUF, b2: BUF): BUF = mergeF(b1, b2)
      override def finish(b: BUF): OUT = finishF(b)
      override def bufferEncoder: Encoder[BUF] = implicitly[Encoder[BUF]]
      override def outputEncoder: Encoder[OUT] = implicitly[Encoder[OUT]]
    }.toColumn

  /** Typed whole-dataset reduce: laygo `reduce(f, initial)` with the
    * distributive merge made explicit.
    */
  def reduceDataset[T, B: Encoder](
      ds: Dataset[T],
      zero: B,
      reduce: (B, T) => B,
      merge: (B, B) => B): B =
    ds.select(foldAggregator[T, B, B](zero, reduce, merge, identity)).head()
}
