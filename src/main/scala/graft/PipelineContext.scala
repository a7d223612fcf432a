package graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.util.LongAccumulator

import scala.collection.concurrent.TrieMap

/** Shared pipeline context — the Spark-native analogue of laygo's
  * `SimpleContextManager` / `ParallelContextManager`
  * (reference: laygo/context/simple.py:34, laygo/context/parallel.py:21).
  *
  * Laygo shares a mutable dict between workers via a multiprocessing
  * Manager proxy. That pattern cannot scale to a 1000-executor cluster
  * (every read/write is an RPC to one process), so the Spark design
  * splits the contract into the two primitives that DO scale:
  *
  *   - read-mostly configuration → a broadcast map, shipped once per
  *     executor, free to read in any expression or closure;
  *   - worker writes → named `LongAccumulator`s, merged commutatively
  *     on the driver (the only write pattern that is deterministic
  *     under task retries).
  *
  * `toMap` mirrors laygo's "final context dict" returned by pipeline
  * sinks (pipeline.py:280-365): config entries plus accumulated values.
  */
final class PipelineContext private (
    spark: SparkSession,
    conf: Map[String, String]) extends Serializable {

  @transient private lazy val bc: Broadcast[Map[String, String]] =
    spark.sparkContext.broadcast(conf)

  @transient private val counters = TrieMap.empty[String, LongAccumulator]

  /** Read a config value (driver side). */
  def get(key: String): Option[String] = conf.get(key)

  def getOrElse(key: String, default: String): String =
    conf.getOrElse(key, default)

  /** Config value as a literal Column — usable inside codegen'd
    * expressions, which is how context-aware `map`/`filter` lambdas
    * (transformer.py:229-260) translate without closures.
    */
  def litConf(key: String): Column = lit(conf(key))

  def litConfDouble(key: String): Column = lit(conf(key).toDouble)

  def litConfLong(key: String): Column = lit(conf(key).toLong)

  /** Broadcast handle for use inside closures (mapPartitions etc.). */
  def broadcastConf: Broadcast[Map[String, String]] = bc

  /** Named counter accumulator (created on first use). Worker-side
    * `add`, driver-side `value` — laygo's ctx["n"] += 1 analogue.
    */
  def counter(name: String): LongAccumulator =
    counters.getOrElseUpdate(name, {
      val acc = new LongAccumulator
      spark.sparkContext.register(acc, name)
      acc
    })

  /** Final context snapshot, as laygo sinks return it. */
  def toMap: Map[String, Any] =
    conf ++ counters.map { case (k, v) => k -> v.value.longValue() }

  /** Derive a new context with additional/overridden config. */
  def updated(kv: (String, String)*): PipelineContext =
    new PipelineContext(spark, conf ++ kv)
}

object PipelineContext {
  def apply(spark: SparkSession, conf: Map[String, String] = Map.empty): PipelineContext =
    new PipelineContext(spark, conf)
}
