package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins and aggregations.
  *
  * At 100 TB a handful of hot keys (null-ish defaults, celebrity
  * entities, empty documents) can put one shuffle partition hours
  * behind the rest. AQE's skew-join split handles sort-merge joins at
  * runtime; these helpers cover the cases AQE doesn't: explicit salted
  * repartition of a skewed fact↔dim join and two-phase aggregation.
  */
object Skew {

  /** Salted equi-join of a skewed fact table against a dimension.
    * The fact side gets a deterministic salt in [0, saltFactor); the
    * dim side is replicated saltFactor times (explode) so every salted
    * key finds its match. Use when the dim is too large to broadcast
    * but the fact key distribution is heavy-tailed.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    // deterministic salt from a row-unique hash, not rand(): keeps
    // results reproducible under task retries
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt), then final aggregate on key. Only algebraic
    * aggregates (sum/count/min/max) decompose this way.
    */
  def twoPhaseSum(
      df: DataFrame,
      key: Column,
      valueCol: Column,
      saltFactor: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id(), lit(saltFactor)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(valueCol).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("total"))
}
