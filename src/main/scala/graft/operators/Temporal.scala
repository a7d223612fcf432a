package graft.operators

import graft.operators.Caching.TrackedDf
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / ordered-join operators: as-of join, interval (range)
  * join, and trailing time-range features — the event-stream joins a
  * log-processing pipeline needs that plain equi-joins can't express.
  *
  * Scale design:
  *   - the as-of join is ONE shuffle (union both sides, hash by key) +
  *     one ordered window walk per key — never a per-row range probe
  *     or a time-expanded join. State per key is a single "last seen
  *     right row" struct, the same shape a streaming join would keep;
  *   - the range join never materializes fact × intervals: intervals
  *     are exploded into fixed-width bins (a few rows each) and the
  *     join is an equi-join on the bin id, with the exact range
  *     predicate applied AFTER candidate generation. Shuffle volume is
  *     O(fact + intervals·binsPerInterval), independent of how many
  *     fact rows an interval covers.
  */
object Temporal {

  /** Event time as epoch MICROSECONDS, robust to the physical encoding
    * of the timestamp column: parquet timestamp[ns] read as a raw long
    * under `spark.sql.legacy.parquet.nanosAsLong`, or a native
    * timestamp[us]/timestamp_ntz column. Both readings of the same
    * instant yield the same Long (ns div 1000 == unix_micros), so
    * queries built on this are encoding-independent — and match a
    * DuckDB oracle's `epoch_us(ts::TIMESTAMP)` bit-exactly. Sessions
    * pin `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast is a
    * no-op on the underlying micros.
    */
  def epochUs(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      // FLOOR division, not `div` (which truncates toward zero): for
      // pre-1970 instants the raw-ns path must round down like the
      // timestamp[us] path does, or the two encodings diverge.
      // (x - pmod(x, d)) is the largest multiple of d ≤ x, so the
      // quotient is exact floor division in pure integer arithmetic.
      case org.apache.spark.sql.types.LongType =>
        expr(s"($tsCol - pmod($tsCol, 1000)) div 1000")
      case _ => expr(s"unix_micros(cast($tsCol AS TIMESTAMP))")
    }

  /** Epoch DAY bucket (floor of epochUs / 86 400 000 000) under the
    * same encoding independence as [[epochUs]].
    */
  def epochDay(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr(s"($tsCol - pmod($tsCol, 86400000000000)) div 86400000000000")
      case _ =>
        expr("(unix_micros(cast(" + tsCol + " AS TIMESTAMP)) - " +
          s"pmod(unix_micros(cast($tsCol AS TIMESTAMP)), 86400000000)) div 86400000000")
    }

  /** As-of join: for each left row, the most recent right row with
    * `right.tsCol <= left.tsCol` and equal key (a LEFT OUTER as-of:
    * unmatched left rows survive with nulls). Ties on the right
    * timestamp are broken deterministically by `rightTieCol` (largest
    * wins), so the result is reproducible on any engine.
    *
    * Mechanism: tag and union both sides, then one running
    * `last(right_payload, ignoreNulls)` window ordered by
    * (ts, side, tie) per key — right rows sort before left rows at
    * equal timestamps, which is exactly the `<=` as-of semantics.
    * Cost: one hash shuffle of |L|+|R| rows + a per-key sort; no
    * nested-loop probe, no time-bucket explosion, O(1) state per key
    * during the walk.
    *
    * Requirements: both ts columns share an orderable type; column
    * names are disjoint apart from `keyCol` (pre-alias the right side).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTieCol: String): DataFrame = {
    val rightPayload = right.columns.filterNot(_ == keyCol)
    require(left.columns.intersect(rightPayload).isEmpty,
      s"left/right column collision: ${left.columns.intersect(rightPayload).mkString(", ")}")
    val l = left.select(
      col(keyCol).as("__k"), col(leftTsCol).as("__t"),
      lit(1).as("__side"), lit(0L).as("__tie"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__left"))
    val r = right.select(
      col(keyCol).as("__k"), col(rightTsCol).as("__t"),
      lit(0).as("__side"), col(rightTieCol).cast("long").as("__tie"),
      struct(rightPayload.toIndexedSeq.map(col): _*).as("__right"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__right"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__left.*") +: rightPayload.toIndexedSeq.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Forward as-of join: each left row matched to the EARLIEST right
    * row at or after its timestamp (ties to the smallest `rightTieCol`)
    * — the "next event after" direction [[asofJoin]]'s backward walk
    * doesn't cover. Same single hash shuffle + ordered window walk,
    * with the frame flipped to [current, following] and `first` in
    * place of `last`; at equal timestamps the probe sorts before the
    * reference so a same-instant reference still matches.
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTieCol: String): DataFrame = {
    val rightPayload = right.columns.filterNot(_ == keyCol)
    require(left.columns.intersect(rightPayload).isEmpty,
      s"left/right column collision: ${left.columns.intersect(rightPayload).mkString(", ")}")
    val l = left.select(
      col(keyCol).as("__k"), col(leftTsCol).as("__t"),
      lit(1).as("__side"), lit(0L).as("__tie"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__left"))
    val r = right.select(
      col(keyCol).as("__k"), col(rightTsCol).as("__t"),
      lit(0).as("__side"), col(rightTieCol).cast("long").as("__tie"),
      struct(rightPayload.toIndexedSeq.map(col): _*).as("__right"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side").desc, col("__tie"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", first(col("__right"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__left.*") +: rightPayload.toIndexedSeq.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Interval (range) join: fact rows matched to every interval
    * `[loCol, hiCol)` that contains `valCol`. Intervals may overlap —
    * this is a genuine interval join, not a bucketing.
    *
    * Scale path: each interval is exploded into the fixed-width bins
    * it covers (`binWidth` chosen so intervals span a handful of
    * bins), the fact side computes its single bin in the scan stage,
    * and candidates come from an equi-join on the bin id — a hash
    * join, never a nested-loop theta join. The exact range predicate
    * then filters candidates. Works when the interval table is far
    * too large to broadcast; shuffle keys are 8-byte bin ids.
    */
  def rangeJoinBinned(
      fact: DataFrame,
      valCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    fact.withColumn("__bin", floor(col(valCol) / binWidth).cast("long"))
      .join(iv, Seq("__bin"))
      .where(col(valCol) >= col(loCol) && col(valCol) < col(hiCol))
      .drop("__bin")
  }

  /** Trailing time-range window features: per row, aggregates over all
    * rows of the same key whose ordering value lies within
    * `[current − rangeBack, current]` (a RANGE frame, peer-inclusive —
    * identical semantics on any SQL engine). One shuffle on the key;
    * Spark evaluates the frame with a sliding two-pointer walk, not a
    * per-row rescan.
    */
  def trailingRange(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      rangeBack: Long,
      aggs: (String, Column)*): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rangeBetween(-rangeBack, 0)
    aggs.foldLeft(df) { case (acc, (name, a)) => acc.withColumn(name, a.over(w)) }
  }

  /** Daily-volume anomaly detection: days whose event count sits more
    * than `zThreshold` population standard deviations from that event
    * type's daily mean — the monitoring query that catches a broken
    * collector (volume cliff) or a bot burst (volume spike) before
    * the data poisons downstream aggregates.
    *
    * Scale shape: the log collapses to (type, day) counts in one
    * keyed shuffle; per-type moments are a tiny second agg over the
    * daily table carrying EXACT integer Σc and Σc² (order-independent
    * — float accumulation would make the flagged set
    * parallelism-dependent at the |z| boundary), broadcast back onto
    * the daily rows for a row-local z-test. Mean/variance/z derive
    * from the exact integers via identical IEEE expressions on any
    * engine; z is emitted under the half-up floor protocol.
    */
  /** (event_type, day, n_events) daily counts — day = [[epochDay]],
    * the shared time bucketing of [[dailyAnomaly]] and its streaming
    * mirror. One keyed shuffle, log never re-scanned downstream.
    */
  def dailyCounts(events: DataFrame, tsCol: String, typeCol: String): DataFrame =
    events
      .select(col(typeCol).as("event_type"),
        epochDay(events, tsCol).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"))

  /** Per-type daily-volume moments as EXACT integers (n_days, Σc, Σc²)
    * — the broadcastable stats table both the batch gate and the
    * streaming scorer derive mean/variance from. Integer sums are
    * order-independent, so the |z| boundary can't flip with
    * parallelism.
    */
  def dailyStats(daily: DataFrame): DataFrame =
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("n_events")).as("s1"),
        sum(col("n_events") * col("n_events")).as("s2"))

  /** Row-local z-test over (…, n_events, n_days, s1, s2) rows: derive
    * mean/variance from the exact integer moments via fixed IEEE
    * expressions, keep |z| ≥ threshold, emit z under the half-up floor
    * protocol. Shared verbatim by batch and streaming so they cannot
    * diverge.
    */
  private[graft] def zFlag(joined: DataFrame, zThreshold: Double): DataFrame =
    joined
      .withColumn("mean", col("s1").cast("double") / col("n_days"))
      .withColumn("variance",
        (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n_days"))
          / col("n_days"))
      .where(col("variance") > 0)
      .withColumn("z",
        (col("n_events").cast("double") - col("mean")) / sqrt(col("variance")))
      .where(abs(col("z")) >= zThreshold)

  def dailyAnomaly(
      events: DataFrame,
      tsCol: String,
      typeCol: String,
      zThreshold: Double): DataFrame = {
    val daily = dailyCounts(events, tsCol, typeCol)
      .persistTracked
    zFlag(daily.join(broadcast(dailyStats(daily)), "event_type"), zThreshold)
      .select(col("event_type"), col("day"), col("n_events"),
        (floor(col("z") * 10000 + lit(0.5)) / 10000).as("z"))
  }

  /** Ordered conversion funnel: per user, step k counts only if its
    * first qualifying event is at or after the first qualifying time
    * of step k−1 (the standard "view → click → purchase" definition).
    * Returns one row per step: (step_idx, step, n_users).
    *
    * Scale shape: every join/aggregate is keyed on `userCol`, so after
    * the first shuffle each chained step reuses the same hash
    * partitioning — k steps cost one shuffle of each step's FILTERED
    * events (pushed-down type predicate), never a per-user subquery or
    * a self-join of the full log. Per-user state is one timestamp per
    * step. The final unpivot is driver-free (explode of a k-element
    * literal array).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    val perUser = steps.zipWithIndex.tail.foldLeft(first) { case (acc, (st, i)) =>
      val prev = col(s"t${i - 1}")
      val stepEvents = events.where(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as("__ts"))
      val carried = (0 until i).map(j => min(col(s"t$j")).as(s"t$j"))
      val next = min(when(col("__ts") >= prev, col("__ts"))).as(s"t$i")
      acc.join(stepEvents, Seq(userCol), "left")
        .groupBy(col(userCol))
        .agg(carried.head, (carried.tail :+ next): _*)
    }
    val countCols = steps.indices.map(i => count(col(s"t$i")).as(s"c$i"))
    perUser.agg(countCols.head, countCols.tail: _*)
      .select(explode(array(steps.zipWithIndex.map { case (st, i) =>
        struct(lit(i.toLong).as("step_idx"), lit(st).as("step"),
          col(s"c$i").as("n_users"))
      }: _*)).as("s"))
      .select(col("s.step_idx"), col("s.step"), col("s.n_users"))
  }
}
