package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** Regression pin for the round-7 incident: the driver regenerated
  * `events.parquet` from timestamp[ns] (read as a raw ns long under
  * the pinned `nanosAsLong`) to timestamp[us] (read as timestamp_ntz),
  * and every query built on `ts div 1000` broke at analysis time.
  *
  * All event-time reads now go through `Temporal.epochUs`/`epochDay`,
  * which must yield IDENTICAL longs for either physical encoding of
  * the same instant. This spec writes the same synthetic event log
  * both ways and asserts every temporal query produces identical
  * results from each — so the next silent regeneration flips nothing.
  */
class EventTimeEncodingSpec extends SparkSpec {

  import spark.implicits._

  // one synthetic log, instants chosen to cross day boundaries and
  // include equal-timestamp as-of ties
  private val base: Seq[(Long, Long, Long, String, Double, String)] = {
    val day = 86400000000L // µs
    Seq(
      (1L, 10L * 1000000L, 1L, "view", 1.0, "{}"),
      (2L, 20L * 1000000L, 1L, "click", 2.5, "{}"),
      (3L, 20L * 1000000L, 1L, "purchase", 9.99, "{}"),
      (4L, day + 5L * 1000000L, 1L, "purchase", 3.75, "{}"),
      (5L, day + 5L * 1000000L, 2L, "click", 0.5, "{}"),
      (6L, 2 * day + 59L, 2L, "purchase", 7.25, "{}"),
      (7L, 2 * day + 60L, 2L, "view", 0.0, "{}"),
      (8L, 3 * day - 1L, 3L, "click", 4.0, "{}"),
      (9L, 3 * day, 3L, "purchase", 6.5, "{}")
    ).map { case (id, us, u, ty, v, p) => (id, us, u, ty, v, p) }
  }

  /** events dir with ts as a raw ns-since-epoch LONG column. */
  private lazy val nsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("ev_ns").toString
    base.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("us") * 1000L).drop("us")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  /** events dir with ts as a native timestamp[us] (NTZ) column. */
  private lazy val usDir: String = {
    val d = java.nio.file.Files.createTempDirectory("ev_us").toString
    base.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("cast(timestamp_micros(us) AS TIMESTAMP_NTZ)"))
      .drop("us")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("epochUs and epochDay agree bit-exactly across ts encodings") {
    val ns = spark.read.parquet(s"$nsDir/events.parquet")
    val us = spark.read.parquet(s"$usDir/events.parquet")
    assert(ns.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType, "ns variant must read as long")
    assert(us.schema("ts").dataType !=
      org.apache.spark.sql.types.LongType, "us variant must read as timestamp")
    val a = ns.select(col("event_id"), Temporal.epochUs(ns, "ts").as("tus"),
      Temporal.epochDay(ns, "ts").as("day"))
    val b = us.select(col("event_id"), Temporal.epochUs(us, "ts").as("tus"),
      Temporal.epochDay(us, "ts").as("day"))
    assert(rows(a) == rows(b))
    // spot-check absolute values: id 6 is 59 µs into day 2, id 9 exactly day 3
    val m = a.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(6L) == ((2 * 86400000000L + 59L, 2L)))
    assert(m(9L) == ((3 * 86400000000L, 3L)))
  }

  test("pre-1970 instants floor (not truncate) in both encodings") {
    // 59 µs BEFORE the day-(-1) boundary: floor puts it in day -2;
    // truncate-toward-zero (`div`) would claim day -1 — and diverge
    // from DuckDB's bucketing and the timestamp[us] path
    val us = -86400000000L - 59L
    val nsDf = Seq((1L, us * 1000L)).toDF("id", "ts")
    val usDf = Seq((1L, us)).toDF("id", "u")
      .withColumn("ts", expr("cast(timestamp_micros(u) AS TIMESTAMP_NTZ)")).drop("u")
    val a = nsDf.select(Temporal.epochUs(nsDf, "ts"), Temporal.epochDay(nsDf, "ts")).head
    val b = usDf.select(Temporal.epochUs(usDf, "ts"), Temporal.epochDay(usDf, "ts")).head
    assert(a.getLong(0) == us && b.getLong(0) == us)
    assert(a.getLong(1) == -2L && b.getLong(1) == -2L)
    // a raw ns value that is NOT a whole µs still floors
    val oddNs = Seq((1L, -1500L)).toDF("id", "ts")
    assert(oddNs.select(Temporal.epochUs(oddNs, "ts")).head.getLong(0) == -2L)
  }

  test("every temporal query is identical under both ts encodings") {
    val temporal = Seq("events_sessionize", "asof_join", "asof_join_forward",
      "window_time_range", "events_funnel", "events_retention",
      "event_daily_anomaly")
    temporal.foreach { name =>
      val fn = SparkEntry.queries(name)
      assert(rows(fn(spark, nsDir)) == rows(fn(spark, usDir)),
        s"$name diverges between ns-long and timestamp[us] events encodings")
    }
  }

  test("embeddings drift insurance: array<double> regeneration still analyzes") {
    // same drift class as the events-ts incident: vector kernels are
    // typed array<float>; the table reader must normalize a
    // double-element regeneration instead of failing at analysis time
    val d = java.nio.file.Files.createTempDirectory("emb_dbl").toString
    Seq((1L, Array(3.0, 4.0), 0), (2L, Array(0.0, 5.0), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = SparkEntry.queries("embed_normalize")(spark, d).collect()
    assert(out.length == 4) // 2 vectors x 2 dims
    val norms = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(norms(1L) - 5.0) < 1e-6)
  }

  test("dailyCounts handles both encodings and a pre-derived long column") {
    val ns = spark.read.parquet(s"$nsDir/events.parquet")
    val us = spark.read.parquet(s"$usDir/events.parquet")
    val a = Temporal.dailyCounts(ns, "ts", "event_type")
    val b = Temporal.dailyCounts(us, "ts", "event_type")
    assert(rows(a) == rows(b))
    // long column that is ALREADY ns-epoch (the spec-level contract used
    // by TemporalSpec/EdgeCaseSpec synthetic inputs)
    val pre = base.map { case (id, usv, u, ty, v, _) => (ty, usv * 1000L) }
      .toDF("event_type", "ts")
    assert(rows(Temporal.dailyCounts(pre, "ts", "event_type")) == rows(a))
  }
}
