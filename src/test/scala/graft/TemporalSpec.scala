package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** Temporal operators checked against brute-force formulations that
  * are obviously correct (per-row scans over collected data), plus
  * plan pins for the scale properties the operators promise.
  */
class TemporalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val events = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.select(col("event_id"), col("user_id"), col("event_type"),
      graft.operators.Temporal.epochUs(raw, "ts").as("tus"), col("value"))
  }

  test("asofJoin matches a brute-force most-recent-prior scan") {
    val left = events.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tus"))
    val right = events.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("r_id"), col("tus").as("r_tus"))
    val got = Temporal.asofJoin(left, right, "user_id", "tus", "r_tus", "r_id")
      .select(col("event_id"), col("r_id")).as[(Long, Option[Long])]
      .collect().toMap

    val rights = right.as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(r => (r._3, r._2)) }
    val lefts = left.as[(Long, Long, Long)].collect()
    assert(lefts.nonEmpty && got.size == lefts.length)
    for ((eid, uid, ts) <- lefts) {
      // most recent right with r_tus <= ts; ties broken by largest r_id
      val expected = rights.getOrElse(uid, Array.empty[(Long, Long)])
        .filter(_._1 <= ts).sortBy(r => (r._1, r._2)).lastOption.map(_._2)
      assert(got(eid) == expected, s"event $eid: got ${got(eid)}, want $expected")
    }
  }

  test("asofJoin is left-outer: purchases with no prior click survive with nulls") {
    val left = Seq((1L, 10L, 100L)).toDF("event_id", "user_id", "tus")
    val right = Seq((10L, 5L, 200L)).toDF("user_id", "r_id", "r_tus") // only AFTER
    val out = Temporal.asofJoin(left, right, "user_id", "tus", "r_tus", "r_id")
      .select(col("event_id"), col("r_id")).as[(Long, Option[Long])].collect()
    assert(out.toSeq == Seq((1L, None)))
  }

  test("asofJoin right rows at the exact left timestamp match (<= semantics)") {
    val left = Seq((1L, 10L, 100L)).toDF("event_id", "user_id", "tus")
    val right = Seq((10L, 5L, 100L), (10L, 6L, 100L), (10L, 7L, 101L))
      .toDF("user_id", "r_id", "r_tus")
    val out = Temporal.asofJoin(left, right, "user_id", "tus", "r_tus", "r_id")
      .select(col("r_id")).as[Long].collect()
    assert(out.toSeq == Seq(6L), "equal-ts rows are eligible; largest tie id wins")
  }

  test("asofJoinForward matches a brute-force earliest-at-or-after scan") {
    val left = events.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tus"))
    val right = events.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("r_id"), col("tus").as("r_tus"))
    val got = Temporal.asofJoinForward(left, right, "user_id", "tus", "r_tus", "r_id")
      .select(col("event_id"), col("r_id")).as[(Long, Option[Long])]
      .collect().toMap
    val rights = right.as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(r => (r._3, r._2)) }
    val lefts = left.as[(Long, Long, Long)].collect()
    assert(lefts.nonEmpty && got.size == lefts.length)
    for ((eid, uid, ts) <- lefts) {
      // earliest right with r_tus >= ts; ties broken by smallest r_id
      val expected = rights.getOrElse(uid, Array.empty[(Long, Long)])
        .filter(_._1 >= ts).sortBy(r => (r._1, r._2)).headOption.map(_._2)
      assert(got(eid) == expected, s"event $eid: got ${got(eid)}, want $expected")
    }
  }

  test("asofJoinForward: equal-ts reference matches, smallest tie id wins") {
    val left = Seq((1L, 10L, 100L)).toDF("event_id", "user_id", "tus")
    val right = Seq((10L, 5L, 100L), (10L, 6L, 100L), (10L, 7L, 99L))
      .toDF("user_id", "r_id", "r_tus")
    val out = Temporal.asofJoinForward(left, right, "user_id", "tus", "r_tus", "r_id")
      .select(col("r_id")).as[Long].collect()
    assert(out.toSeq == Seq(5L), "equal-ts rows eligible forward; smallest tie id wins")
  }

  test("rangeJoinBinned equals the naive theta join on overlapping bands") {
    val bands = Seq(("low", 0.0, 50.0), ("mid", 40.0, 200.0), ("high", 150.0, 500.0))
      .toDF("band", "lo", "hi")
    val fact = events.select(col("event_id"), col("value"))
    val got = Temporal.rangeJoinBinned(fact, "value", bands, "lo", "hi", 25.0)
      .select(col("event_id"), col("band")).as[(Long, String)].collect().toSet
    val naive = fact.join(bands, col("value") >= col("lo") && col("value") < col("hi"))
      .select(col("event_id"), col("band")).as[(Long, String)].collect().toSet
    assert(got == naive && got.nonEmpty)
    // a value in the overlap [40,50) must hit both bands
    val overlap = got.groupBy(_._1).values.map(_.size).max
    assert(overlap >= 2, "overlapping bands should multi-match some rows")
  }

  test("rangeJoinBinned plan is an equi-join on the bin id, never a nested loop") {
    val bands = (0 until 100).map(i => (s"b$i", i * 5.0, i * 5.0 + 8.0))
      .toDF("band", "lo", "hi")
    val p = Temporal.rangeJoinBinned(events, "value", bands, "lo", "hi", 25.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to a per-pair scan:\n$p")
  }

  test("trailingRange equals a brute-force trailing scan") {
    val e = events.select(col("event_id"), col("user_id"), col("tus"))
    val back = 3600000000L
    val got = Temporal.trailingRange(e, "user_id", "tus", back,
      "trailing_n" -> count(lit(1)))
      .select(col("event_id"), col("trailing_n")).as[(Long, Long)].collect().toMap
    val rows = e.as[(Long, Long, Long)].collect()
    val byUser = rows.groupBy(_._2)
    assert(rows.nonEmpty)
    for ((eid, uid, ts) <- rows.take(500)) {
      val expected = byUser(uid).count(r => r._3 >= ts - back && r._3 <= ts)
      assert(got(eid) == expected, s"event $eid: got ${got(eid)}, want $expected")
    }
  }

  test("asofJoin rejects colliding column names") {
    val left = Seq((1L, 10L, 100L)).toDF("event_id", "user_id", "tus")
    val right = Seq((10L, 5L, 100L)).toDF("user_id", "event_id", "r_tus")
    assertThrows[IllegalArgumentException] {
      Temporal.asofJoin(left, right, "user_id", "tus", "r_tus", "event_id")
    }
  }

  test("asofJoin with an empty right side keeps all left rows with null matches") {
    val left = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
      .select(col("k"), col("t"), col("t").as("lv"))
    val right = Seq.empty[(Long, Long, Long)].toDF("k", "rt", "rid")
    val out = Temporal.asofJoin(left, right, "k", "t", "rt", "rid")
    assert(out.count() == 2)
    assert(out.where(col("rid").isNull).count() == 2, "all matches must be null")
  }

  test("asofJoin tie-break: equal right timestamps resolve to the largest tie id") {
    val left = Seq((1L, 100L)).toDF("k", "t").select(col("k"), col("t"), col("t").as("lv"))
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 100L, 8L)).toDF("k", "rt", "rid")
    val got = Temporal.asofJoin(left, right, "k", "t", "rt", "rid")
      .select(col("rid")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(9L), s"expected largest-id winner, got $got")
  }

  test("rangeJoinBinned handles intervals spanning many bins and empty overlaps") {
    val fact = Seq((1L, 5.0), (2L, 999.0)).toDF("id", "v")
    val iv = Seq(("wide", 0.0, 500.0)).toDF("name", "lo", "hi")
    val out = Temporal.rangeJoinBinned(fact, "v", iv, "lo", "hi", 10.0)
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L), s"only the in-range fact row joins: $out")
  }

  test("dailyAnomaly flags only days beyond the z threshold, types with zero variance dropped") {
    val day = 86400000000000L // ns
    // type A: nine quiet days of 10 events, one day of 100 -> spike z≈3
    val quiet = (0 until 9).flatMap(d => (0 until 10).map(i =>
      (s"A", d * day + i)))
    val spike = (0 until 100).map(i => ("A", 9L * day + i))
    // type B: constant volume -> variance 0, never flagged
    val flat = (0 until 5).flatMap(d => (0 until 7).map(i => ("B", d * day + i)))
    val e = (quiet ++ spike ++ flat).toDF("event_type", "ts")
    val got = Temporal.dailyAnomaly(e, "ts", "event_type", 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", 9L, 100L)), s"only the spike day flags: $got")
  }

  test("funnel: step k only counts first occurrence at/after step k-1's first time") {
    val e = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full conversion
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 20L),  // click BEFORE view: no click step
      (3L, "view", 10L),                                            // view only
      (4L, "purchase", 1L), (4L, "view", 2L), (4L, "click", 3L)     // purchase before click: stops at click
    ).toDF("user_id", "event_type", "tus")
    val got = Temporal.funnel(e, "user_id", "event_type", "tus",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got == Map("view" -> 4L, "click" -> 2L, "purchase" -> 1L), s"got $got")
  }
}
