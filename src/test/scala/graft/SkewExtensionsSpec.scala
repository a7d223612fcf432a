package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions
import graft.operators.Skew

class SkewExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join results (correctness under salting)") {
    val fact = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e")).toDF("k", "payload")
    val dim  = Seq((1, "one"), (2, "two"), (3, "three")).toDF("k", "name")
    val plain  = fact.join(dim, "k").select("k", "payload", "name").collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", saltFactor = 4)
      .select("k", "payload", "name").collect().toSet
    assert(salted == plain)
    assert(salted.size == 5)
  }

  test("saltedJoin spreads a hot key across salt buckets") {
    val fact = (1 to 1000).map(i => (1, i)).toDF("k", "v") // all rows same key
    val dim  = Seq((1, "hot")).toDF("k", "name")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(col("k"), col("v"))), lit(8)).cast("int"))
    val buckets = salted.groupBy("__salt").count().collect()
    assert(buckets.length == 8, "hot key not spread across salts")
    assert(buckets.map(_.getLong(1)).max < 1000, "one bucket still holds everything")
    assert(Skew.saltedJoin(fact, dim, "k", 8).count() == 1000L)
  }

  test("twoPhaseSum matches single-phase aggregation") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 4.0), ("a", 3.0)).toDF("k", "v")
    val twoPhase = Skew.twoPhaseSum(df, col("k"), col("v"), 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(twoPhase == Map("a" -> 6.0, "b" -> 4.0))
  }

  test("SQL users can call native expressions after extension registration") {
    GraftExtensions.register(spark)
    val d = spark.sql("SELECT dotp(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d == 11.0)
    val sig = spark.sql(
      "SELECT minhash_sig(transform(array('a','b','c'), s -> hash(s)), 16) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig.length == 16)
    // deterministic across invocations
    val sig2 = spark.sql(
      "SELECT minhash_sig(transform(array('a','b','c'), s -> hash(s)), 16) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig == sig2)
    // full native-kernel surface: shingle sets, intersection, simhash,
    // hyperplane buckets all callable from SQL
    val row = spark.sql(
      """SELECT sorted_intersect_size(shingle_set(array('a','b','c','d'), 3),
         shingle_set(array('a','b','c','x'), 3)) AS inter,
         simhash64(array('w1','w2')) AS sh,
         hyperplane_bucket(array(1.0d, -2.0d, 0.5d), 4) AS hb""").collect().head
    assert(row.getInt(0) == 1)  // shared shingle: "a b c"
    assert(row.getLong(1) != 0L)
    assert(row.getLong(2) >= 0L && row.getLong(2) < 16L)
  }

  test("approx_count_distinct stays within 5% of exact (scale-path aggregate)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val exact = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"))).collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("saltedJoin supports outer semantics: unmatched fact rows survive a left join") {
    val fact = Seq((1, "a"), (2, "b"), (9, "orphan")).toDF("k", "payload")
    val dim  = Seq((1, "one"), (2, "two")).toDF("k", "name")
    val out = Skew.saltedJoin(fact, dim, "k", 4, joinType = "left")
      .select("k", "payload", "name").collect()
      .map(r => (r.getInt(0), r.getString(1), if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(out == Set((1, "a", "one"), (2, "b", "two"), (9, "orphan", null)))
  }

  test("hotKeyReport: exact counts, shares, skew ratios, deterministic top-k") {
    // 4 keys, 10 rows: key 1 holds 7 -> mean = 10/4 = 2.5 rows/key
    val df = (Seq.fill(7)(1L) ++ Seq(2L, 3L, 4L)).toDF("k")
    val rows = Skew.hotKeyReport(df, "k", 3).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L),
      "top-3 must be count-desc then key-asc (2 and 3 tie at 1 row)")
    val hot = rows.head
    assert(hot.getLong(1) == 7L)
    assert(hot.getLong(2) == 700L, "7/10 = 700 permille")
    // 7 / 2.5 = 2.8x the mean = 2_800_000 micro-units, exactly
    assert(hot.getLong(3) == 2800000L)
    val cold = rows(1)
    assert(cold.getLong(1) == 1L && cold.getLong(2) == 100L
      && cold.getLong(3) == 400000L, "1/2.5 = 0.4x mean")
  }
}
