package graft

import java.nio.file.Files

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.sinks.Sinks

class BucketObserveSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero exchanges (co-located join)") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Sinks.parquetBucketed(a, "bucket_a", "k", 4)
    Sinks.parquetBucketed(b, "bucket_b", "k", 4)
    // force the shuffle-family join path (tiny test tables would
    // otherwise auto-broadcast and bypass bucketing entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucket_a").join(spark.table("bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected shuffle-family join over buckets:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("tapInto delivers observed metrics after the action (laygo tap→context)") {
    val obs = new Observation("tap")
    val (rows, _) = Pipeline(Seq(1, 2, 3, 4, 5).toDF("x"))
      .transform(_.tapInto(obs, count(lit(1)).as("n"), sum(col("x")).as("s"))
        .filter(col("x") > 3))
      .toList()
    assert(rows.size == 2)
    val m = obs.get
    // metrics observed BEFORE the filter: full stream
    assert(m("n") == 5L && m("s") == 15L)
  }
}
