package graft

import org.apache.spark.sql.functions._

/** Bucketing evidence for the 100 TB fact⋈fact path: two tables
  * bucketed on the join key co-locate the join — the sort-merge join
  * reads bucket files directly and the plan carries NO exchange on
  * either side. This is the technique SURVEY §4 rule 2 prescribes when
  * neither side broadcasts; the spec pins that the engine actually
  * delivers it (a regression that re-adds the shuffle would repartition
  * the full fact table every run at cluster scale).
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables has no shuffle on the join key") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.read.parquet(s"$sfDir/orders.parquet")
        .write.format("parquet").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_bucketed")
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_bucketed")

      val joined = spark.table("orders_bucketed")
        .join(spark.table("lineitem_bucketed"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("l_extendedprice"))
      val p = joined.queryExecution.executedPlan.toString

      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")

      // and it computes the same rows as the unbucketed join
      val plain = spark.read.parquet(s"$sfDir/orders.parquet")
        .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("l_extendedprice"))
      assert(joined.count() == plain.count(), "bucketed join changed the row count")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }

  test("bucket pruning: an equality filter on the bucket key reads one bucket") {
    // the planner's auto-bucketed-scan heuristic turns bucketed reads
    // off for filter-only queries; force it so pruning is observable
    val auto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.format("parquet").bucketBy(8, "o_orderkey")
      .mode("overwrite").saveAsTable("orders_pruned")
    try {
      val q = spark.table("orders_pruned").where(col("o_orderkey") === 7L)
      val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected single-bucket scan:\n$scan")
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", auto)
      spark.sql("DROP TABLE IF EXISTS orders_pruned")
    }
  }
}
