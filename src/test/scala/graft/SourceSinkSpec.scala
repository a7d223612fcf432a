package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.Sinks
import graft.sources.Sources

class SourceSinkSpec extends SparkSpec {
  import spark.implicits._

  test("values source distributes a local collection") {
    val p = Sources.values(spark, Seq(1, 2, 3))
    assert(p.toList()._1.map(_.getInt(0)).sorted == Seq(1, 2, 3))
  }

  test("range source is lazy and distributed") {
    val p = Sources.range(spark, 1000)
    assert(p.toDF.rdd.getNumPartitions > 1)
    assert(p.transform(_.reduceGlobal(count(lit(1)).as("n")))
      .toList()._1.head.getLong(0) == 1000L)
  }

  test("parquet source round-trips through partitioned parquet sink") {
    val tmp = Files.createTempDirectory("graft_sink").toString
    val df = Seq(("a", 1), ("b", 2), ("a", 3)).toDF("k", "v")
    Sinks.parquetPartitioned(df, s"$tmp/out", Seq("k"))
    val back = Sources.parquet(spark, s"$tmp/out")
    assert(back.toList()._1.size == 3)
    // partition pruning: filter on partition col prunes files
    val pruned = back.transform(_.filter(col("k") === "a")).toDF
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(k"), s"no partition pruning:\n$scan")
  }

  test("foreachPartitionPush batches per partition with client lifecycle") {
    val opened = spark.sparkContext.longAccumulator("opened")
    val pushedRows = spark.sparkContext.longAccumulator("pushedRows")
    val batches = spark.sparkContext.longAccumulator("batches")
    val df = (1 to 100).toDF("x").repartition(4)
    Sinks.foreachPartitionPush[String](
      df,
      mkClient = () => { opened.add(1); "client" },
      push = (_, rows) => { batches.add(1); pushedRows.add(rows.size) },
      close = _ => (),
      batchSize = 10)
    assert(opened.value == 4L)        // one client per partition
    assert(pushedRows.value == 100L)  // every row pushed exactly once
    assert(batches.value >= 10L)      // batched, not row-at-a-time
  }

  test("writeTrainingShards: one dir per shard, rows in scrambled order, reproducible") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val tmp = Files.createTempDirectory("graft_shards").toString
    Sinks.writeTrainingShards(docs, "doc_id", s"$tmp/s", 4)
    val back = spark.read.parquet(s"$tmp/s")
    assert(back.count() == docs.count(), "every doc lands in exactly one shard")
    assert(back.select("shard").distinct().count() == 4)
    // physical row order within each shard file = the deterministic
    // scrambled order (read order of a parquet file is row order)
    val expected = graft.operators.Corpus.shuffleShards(docs, "doc_id", 4)
      .orderBy("shard", "pos").select("shard", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = (0 until 4).flatMap { sh =>
      spark.read.parquet(s"$tmp/s/shard=$sh")
        .select("doc_id").collect().map(r => (sh.toLong, r.getLong(0))).toSeq
    }
    assert(got == expected, "on-disk order must equal the deterministic shard order")
  }

  test("csv source reads with header and schema inference") {
    val tmp = Files.createTempDirectory("graft_csv").toString
    Seq(("x", 1), ("y", 2)).toDF("name", "n").write.option("header", "true").csv(s"$tmp/c")
    val p = Sources.csv(spark, s"$tmp/c")
    val rows = p.toList()._1.map(r => (r.getString(0), r.getInt(1))).sortBy(_._1)
    assert(rows == Seq(("x", 1), ("y", 2)))
  }
}
