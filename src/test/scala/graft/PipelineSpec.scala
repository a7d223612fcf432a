package graft

import org.apache.spark.sql.functions._

/** Pipeline source/sink/branch semantics mirroring
  * /root/reference/tests/test_pipeline.py.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("multi-source pipeline chains sources (test_pipeline: init multiple)") {
    val out = Pipeline(Seq(1, 2).toDF("x"), Seq(3).toDF("x"), Seq(4, 5).toDF("x"))
      .toList()._1.map(_.getInt(0))
    assert(out.sorted == Seq(1, 2, 3, 4, 5))
  }

  test("toList returns rows and final context (test_pipeline: to_list)") {
    val (rows, ctx) = Pipeline(Seq(1, 2, 3).toDF("x"))
      .withContext("job" -> "t1").toList()
    assert(rows.size == 3 && ctx("job") == "t1")
  }

  test("first(n) limits without full materialization (test_pipeline: first)") {
    val (rows, _) = Pipeline((1 to 1000).toDF("x")).first(5)
    assert(rows.size == 5)
    intercept[IllegalArgumentException] { Pipeline(Seq(1).toDF("x")).first(0) }
  }

  test("first(n) pushes limit into the plan (no full-scan collect)") {
    // parquet-backed source: LocalRelation would be constant-folded
    val df = Pipeline(spark.read.parquet(s"$sfDir/orders.parquet")).toDF.limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("CollectLimit") || plan.contains("GlobalLimit"),
      s"limit not in plan: $plan")
  }

  test("each applies side effect per element distributed (test_pipeline: each)") {
    val acc = spark.sparkContext.longAccumulator("each_sum")
    Pipeline((1 to 10).toDF("x")).each(r => acc.add(r.getInt(0)))
    assert(acc.value == 55L)
  }

  test("consume materializes fully without collecting (test_pipeline: consume)") {
    val acc = spark.sparkContext.longAccumulator("consumed")
    val p = Pipeline((1 to 50).toDF("x")).transform(_.tapCount("n"))
    val (_, ctx) = p.consume()
    assert(ctx("n") == 50L)
  }

  test("iterator streams rows to driver (test_pipeline: __iter__)") {
    val it = Pipeline((1 to 100).toDF("x")).iterator
    assert(it.take(3).size == 3)
  }

  test("branch fan-out: every row reaches every branch (test_pipeline: branch)") {
    val evens = Transformer.identity.filter(col("x") % 2 === 0)
    val odds  = Transformer.identity.filter(col("x") % 2 === 1)
    val (outs, _) = Pipeline((1 to 10).toDF("x"))
      .branch(Seq("evens" -> evens, "odds" -> odds))
    assert(outs("evens").count() == 5 && outs("odds").count() == 5)
  }

  test("branch router: first match wins, disjoint (test_pipeline: first_match=True)") {
    val id = Transformer.identity
    val (outs, _) = Pipeline((1 to 12).toDF("x")).branchRouter(Seq(
      ("div3", col("x") % 3 === 0, id),
      ("even", col("x") % 2 === 0, id),
      ("rest", lit(true), id)))
    val div3 = outs("div3").collect().map(_.getInt(0)).sorted
    val even = outs("even").collect().map(_.getInt(0)).sorted
    val rest = outs("rest").collect().map(_.getInt(0)).sorted
    assert(div3.toSeq == Seq(3, 6, 9, 12))       // 6,12 routed here, NOT to even
    assert(even.toSeq == Seq(2, 4, 8, 10))
    assert(rest.toSeq == Seq(1, 5, 7, 11))
    // disjoint + complete
    assert((div3 ++ even ++ rest).sorted.toSeq == (1 to 12))
  }

  test("branch broadcast: all matching branches get the row (first_match=False)") {
    val id = Transformer.identity
    val (outs, _) = Pipeline((1 to 12).toDF("x")).branchBroadcast(Seq(
      ("div3", col("x") % 3 === 0, id),
      ("even", col("x") % 2 === 0, id)))
    assert(outs("div3").collect().map(_.getInt(0)).sorted.toSeq == Seq(3, 6, 9, 12))
    assert(outs("even").collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 4, 6, 8, 10, 12))
  }

  test("context: config readable in expressions, accumulators in results (test_pipeline: context)") {
    val (rows, ctx) = Pipeline(Seq(1, 2, 3, 4, 5).toDF("x"))
      .withContext("multiplier" -> "3", "threshold" -> "10")
      .transform(_.mapCtx(c => Seq((col("x") * c.litConfLong("multiplier")).as("x")))
        .filterCtx(c => col("x") > c.litConfLong("threshold")))
      .toList()
    assert(rows.map(_.getLong(0)).sorted == Seq(12L, 15L))
    assert(ctx("multiplier") == "3")
  }

  test("buffer persists and rebalances (test_pipeline: buffer)") {
    val p = Pipeline((1 to 100).toDF("x")).buffer(6)
    assert(p.toDF.rdd.getNumPartitions == 6)
    assert(p.toList()._1.size == 100)
    p.toDF.unpersist()
  }

  test("buffer(size, batchRows) bounds rows per chunk (pipeline.py:221 second knob)") {
    // 100 rows at 25/batch -> 4 partitions; queue-depth cap wins below
    val p = Pipeline((1 to 100).toDF("x")).buffer(0, 25L)
    assert(p.toDF.rdd.getNumPartitions == 4, "ceil(rows/batchRows) partitions")
    assert(p.toList()._1.size == 100)
    val capped = Pipeline((1 to 100).toDF("x")).buffer(2, 25L)
    assert(capped.toDF.rdd.getNumPartitions == 2, "numPartitions caps the chunk count")
    // batch larger than the data: one chunk, never zero
    assert(Pipeline((1 to 3).toDF("x")).buffer(0, 1000L)
      .toDF.rdd.getNumPartitions == 1)
  }

  test("apply with raw function (test_pipeline: apply callable)") {
    val out = Pipeline((1 to 4).toDF("x"))
      .apply((df: org.apache.spark.sql.DataFrame) => df.where(col("x") > 2))
      .toList()._1.map(_.getInt(0))
    assert(out.sorted == Seq(3, 4))
  }
}
