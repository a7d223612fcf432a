package graft

case class Emp(name: String, age: Int, salary: Double)

class TypedOpsSpec extends SparkSpec {
  import spark.implicits._

  private val emps = Seq(
    Emp("Alice", 25, 50000), Emp("Bob", 30, 60000),
    Emp("Charlie", 35, 70000), Emp("David", 28, 55000))

  test("typed dataset pipeline with compile-time fields (README ETL example)") {
    val ds = emps.toDS()
    val highEarners = ds.filter(_.age > 28).map(e => (e.name, e.salary / 12))
      .collect().toMap
    assert(highEarners.keySet == Set("Bob", "Charlie"))
  }

  test("reduceDataset: laygo terminal reduce with distributive merge") {
    val total = TypedOps.reduceDataset[Emp, Double](
      emps.toDS(),
      zero = 0.0,
      reduce = (acc, e) => acc + e.salary,
      merge = _ + _)
    assert(total == 235000.0)
  }

  test("foldAggregator runs as a grouped typed aggregation") {
    val ds = emps.toDS()
    val maxSalaryByDecade = ds.groupByKey(_.age / 10)
      .agg(TypedOps.foldAggregator[Emp, Double, Double](
        0.0, (m, e) => math.max(m, e.salary), math.max, identity))
      .collect().toMap
    assert(maxSalaryByDecade == Map(2 -> 55000.0, 3 -> 70000.0))
  }

  test("aggregator distributes: partial aggregation appears in the plan") {
    val ds = emps.toDS().repartition(4)
    val plan = ds.select(TypedOps.foldAggregator[Emp, Double, Double](
      0.0, (a, e) => a + e.salary, _ + _, identity))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial"), s"no partial agg:\n$plan")
  }

  // ---- TypedTransformer: the generic Transformer[In, Out] twin -----

  test("typed chain: map/filter/flatMap compose with full genericity") {
    val t: TypedTransformer[Emp, String] = TypedTransformer.identity[Emp]
      .filter(_.age >= 28)
      .map(e => (e.name, e.salary))
      .flatMap { case (n, s) => if (s > 55000) Seq(n, n.toUpperCase) else Seq(n) }
    val out = TypedPipeline(emps.toDS()).transform(t).toList().sorted
    assert(out == Seq("BOB", "Bob", "CHARLIE", "Charlie", "David"))
  }

  test("typed flatten via element evidence (laygo overload stubs)") {
    val t = TypedTransformer.identity[Emp]
      .map(e => e.name.split("a").toSeq)
      .flatten[String]
    val out = TypedPipeline(emps.toDS()).transform(t).toList()
    assert(out.contains("Ch") && out.contains("rlie"))
  }

  test("typed reduce is a 1-row dataset through the fold aggregator") {
    val t = TypedTransformer.identity[Emp]
      .reduce[Double](0.0, (acc, e) => acc + e.salary, _ + _)
    val out = TypedPipeline(emps.toDS()).transform(t).toList()
    assert(out == Seq(235000.0))
  }

  test("typed reduceByKey groups with partial-agg-capable reduceGroups") {
    val t = TypedTransformer.identity[Emp]
      .reduceByKey(_.age / 10)((a, b) => if (a.salary >= b.salary) a else b)
    val out = TypedPipeline(emps.toDS()).transform(t).toList().toMap
    assert(out(2).name == "David" && out(3).name == "Charlie")
  }

  test("typed reducePerChunk folds each partition (chunk = partition)") {
    val t = TypedTransformer.identity[Emp]
      .setChunker(2)
      .reducePerChunk(0L)((n, _) => n + 1)
    val out = TypedPipeline(emps.toDS()).transform(t).toList()
    assert(out.size == 2 && out.sum == 4L)
  }

  test("typed catchMap quarantines per element, task survives") {
    val t = TypedTransformer.identity[Emp]
      .catchMap[Double](
        e => if (e.name == "Bob") throw new ArithmeticException("boom")
             else e.salary,
        handler = (_, _) => Some(-1.0))
    val out = TypedPipeline(emps.toDS()).transform(t).toList().sorted
    assert(out == Seq(-1.0, 50000.0, 55000.0, 70000.0))
  }

  test("typed catchMap default handler drops failed elements") {
    val t = TypedTransformer.identity[Emp]
      .catchMap[Double](e =>
        if (e.age < 28) throw new IllegalStateException("x") else e.salary)
    val out = TypedPipeline(emps.toDS()).transform(t).toList()
    assert(out.toSet == Set(60000.0, 70000.0, 55000.0))
  }

  test("typed tapCount counts through the context accumulator") {
    val ctx = PipelineContext(spark)
    val t = TypedTransformer.identity[Emp].filter(_.age > 26).tapCount("seen")
    val out = TypedPipeline(emps.toDS(), ctx).transform(t).toList()
    assert(out.size == 3 && ctx.counter("seen").value == 3L)
  }

  test("typed mapCtx reads broadcast config at plan time") {
    val ctx = PipelineContext(spark, Map("bonus" -> "1000"))
    val t = TypedTransformer.identity[Emp]
      .mapCtx[Double](c => { val b = c.getOrElse("bonus", "0").toDouble; e => e.salary + b })
    val out = TypedPipeline(emps.toDS(), ctx).transform(t).toList()
    assert(out.contains(51000.0))
  }

  test("typed loop converges with lineage cuts") {
    val body = TypedTransformer.identity[Long].map(_ * 2)
    val t = TypedTransformer.identity[Long]
      .loop(body, ds => ds.head() < 100, maxIterations = 20, checkpointInterval = 2)
    val out = TypedPipeline(Seq(1L).toDS()).transform(t).toList()
    assert(out == Seq(128L))
  }

  test("typed shortCircuit halts the pipeline on a driver predicate") {
    val t = TypedTransformer.identity[Emp]
      .shortCircuit((_, ctx) => ctx.getOrElse("halt", "no") == "yes")
    val ctx = PipelineContext(spark, Map("halt" -> "yes"))
    intercept[IllegalStateException] {
      TypedPipeline(emps.toDS(), ctx).transform(t).toList()
    }
  }

  test("typed andThen composes transformers of different element types") {
    val a: TypedTransformer[Emp, (String, Double)] =
      TypedTransformer.identity[Emp].map(e => (e.name, e.salary))
    val b: TypedTransformer[(String, Double), String] =
      TypedTransformer.identity[(String, Double)].filter(_._2 > 55000).map(_._1)
    val out = TypedPipeline(emps.toDS()).transform(a.andThen(b)).toList().sorted
    assert(out == Seq("Bob", "Charlie"))
  }

  test("typed pipeline sinks: first / iterator / each / consume") {
    val ctx = PipelineContext(spark)
    val p = TypedPipeline(emps.toDS().orderBy($"age"), ctx)
    assert(p.first(2).map(_.name) == Seq("Alice", "David"))
    assert(p.iterator.size == 4)
    val t = TypedTransformer.identity[Emp].tapCount("eached")
    p.transform(t).consume()
    assert(ctx.counter("eached").value == 4L)
  }

  test("typed toRows drops to the relational surface mid-chain") {
    val t = TypedTransformer.identity[Emp]
      .map(e => (e.name, e.salary))
      .toRows(ds => ds.toDF("name", "salary").where($"salary" > 55000).as[(String, Double)])
    val out = TypedPipeline(emps.toDS()).transform(t).toList().map(_._1).sorted
    assert(out == Seq("Bob", "Charlie"))
  }
}
