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
}
