package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Laygo execution strategies map onto Spark's scheduler (SURVEY §2
  * rows 14-17): sequential = 1 partition, threaded/process = task
  * parallelism over partitions, HTTP distribution = the cluster. These
  * tests pin the partition-level behavior that encodes that mapping,
  * plus the text-analysis kernels.
  */
class StrategySpec extends SparkSpec {
  import spark.implicits._

  test("sequential strategy = single partition execution") {
    val p = Pipeline((1 to 100).toDF("x")).transform(_.setChunker(1))
    assert(p.toDF.rdd.getNumPartitions == 1)
    assert(p.toList()._1.size == 100)
  }

  test("parallel strategies = N concurrent partitions, order restored by sort not arrival") {
    val p = Pipeline((1 to 1000).toDF("x")).transform(_.setChunker(8))
    assert(p.toDF.rdd.getNumPartitions == 8)
    val ordered = p.apply((df: org.apache.spark.sql.DataFrame) => df.orderBy("x"))
      .toList()._1.map(_.getInt(0))
    assert(ordered == (1 to 1000))
  }

  test("work distributes across partitions (no driver-side loop)") {
    val parts = Pipeline((1 to 64).toDF("x")).transform(_.setChunker(4))
      .toDF.withColumn("pid", spark_partition_id())
      .groupBy("pid").count().collect()
    assert(parts.length == 4)
    assert(parts.map(_.getLong(1)).sum == 64)
  }

  test("arrival-order sink streams chunks as tasks complete (ordered=False)") {
    // laygo create_threaded_transformer(ordered=False): results surface
    // per completed chunk with no global order restoration. Delivery
    // order is scheduler-dependent (unassertable); the contract pinned
    // here: every row arrives exactly once, grouped by chunk, with no
    // sort anywhere in the executed plan.
    val p = Pipeline((1 to 400).toDF("x")).transform(_.setChunker(8))
    assert(!p.toDF.queryExecution.executedPlan.toString.contains("Sort"),
      "arrival-order path must not sort")
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
    p.eachArrival(rows => seen.synchronized { seen += rows.map(_.getInt(0)); () })
    assert(seen.size == 8, s"expected 8 chunk deliveries, got ${seen.size}")
    assert(seen.flatten.sorted == (1 to 400), "rows lost or duplicated")
  }

  test("setChunkerByRows sizes partitions from the plan-time row estimate") {
    // 1200 local rows at 100 rows/chunk -> 12 partitions, ~100 rows
    // each (local relations carry exact row counts in plan stats)
    val p = Pipeline((1 to 1200).toDF("x")).transform(_.setChunkerByRows(100))
    val counts = p.toDF.groupBy(spark_partition_id().as("pid"))
      .count().collect().map(_.getLong(1))
    assert(counts.length == 12, s"expected 12 chunks, got ${counts.length}")
    assert(counts.forall(n => n >= 80 && n <= 120),
      s"chunk sizes far from 100: ${counts.mkString(",")}")
    assert(counts.sum == 1200)
  }

  // ---- text analysis kernels ---------------------------------------

  test("tokens drops empty strings from repeated spaces") {
    val out = Seq("a  b   c ").toDF("t")
      .select(TextAnalysis.tokens(col("t")).as("toks"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("a", "b", "c"))
  }

  test("shingles: n-grams of tokens, short docs collapse to whole-doc shingle") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextAnalysis.shingles(TextAnalysis.tokens(col("t")), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextAnalysis.shingles(TextAnalysis.tokens(col("t")), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("langId picks language with most marker hits") {
    val rows = Seq(
      "the cat is on the mat and happy",
      "el gato de la casa y que bien",
      "der hund und die katze das haus",
      "le chien et les chats est une"
    ).toDF("t").select(TextAnalysis.langId(TextAnalysis.tokens(col("t"))).as("l"))
      .collect().map(_.getString(0))
    assert(rows.toSeq == Seq("en", "es", "de", "fr"))
  }

  test("fingerprint is order-sensitive (rolling, not bag-of-words)") {
    val fps = Seq("a b c", "c b a").toDF("t")
      .select(TextAnalysis.fingerprint(TextAnalysis.tokens(col("t"))).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps(0) != fps(1))
  }

  test("quality score clamps to [0,1] and penalizes digit-heavy text") {
    val rows = Seq(
      "the meaningful document for all of those that read it carefully",
      "12345 67890 11111 22222 33333"
    ).toDF("t").select(
      TextAnalysis.qualityScore(col("t"), TextAnalysis.tokens(col("t"))).as("q"))
      .collect().map(_.getDouble(0))
    assert(rows.forall(q => q >= 0.0 && q <= 1.0))
    assert(rows(0) > rows(1))
  }

  test("piiScan counts and flags PII-shaped substrings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      "reach me at alice@example.com or 555-123-4567 today",
      "server at 192.168.0.1 and ssn 123-45-6789",
      "perfectly clean text with no identifiers"
    ).toDF("text")
    val out = df.select((TextAnalysis.piiCounts(col("text")) :+
      TextAnalysis.piiFlag(col("text")).as("has_pii")): _*).collect()
    assert(out(0).getAs[Long]("n_email") == 1 && out(0).getAs[Long]("n_phone") == 1)
    assert(out(1).getAs[Long]("n_ipv4") == 1 && out(1).getAs[Long]("n_ssn") == 1)
    assert(out(0).getAs[Boolean]("has_pii") && out(1).getAs[Boolean]("has_pii"))
    assert(!out(2).getAs[Boolean]("has_pii"))
  }
}
