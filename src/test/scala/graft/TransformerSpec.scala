package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Operator semantics mirroring reference tests
  * (/root/reference/tests/test_transformer.py).
  */
class TransformerSpec extends SparkSpec {
  import spark.implicits._

  test("map transforms every element (test_transformer: map doubles)") {
    val out = Pipeline(Seq(1, 2, 3, 4, 5).toDF("x"))
      .transform(_.map((col("x") * 2).as("x")))
      .toList()._1.map(_.getInt(0))
    assert(out.sorted == Seq(2, 4, 6, 8, 10))
  }

  test("filter keeps matching elements (test_transformer: evens)") {
    val out = Pipeline((1 to 10).toDF("x"))
      .transform(_.filter(col("x") % 2 === 0))
      .toList()._1.map(_.getInt(0))
    assert(out.sorted == Seq(2, 4, 6, 8, 10))
  }

  test("map+filter chain composes (README pipeline example)") {
    // Pipeline([1..10]).filter(even).map(*2) == [4,8,12,16,20]
    val out = Pipeline((1 to 10).toDF("x"))
      .transform(_.filter(col("x") % 2 === 0).map((col("x") * 2).as("x")))
      .toList()._1.map(_.getInt(0))
    assert(out.sorted == Seq(4, 8, 12, 16, 20))
  }

  test("flatten explodes collections (test_transformer: flatten)") {
    val out = Pipeline(Seq(Seq(1, 2), Seq(3), Seq.empty[Int]).toDF("xs"))
      .transform(_.flatten(col("xs"), "x").map(col("x")))
      .toList()._1.map(_.getInt(0))
    assert(out.sorted == Seq(1, 2, 3))
  }

  test("reduce global aggregates whole dataset (test_transformer: reduce)") {
    val (rows, _) = Pipeline((1 to 100).toDF("x"))
      .transform(_.reduceGlobal(sum(col("x")).as("s"), count(lit(1)).as("n")))
      .toList()
    assert(rows.head.getLong(0) == 5050L && rows.head.getLong(1) == 100L)
  }

  test("reduce per key = chunked reduce, map-side partial") {
    val (rows, _) = Pipeline(Seq(("a", 1), ("b", 2), ("a", 3)).toDF("k", "v"))
      .transform(_.reducePerKey(Seq(col("k")), Seq(sum(col("v")).as("s"))))
      .toList()
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == Map("a" -> 4L, "b" -> 2L))
  }

  test("reducePerChunk emits one row per partition (laygo per_chunk=True)") {
    val (rows, _) = Pipeline((1 to 100).toDF("x"))
      .transform(_.setChunker(4).reducePerChunk(Seq(sum(col("x")).as("s"), count(lit(1)).as("n"))))
      .toList()
    assert(rows.size == 4)
    assert(rows.map(_.getLong(1)).sum == 5050L)
    assert(rows.map(_.getLong(2)).sum == 100L)
  }

  test("andThen composes transformers (apply/from_transformer)") {
    val double = Transformer.identity.map((col("x") * 2).as("x"))
    val addOne = Transformer.identity.map((col("x") + 1).as("x"))
    val out = Pipeline(Seq(1, 2).toDF("x")).apply(double.andThen(addOne))
      .toList()._1.map(_.getInt(0))
    assert(out.sorted == Seq(3, 5))
    // reuse of the immutable value == from_transformer copy semantics
    val out2 = Pipeline(Seq(10).toDF("x")).apply(double).toList()._1.map(_.getInt(0))
    assert(out2 == Seq(20))
  }

  test("loop iterates until condition with bounded iterations") {
    // guard inside the body: converged rows pass through unchanged
    val body = Transformer.identity.map(
      when(col("x") < 32, col("x") * 2).otherwise(col("x")).as("x"))
    val out = Pipeline(Seq(1, 3, 40).toDF("x"))
      .transform(_.loop(body, df => !df.where(col("x") < 32).isEmpty, 10))
      .toList()._1.map(_.getInt(0))
    // 1 -> 32 (5 doublings), 3 -> 48 (4), 40 already converged
    assert(out.sorted == Seq(32, 40, 48))
  }

  test("loop respects max_iterations cap") {
    val body = Transformer.identity.map((col("x") + 1).as("x"))
    val out = Pipeline(Seq(0).toDF("x"))
      .transform(_.loop(body, _ => true, 5))
      .toList()._1.map(_.getInt(0))
    assert(out == Seq(5))
  }

  test("shortCircuit halts when condition met (test_transformer: short_circuit)") {
    val p = Pipeline(Seq(1, -2, 3).toDF("x"))
    intercept[IllegalStateException] {
      p.transform(_.shortCircuit((df, _) => !df.where(col("x") < 0).isEmpty))
    }
  }

  test("shortCircuit passes data through when condition not met") {
    val out = Pipeline(Seq(1, 2).toDF("x"))
      .transform(_.shortCircuit((df, _) => !df.where(col("x") < 0).isEmpty))
      .toList()._1.map(_.getInt(0))
    assert(out.sorted == Seq(1, 2))
  }

  test("catchErrors quarantines failed rows, keeps ok rows (test_transformer: catch)") {
    val attempt = Transformer.identity.map(
      col("x"), try_divide(lit(10), col("x") % 3).as("r"), lit("ok").as("status"))
    val (rows, _) = Pipeline(Seq(1, 2, 3, 4, 6).toDF("x"))
      .transform(_.catchErrors(attempt, col("r").isNull,
        ErrorHandler.quarantine((bad, _) => bad.withColumn("status", lit("error")))))
      .toList()
    val byX = rows.map(r => r.getInt(0) -> r.getString(2)).toMap
    assert(byX == Map(1 -> "ok", 2 -> "ok", 3 -> "error", 4 -> "ok", 6 -> "error"))
  }

  test("catchErrors default handler drops failed rows (laygo returns [])") {
    val attempt = Transformer.identity.map(
      col("x"), try_divide(lit(10), col("x") - 2).as("r"))
    val out = Pipeline(Seq(1, 2, 3).toDF("x"))
      .transform(_.catchErrors(attempt, col("r").isNull))
      .toList()._1.map(_.getInt(0))
    assert(out.sorted == Seq(1, 3))
  }

  test("ErrorHandler chain: last non-None result wins, handlers all run") {
    var sideEffects = Vector.empty[String]
    val h = ErrorHandler.drop
      .onError { (bad, _) => sideEffects :+= "log"; None }
      .onError { (bad, _) => sideEffects :+= "tag"; Some(bad.withColumn("handled", lit(true))) }
    val bad = Seq(9).toDF("x")
    val res = h.handle(bad, PipelineContext(spark))
    assert(res.isDefined && res.get.columns.contains("handled"))
    assert(sideEffects == Vector("log", "tag"))
  }

  test("tap observes metrics without changing the stream (test_transformer: tap)") {
    val (rows, _) = Pipeline(Seq(1, 2, 3).toDF("x"))
      .transform(_.tap("m1", count(lit(1)).as("n")).map((col("x") * 10).as("x")))
      .toList()
    assert(rows.map(_.getInt(0)).sorted == Seq(10, 20, 30))
  }

  test("tapCount counts rows into context accumulator") {
    val p = Pipeline(Seq(1, 2, 3, 4).toDF("x"))
    val (_, ctx) = p.transform(_.tapCount("seen")).consume()
    assert(ctx("seen") == 4L)
  }

  test("setChunker repartitions (set_chunker)") {
    val p = Pipeline((1 to 100).toDF("x")).transform(_.setChunker(7))
    assert(p.toDF.rdd.getNumPartitions == 7)
    val keyed = Pipeline((1 to 100).toDF("x")).transform(_.setChunker(3, col("x") % 3))
    assert(keyed.toDF.rdd.getNumPartitions == 3)
  }
}
