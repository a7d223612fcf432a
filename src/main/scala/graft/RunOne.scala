package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: time (and optionally explain) one registered query.
  *
  * `sbt "runMain graft.RunOne <name> [sfDir] [--explain] [--reps N]"`
  *
  * Mirrors Bench's session config so a number measured here predicts
  * the per-query number in BENCH_r{N}.json. Repetitions clear the
  * cache between runs (like Bench does between queries) so the
  * steady-state rep isolates query cost from JIT/classload warmup.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    // drop flags AND their values ("--reps 3" must not leak "3" into
    // the positional sfDir slot)
    val pos = args.zipWithIndex.filterNot { case (a, i) =>
      a.startsWith("--") ||
        (i > 0 && (args(i - 1) == "--reps" || args(i - 1) == "--json"))
    }.map(_._1)
    val name = pos.headOption.getOrElse(sys.error("usage: RunOne <query> [sfDir]"))
    val sfDir = pos.lift(1).getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("--explain")
    val reps = args.sliding(2).collectFirst {
      case Array("--reps", n) => n.toInt }.getOrElse(2)
    // --json <path>: append one machine-readable adjudication row —
    // the tools/adjudicate.py harness composes these into
    // adjudications_r{N}.json so burst-window flags are re-measured
    // and recorded AUTOMATICALLY, not hand-written (r16 verdict #6)
    val jsonOut = args.sliding(2).collectFirst {
      case Array("--json", p) => p }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // cap AQE coalescing at 16 MB wire-bytes per reducer: agg hash
      // entries cost ~3-5x their wire bytes on-heap, so the 64 MB
      // default re-collapsed basket_pairs' 36 M-group aggregation at
      // sf3 to 8 partitions of ~4.5 M groups each — the GC tail the
      // r13 chain measured; at 16 MB the same shuffle keeps 26-32
      // reducers. (A wider initialPartitionNum was tried and reverted:
      // it taxed every small-scale query with extra tasks while the
      // advisory cap alone delivers the partition count.)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // streaming-replay state store, same contract as Verify/Bench
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    if (explain) fn(spark, sfDir).explain("formatted")
    // foreign CPU per rep (core-seconds other processes burned while
    // the rep ran) — the ONE shared /proc accounting (graft.ProcCpu)
    // Bench uses, steal included; an adjudication number is only
    // evidence if it carries its own contamination measurement
    // (co-tenant bursts on this box fake 3-10x regressions within a
    // single JVM's reps)
    def totalBusyJiffies(): Long = ProcCpu.totalBusyJiffies()
    def selfJiffies(): Long = ProcCpu.selfJiffies()
    val times = Array.ofDim[Double](reps)
    val foreigns = Array.ofDim[Double](reps)
    (1 to reps).foreach { i =>
      val b0 = totalBusyJiffies(); val s0 = selfJiffies()
      val t0 = System.nanoTime()
      // noop write = Bench's action (count-star pruning can skip
      // count-irrelevant subtrees and fake the timing)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.operators.Caching.release()
      spark.catalog.clearCache()
      val b1 = totalBusyJiffies(); val s1 = selfJiffies()
      val foreign =
        if (b0 >= 0 && s0 >= 0 && b1 >= 0 && s1 >= 0)
          ((b1 - b0) - (s1 - s0)) / 100.0
        else -1.0
      times(i - 1) = dt; foreigns(i - 1) = foreign
      println(f"[runone] rep=$i $name t=$dt%.3fs foreign=$foreign%.1fs")
    }
    jsonOut.foreach { path =>
      // iso_mid = lower median of the WARM reps (rep 1 is the cold
      // JIT/classload run) — the same statistic the hand-written
      // adjudication rows have always reported
      val warm = (if (reps > 1) times.drop(1) else times).sorted
      val isoMid = warm((warm.length - 1) / 2)
      def arr(a: Array[Double]) =
        a.map(v => f"$v%.3f").mkString("[", ",", "]")
      val row = s"""{"query":"$name","sf":"$sfDir","reps":${arr(times)},""" +
        s""""foreign_cpu":${arr(foreigns)},"iso_mid":${f"$isoMid%.3f"}}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), row + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      ()
    }
    spark.stop()
  }
}
