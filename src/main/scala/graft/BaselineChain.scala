package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reference-parity throughput measurement: the EXACT pipeline shape
  * of the reference's own performance_test.py — 1M integers through
  * filter(even) → map(×2) → filter(>100) → map(+1) — timed median-of-N
  * after warmup, on one core (apples-to-apples with the reference's
  * single-process sequential strategy) and on all cores (the scale-out
  * the reference's thread/process strategies approximate).
  *
  * The reference side of this number comes from running the SAME chain
  * through laygo's Pipeline.to_list() (a PEP-695-syntax-stripped copy
  * under this container's Python 3.11 — semantics untouched, measured
  * with its own chunked executor). The Spark side consumes every
  * computed row through a sum aggregate: whole-stage codegen keeps the
  * four row-level stages in ONE compiled loop, which is the design
  * argument (§4) this measurement exists to back with a number.
  */
object BaselineChain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val reps = 10
    Seq(1, Runtime.getRuntime.availableProcessors()).foreach { cores =>
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      def run(): Long = {
        val out = spark.range(n)
          .filter(col("id") % 2 === 0)
          .select((col("id") * 2).as("x"))
          .filter(col("x") > 100)
          .select((col("x") + 1).as("x"))
        // sum consumes every computed row (count alone could prune the
        // final projection); .first forces one full evaluation
        out.agg(sum(col("x")).as("s"), count(lit(1)).as("rows"))
          .collect().head.getLong(1)
      }
      val rows = run() // warmup (JIT + codegen)
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(reps / 2)
      println(f"[baseline-chain] cores=$cores rows_in=$n rows_out=$rows " +
        f"median_s=$med%.4f rows_per_s=${n / med}%,.0f")
      spark.stop()
    }
  }
}
