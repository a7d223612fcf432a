package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for a comma-separated list
  * of registered queries into one file per query — the before/after
  * plan evidence the optimization rounds commit under plans/r{N}/.
  * Uses the BENCH session config (local[$SPARK_GRAFT_CPUS], same AQE
  * posture) so the captured plan is the shape the bench actually runs,
  * unlike graft.Plans' local[4] sf0.01 audit dump.
  *
  * `sbt "runMain graft.PlansSome <outDir> <suffix> <q1,q2,...> [sfDir]"`
  * writes `<outDir>/<query>_<suffix>.txt` for each query.
  */
object PlansSome {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, names) = args.take(3)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      val out = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // cap pathological literal lines (full-PSL InSet) like Plans
        out.println(txt.linesIterator.map(l =>
          if (l.length > 2000)
            l.take(2000) + s" ...[line truncated, ${l.length} chars total]"
          else l).mkString("\n"))
      } catch { case e: Throwable => out.println(s"error: ${e.getMessage}") }
      finally out.close()
      graft.operators.Caching.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
