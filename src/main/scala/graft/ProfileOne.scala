package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev profiler: run one registered query once (after a warmup rep)
  * and print every Spark job's wall time + first line of its call
  * site — shows where a multi-level plan spends its fixed overhead
  * (job scheduling, checkpoint materialization, broadcast builds).
  *
  * `sbt "runMain graft.ProfileOne <name> [sfDir]"`
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ProfileOne <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    // warmup rep (JIT/classload)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    graft.operators.Caching.release()
    spark.catalog.clearCache()

    val starts = mutable.Map[Int, (Long, String)]()
    val lines = mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.map(si => s"${si.name.takeWhile(_ != '\n').take(60)}/${si.numTasks}")
          .mkString(" | ")
        starts(js.jobId) = (js.time, s"stages=${js.stageInfos.size} $site")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        starts.get(je.jobId).foreach { case (t0, site) =>
          lines += f"[job] id=${je.jobId}%-4d dt=${(je.time - t0) / 1e3}%7.3fs  $site"
        }
      }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let listener drain
    lines.foreach(println)
    println(f"[profile] $name total=$dt%.3fs jobs=${lines.size}")
    spark.stop()
  }
}
