package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the streaming_window_e2e fixed cost: splits one
  * rep into schema/setup, query start, processAllAvailable, and stop, and
  * reports micro-batch count/durations from the progress events.
  * Usage: runMain graft.tools.StreamProbe [sfDir] [reps] [noDataBatches]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val noData = if (args.length > 2) args(2) else "true"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-streamprobe/local")
      .config("spark.sql.streaming.checkpointLocation", "/dev/shm/graft-streamprobe/ckpt")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", noData)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    for (rep <- 1 to reps) {
      println(s"=== rep $rep (noDataMicroBatches=$noData)")
      val schema = t("schema")(spark.read.parquet(s"$sfDir/events.parquet").schema)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir)
        .withColumn("ts", col("ts").cast("timestamp"))
      val df = graft.streaming.EventStream.windowedCounts(stream)
      val q = t("start") {
        df.writeStream.format("memory").queryName(s"probe_${noData}_$rep")
          .outputMode("update").start()
      }
      t("processAllAvailable")(q.processAllAvailable())
      val prog = q.recentProgress
      t("stop")(q.stop())
      prog.foreach(p => println(
        f"  batch ${p.batchId} rows=${p.numInputRows} durMs=${p.durationMs}"))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
