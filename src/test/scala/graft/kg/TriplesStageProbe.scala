package graft.kg

import org.apache.spark.sql.SparkSession

/** Diagnostic main (test scope, not shipped): re-runs ONLY the triples stage
  * of [[Pipeline.run]] against an existing checkpoint directory, at a chosen
  * parallelism, to measure that stage's scaling in isolation.
  *
  *   Test/runMain graft.kg.TriplesStageProbe <threads> <workDir>
  *
  * Expects workDir to hold completed facts/surfaces/links checkpoints
  * (default "" input signature, default LinkerParams); delete
  * triples.lineage.json before invoking to force the stage to recompute.
  */
object TriplesStageProbe {
  def main(args: Array[String]): Unit = {
    val (threads, workDir) = (args(0), args(1))
    val maxPartitionBytes = if (args.length > 2) args(2) else "128m"
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val t0 = System.nanoTime()
      // facts/surfaces/links resume from checkpoints; turns is never scanned
      val res = Pipeline.run(spark, spark.emptyDataFrame, workDir, validate = false)
      val n = res.triples.count()
      println(f"[probe] threads=$threads triples=$n total=${(System.nanoTime() - t0) / 1e9}%.1fs")
    } finally spark.stop()
  }
}
