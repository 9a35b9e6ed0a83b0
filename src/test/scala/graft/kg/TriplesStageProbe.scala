package graft.kg

import org.apache.spark.sql.SparkSession

/** Diagnostic main (test scope, not shipped): re-runs ONLY the triples stage
  * of [[Pipeline.run]] against an existing checkpoint directory, at a chosen
  * parallelism, to measure that stage's scaling in isolation.
  *
  *   Test/runMain graft.kg.TriplesStageProbe <threads> <workDir> [maxPartitionBytes]
  *   Test/runMain graft.kg.TriplesStageProbe --build <turnsParquet> <workDir>
  *
  * `--build` runs the full pipeline once at local[32] over a stored
  * transcript corpus (e.g. ScalingBench's /dev/shm/graft_turns_*) to
  * populate facts/surfaces/links checkpoints (default "" input signature,
  * default LinkerParams). Probe mode then deletes the triples lineage and
  * recomputes just that stage, printing PER-JOB wall times (description =
  * the job's callSite) so the serial-vs-parallel split is visible: jobs
  * whose wall time is flat across thread counts are the stage's Amdahl
  * floor. */
object TriplesStageProbe {

  private final class JobTimer extends org.apache.spark.scheduler.SparkListener {
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      starts.put(j.jobId, (System.nanoTime(),
        j.stageInfos.lastOption.map(si => s"${si.name.takeWhile(_ != '\n')} (${j.stageInfos.map(_.numTasks).sum} tasks)")
          .getOrElse("?")))
    override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      val s = starts.remove(j.jobId)
      if (s != null) lines.add(
        f"job ${j.jobId}%3d ${(System.nanoTime() - s._1) / 1e9}%7.2fs  ${s._2}")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "--build") {
      val (turnsPath, workDir) = (args(1), args(2))
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/dev/shm/graft-spark-local")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val res = Pipeline.run(spark, spark.read.parquet(turnsPath), workDir, validate = false)
        println(s"[probe] built checkpoints in $workDir, triples=${res.triples.count()}")
      } finally spark.stop()
      return
    }

    val (threads, workDir) = (args(0), args(1))
    val maxPartitionBytes = if (args.length > 2) args(2) else "32m"
    // force the triples stage (and ONLY it) to recompute
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(s"$workDir/triples.lineage.json"))
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
    val timer = new JobTimer
    spark.sparkContext.addSparkListener(timer)
    try {
      val t0 = System.nanoTime()
      // facts/surfaces/links resume from checkpoints; turns is never scanned
      val res = Pipeline.run(spark, spark.emptyDataFrame, workDir, validate = false)
      val stageSec = res.stageSeconds.getOrElse("triples", -1.0)
      val n = res.triples.count()
      Thread.sleep(500) // let the listener bus drain the last JobEnd
      timer.lines.forEach(l => System.err.println(s"[probe] $l"))
      println(f"[probe] threads=$threads mpb=$maxPartitionBytes triples=$n " +
        f"stage=$stageSec%.1fs total=${(System.nanoTime() - t0) / 1e9}%.1fs")
    } finally spark.stop()
  }
}
