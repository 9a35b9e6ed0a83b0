package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Per-job wall-clock breakdown for one declared query at driver-bench
  * parallelism: which Spark jobs a query submits, how long each takes, and
  * the task count — locates the expensive piece of a multi-job operator.
  *
  * Usage: runMain graft.tools.JobProbe [query] [sfDir] [reps] [cpus]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val query = if (args.nonEmpty) args(0) else "q_shacl_validate"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = if (args.length > 3) args(3) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-jobprobe/spark-local")
      .config("spark.sql.warehouse.dir", "/dev/shm/graft-jobprobe/warehouse")
      .config("spark.sql.streaming.checkpointLocation", "/dev/shm/graft-jobprobe/stream-ckpt")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(start: Long, var end: Long = 0L, var stages: Int = 0,
                            var tasks: Int = 0, var taskTimeMs: Long = 0L,
                            var shuffleReadMB: Double = 0, var shuffleWriteMB: Double = 0,
                            desc: String)
    val jobsMap = new TrieMap[Int, JobRec]()
    val stageToJob = new TrieMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')).getOrElse("")
        val desc = Option(j.properties.getProperty("spark.job.description"))
          .filter(_.nonEmpty).getOrElse(site)
        jobsMap(j.jobId) = JobRec(start = j.time, desc = desc)
        j.stageIds.foreach(s => stageToJob(s) = j.jobId)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobsMap.get(j.jobId).foreach(_.end = j.time)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stageToJob.get(s.stageInfo.stageId).flatMap(jobsMap.get).foreach { r =>
          r.stages += 1
          r.tasks += s.stageInfo.numTasks
          r.taskTimeMs += s.stageInfo.taskMetrics.executorRunTime
          r.shuffleReadMB += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6
          r.shuffleWriteMB += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6
        }
      }
    })

    val fn = graft.SparkEntry.queries(query)
    for (i <- 1 to reps) {
      jobsMap.clear(); stageToJob.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(800) // let the listener bus drain the final JobEnd
      println(f"=== run $i: $query wall=$wall%.2f s, ${jobsMap.size} jobs ===")
      jobsMap.toSeq.sortBy(_._1).foreach { case (id, r) =>
        val dur = if (r.end > 0) (r.end - r.start) / 1e3 else -1.0
        println(f"  job $id%3d ${dur}%7.2fs stages=${r.stages}%2d tasks=${r.tasks}%4d " +
          f"taskTime=${r.taskTimeMs / 1e3}%7.2fs shufR=${r.shuffleReadMB}%.1fMB shufW=${r.shuffleWriteMB}%.1fMB ${r.desc.take(60)}")
      }
    }
    spark.stop()
  }
}
