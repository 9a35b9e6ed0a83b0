package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main (test scope): A/B the corpus-wide triple dedup inside the
  * triples stage, which TriplesStageProbe showed is the worst-scaling job of
  * the pipeline (81.8 s at 2 threads → 36.5 s at 8; per-task wall nearly
  * DOUBLES with 8 concurrent tasks). Hypothesis: the default plan's
  * map-side partial HashAggregate builds a multi-million-entry hash table
  * in EVERY concurrent task — 8 random-probed ~100 MB working sets thrash
  * the shared LLC, turning the scan into latency-bound DRAM traffic, while
  * the duplicate factor per map task is far too low (~120M rows / 3M
  * distinct spread over ~19 tasks/wave) for the partial pass to pay for
  * itself in shuffle savings.
  *
  *   Test/runMain graft.kg.DistinctVariantsProbe <threads> <workDir> [reps]
  *
  * Variants (identical result cardinality, asserted):
  *  - partial:    compact.distinct() — partial + final HashAggregate (the
  *                pipeline's current plan)
  *  - keyshuffle: repartition(keys) then dropDuplicates — the exchange
  *                satisfies the aggregate's clustering requirement, so the
  *                planner emits ONE full aggregate after the shuffle: raw
  *                rows move (20 B each, tmpfs), but each reduce task probes
  *                a table holding only its OWN key range (3M/P entries).
  */
object DistinctVariantsProbe {
  def main(args: Array[String]): Unit = {
    val threads = args(0)
    val workDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val facts = spark.read.parquet(s"$workDir/facts.parquet")
      val links = spark.read.parquet(s"$workDir/links.parquet")
      val sLink = links.select(col("surface").as("subjSurface"), xxhash64(col("canonical")).as("sid"))
      val oLink = links.select(col("surface").as("objSurface"), xxhash64(col("canonical")).as("oid"))
      def compact: DataFrame = facts
        .join(sLink, Seq("subjSurface"))
        .join(oLink, Seq("objSurface"), "left")
        .select(col("sid"), col("pid"),
          coalesce(col("oid"), -col("clsIdx").cast("long")).as("oid"))
        .filter(col("oid").isNotNull)

      def gcMillis: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
          .map(_.getCollectionTime).filter(_ > 0).sum
      }
      def cpuNanos: Long =
        java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
          case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
          case _ => 0L
        }
      def time(body: => Long): (Double, Long, Double, Double) = {
        val gc0 = gcMillis; val cpu0 = cpuNanos
        val t0 = System.nanoTime(); val n = body
        ((System.nanoTime() - t0) / 1e9, n, (gcMillis - gc0) / 1e3, (cpuNanos - cpu0) / 1e9)
      }
      val variants: Seq[(String, () => Long)] = Seq(
        // scan+joins WITHOUT dedup: isolates the upstream cost both real
        // variants share (count() over the joins collapses to a per-task
        // counter, no shuffle of the 120M rows)
        "scanjoin" -> (() => compact.count()),
        "partial" -> (() => compact.distinct().count()),
        "keyshuffle" -> (() => compact
          .repartition(col("sid"), col("pid"), col("oid"))
          .dropDuplicates("sid", "pid", "oid").count())
      )
      (1 to reps).foreach { rep =>
        variants.foreach { case (name, run) =>
          val (sec, n, gcSec, cpuSec) = time(run())
          System.err.println(f"[distinct-probe] threads=$threads rep=$rep $name%-10s $sec%7.2fs " +
            f"n=$n gc=$gcSec%.1fs cpu=$cpuSec%.0fs cpu/wall=${cpuSec / sec}%.2f of $threads")
          spark.catalog.clearCache()
        }
      }
    } finally spark.stop()
  }
}
