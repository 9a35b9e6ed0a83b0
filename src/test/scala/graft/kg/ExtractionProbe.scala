package graft.kg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (test scope, not shipped): A/B-measures the extraction
  * scan's `contains()` trigger prefilter against the bare alternation-regex
  * scan over a stored transcript corpus (e.g. the ScalingBench corpus at
  * /dev/shm/graft_turns_4000000_3000).
  *
  *   Test/runMain graft.kg.ExtractionProbe <threads> <turnsPath> [reps]
  *
  * Prints per-variant wall times (min of reps) for:
  *   regex_only   — explode(regexp_extract_all(factPattern)) over ALL turns
  *   prefiltered  — the same scan behind the contains() trigger filter
  *   filter_only  — the contains() filter alone (its standalone cost)
  */
object ExtractionProbe {
  def main(args: Array[String]): Unit = {
    val threads = args(0)
    val turnsPath = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val turns = spark.read.parquet(turnsPath)
      // rebuild the combined fact pattern from the public pieces (mirrors
      // Extraction.factPattern — triggers and kind words are fixed)
      val triggers = Seq("collaborates with", "contributes to", "is a", "works at")
      val kinds = Seq("organization", "person", "project")
      val m = Extraction.MentionRe
      val factPattern = s"($m) (${triggers.mkString("|")}) ($m|${kinds.mkString("|")}) \\."
      val pre = triggers.map(t => col("text").contains(t)).reduce(_ || _)

      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      def best(name: String)(f: => Long): Unit = {
        val runs = (1 to reps).map(_ => time(f))
        println(f"[probe] $name%-12s min=${runs.map(_._1).min}%.1fs " +
          f"runs=${runs.map(r => f"${r._1}%.1f").mkString(",")} rows=${runs.head._2}")
      }
      best("regex_only") {
        turns.select(explode(regexp_extract_all(col("text"), lit(factPattern), lit(0))).as("s")).count()
      }
      best("prefiltered") {
        turns.filter(pre)
          .select(explode(regexp_extract_all(col("text"), lit(factPattern), lit(0))).as("s")).count()
      }
      best("filter_only") { turns.filter(pre).count() }
    } finally spark.stop()
  }
}
