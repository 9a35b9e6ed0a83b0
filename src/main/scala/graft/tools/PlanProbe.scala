package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement probe: what join strategies does AQE actually pick for the
  * set-sketch near-dup pipeline at sf0.1? The in-row formulation's claim is
  * that the candidate side is small enough for runtime broadcast, so the
  * per-doc token-set arrays never re-shuffle after their one build.
  *
  * Recorded result (2026-08-18, sf0.1, local[8]):
  * `BroadcastHashJoin=6 SortMergeJoin=0 ShuffledHashJoin=0` — every join in
  * the executed q_dedup_minhash_pairs plan (bucket self-join and both
  * candidate↔doc-set verification joins included) ran as a runtime
  * broadcast. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-planprobe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = graft.ops.Dedup.minHashNearDupPairs(spark, docs, "doc_id", "text")
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString
    val bhj = plan.split("\n").count(_.contains("BroadcastHashJoin"))
    val smj = plan.split("\n").count(_.contains("SortMergeJoin"))
    val shj = plan.split("\n").count(_.contains("ShuffledHashJoin"))
    System.err.println(s"[plan] BroadcastHashJoin=$bhj SortMergeJoin=$smj ShuffledHashJoin=$shj")
    spark.stop()
  }
}
