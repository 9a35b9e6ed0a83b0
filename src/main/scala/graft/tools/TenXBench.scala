package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-series evidence for the dedup/ANN family (r3 verdict item 6): the
  * KG pipeline has a size series in BENCH/BASELINE.md, but the ops family's
  * evidence stopped at sf0.1. This main materializes a DETERMINISTIC 10×
  * documents/embeddings corpus and times the family at 1× and 10× in the
  * same session (local[32], repeat/min discipline), printing one JSON line
  * per (query, scale).
  *
  * 10× construction preserves the near-duplicate STRUCTURE instead of
  * inflating it: each document is replicated with every word suffixed by
  * the replica digit, so replicas of the same document share no shingles
  * (suffixing rewrites every k-gram) while pairs that were near-dups stay
  * near-dups within each replica stripe. The corpus is therefore 10
  * disjoint copies of the original similarity graph — true output ~10×,
  * and any super-linear runtime growth is the ENGINE's, not an artifact of
  * quadratic clique inflation. Embeddings get a deterministic per-replica
  * perturbation (±3% element-wise) for the same reason.
  */
object TenXBench {

  private def tenXDocs(docs: DataFrame): DataFrame =
    docs.select(explode(sequence(lit(0), lit(9))).as("r"),
        col("doc_id"), col("text"))
      .select((col("r") * 1000000L + col("doc_id")).as("doc_id"),
        regexp_replace(col("text"), lit("([A-Za-z0-9]+)"),
          concat(lit("$1"), col("r"))).as("text"))

  /** Replica r = the original vector with its dimensions CIRCULARLY SHIFTED
    * by r·(dim/10). A permutation of coordinates preserves every norm and
    * every within-stripe dot product exactly (the 1× similarity structure is
    * intact per stripe), while the cosine between a vector and a shifted
    * copy of itself is that of two nearly-independent directions (~0) — so
    * stripes stay mutually dissimilar and true output scales ~10×.
    *
    * The first version perturbed elements by ±3% instead; that left
    * cross-stripe copies of the same vector at cosine ≈ 0.9995, i.e. one
    * 10-clique of near-dups PER ORIGINAL VECTOR — quadratic true output,
    * and any pairwise op measured "super-linear" purely as an artifact
    * (q_ann_lsh_pairs 0.77 s → 52.6 s). Recorded in BENCH/NEGATIVES.md. */
  private def tenXEmbeddings(emb: DataFrame): DataFrame =
    emb.select(explode(sequence(lit(0), lit(9))).as("r"),
        col("vec_id"), col("embedding"))
      .select((col("r") * 1000000L + col("vec_id")).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          element_at(col("embedding"),
            pmod(j + col("r") * (size(col("embedding")) / 10), size(col("embedding")))
              .cast("int") + 1)).as("embedding"))

  private val opsFamily = Seq(
    "q_dedup_exact", "q_fingerprint", "q_fingerprint_winnow",
    "q_token_count", "q_text_quality", "q_lang_id",
    "q_dedup_minhash_pairs", "q_dedup_ngram_pairs", "q_dedup_simhash_pairs",
    "q_dedup_cc_groups",
    "q_ann_bruteforce_topk", "q_ann_batch_topk", "q_ann_index_topk",
    "q_ann_lsh_pairs")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    val scratch = "/dev/shm/graft-10x"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // Shuffle partitions are a DATA-SIZE knob, not a core-count knob: at a
      // fixed 32, the 10× corpus packs 10× the rows per reduce partition
      // (bigger hash maps, GC pressure) and the comparison measures memory
      // artifacts instead of algorithmic scaling. Standard practice at scale:
      // set the initial count high and let AQE coalesce small stages — the
      // SAME config at both scales keeps the 1×/10× ratio meaningful.
      .config("spark.sql.shuffle.partitions", 8 * cpus.toInt)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize the 10x corpus once (untimed) — both scales then read
    // stored parquet, so the comparison is IO-shape-identical
    val tenDir = s"$scratch/sf10x"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$tenDir/_done"))) {
      tenXDocs(spark.read.parquet(s"$sfDir/documents.parquet"))
        .repartition(32).write.mode("overwrite").parquet(s"$tenDir/documents.parquet")
      tenXEmbeddings(spark.read.parquet(s"$sfDir/embeddings.parquet"))
        .repartition(32).write.mode("overwrite").parquet(s"$tenDir/embeddings.parquet")
      java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$tenDir/_done"))
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // rolling-winnow is not a driver-contract query (the contract entry is
    // the md5/oracle mode) but IS the corpus-scale configuration — bench both
    val extra: Map[String, (SparkSession, String) => DataFrame] = Map(
      "q_fingerprint_winnow_rolling" -> ((s, d) =>
        graft.ops.Dedup.winnowingFingerprints(
          s.read.parquet(s"$d/documents.parquet"), "doc_id", "text", rolling = true)))
    val fns = graft.SparkEntry.queries ++ extra

    // warmup (JIT/codegen)
    fns("q_dedup_exact")(spark, sfDir).write.format("noop").mode("overwrite").save()

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = (opsFamily ++ extra.keys).filter(n => only.forall(_.contains(n)))
    for (scale <- Seq("1x" -> sfDir, "10x" -> tenDir); name <- names) {
      val (label, dir) = scale
      val runs = (1 to repeat).map { _ =>
        val s = time { fns(name)(spark, dir).write.format("noop").mode("overwrite").save() }
        spark.catalog.clearCache()
        s
      }
      println(f"""{"query":"$name","scale":"$label","min_sec":${runs.min}%.3f,"runs":[${runs.map(r => f"$r%.2f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
