package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Focused parity tests for the r06 aggregation/blocker rewrites: each
  * optimized formulation is asserted row-identical against the formulation
  * it replaced, on real sf0.001 data.
  */
class AggRewriteParitySpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSet

  test("two-level or_union aggregation matches the countDistinct formulation") {
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey").as("focus"))
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val joined = cust.join(ord, cust("focus") === ord("o_custkey"), "left")
    // the replaced formulation: two countDistinct aggregates (plans an Expand)
    val old = joined.groupBy(col("focus"))
      .agg(countDistinct(when(col("o_orderstatus") === "O", col("o_orderkey"))).as("cO"),
        countDistinct(when(col("o_orderstatus") === "F", col("o_orderkey"))).as("cF"))
      .filter(col("cO") >= 3 || col("cF") <= 1).select(col("focus"))
    // the r06 form: dedup (focus, okey) with flags, then plain counts
    val neu = joined.groupBy(col("focus"), col("o_orderkey"))
      .agg(max(col("o_orderstatus") === "O").as("isO"),
        max(col("o_orderstatus") === "F").as("isF"))
      .groupBy(col("focus"))
      .agg(count(when(col("isO"), col("o_orderkey"))).as("cO"),
        count(when(col("isF"), col("o_orderkey"))).as("cF"))
      .filter(col("cO") >= 3 || col("cF") <= 1).select(col("focus"))
    assert(rows(neu) == rows(old))
  }

  test("two-level or_union aggregation matches on duplicate-carrying edges") {
    import spark.implicits._
    // duplicates of (focus, okey) MUST not change the counts — the property
    // the q_or_union/joinStats rewrites rely on (flags constant per object)
    val edges = Seq(
      (1L, 10L, "O"), (1L, 10L, "O"), (1L, 11L, "F"), (1L, 12L, "O"),
      (2L, 20L, "F"), (2L, 20L, "F"), (3L, 30L, "O"),
      (4L, 40L, "P")).toDF("focus", "okey", "status")
    val old = edges.groupBy($"focus")
      .agg(countDistinct(when($"status" === "O", $"okey")).as("cO"),
        countDistinct(when($"status" === "F", $"okey")).as("cF"))
    val neu = edges.groupBy($"focus", $"okey")
      .agg(max($"status" === "O").as("isO"), max($"status" === "F").as("isF"))
      .groupBy($"focus")
      .agg(count(when($"isO", $"okey")).as("cO"), count(when($"isF", $"okey")).as("cF"))
    assert(rows(neu) == rows(old))
  }

  test("fused simhash+minhash band frame yields the same verified pairs as per-family chains") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    graft.functions.GraftFunctions.register(spark)
    // current (fused) operator output
    val fused = Dedup.simHashVerifiedPairs(spark, docs, "doc_id", "text")
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
    // the replaced formulation: each blocker family through its own
    // candidatePairs chain, then an explicit cross-family dedup
    val n = 3; val numHashes = 16; val rowsPerBand = 2; val bucketCap = 1000
    val sketches = Dedup.wordTokens(docs, "doc_id", "text")
      .filter(size(col("w")) > 0)
      .select(col("id"),
        call_function("simhash64", col("w")).as("simhash"),
        when(size(col("w")) >= n, call_function("ngram_hash_set", col("w"), lit(n))).as("sh"))
      .localCheckpoint(true)
    val bandKeys = (0 until 4).map { b =>
      shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))
    }
    val bands = sketches.select(col("id"), posexplode(array(bandKeys: _*))).toDF("id", "band", "key")
    val simCand = TextSim.candidatePairs(bands, bucketCap)
    val grams = sketches.filter(col("sh").isNotNull).select(col("id"), col("sh"))
    val sig = TextSim.minHashSignaturesFromSets(grams, numHashes)
    val minCand = TextSim.candidatePairs(TextSim.lshBands(sig, numHashes, rowsPerBand), bucketCap)
    val cand = simCand.union(minCand)
      .repartition(spark.sparkContext.defaultParallelism, col("a"), col("b"))
      .dropDuplicates("a", "b")
    val old = TextSim.jaccardOnPairSets(cand, grams).filter(col("jaccard") >= 0.8)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
    assert(rows(fused) == rows(old))
    assert(fused.count() > 0) // non-vacuous: the corpus has verified pairs
  }
}
