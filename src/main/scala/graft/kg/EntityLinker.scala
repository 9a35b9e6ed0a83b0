package graft.kg

import graft.ops.{ConnectedComponents, TextSim}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity linking + canonicalization (north rule): MinHash-LSH blocking over
  * surface-form tokens, TF-IDF cosine scoring of the blocked candidate
  * pairs, then connected-components canonicalization to merge alias
  * clusters. Works on DISTINCT surface forms — the corpus-level dedup
  * happens first, so a surface appearing a billion times costs one node.
  *
  * The canonical representative of a component is its longest surface
  * (ties: lexicographically smallest) — alias variants are substrings or
  * abbreviations of the full form, so the longest surface is the full name.
  */
object EntityLinker {

  final case class LinkerParams(
      minHashFunctions: Int = 12,
      rowsPerBand: Int = 1,
      bucketCap: Int = 1000,
      cosineThreshold: Double = 0.5,
      minTokenLen: Int = 2,
      /** tokens present in more than this fraction of surfaces are dropped
        * from the linking signal (corpus-specific stopwords like "Corp":
        * near-zero identity, but they min-hash whole entity families into
        * the same LSH buckets and explode the candidate-pair count). */
      maxDfFraction: Double = 0.1)

  /** @param surfaces single-column DataFrame of surface strings (any name)
    * @return DataFrame(surface, canonical) covering every input surface
    *         (unlinked surfaces map to themselves). */
  def link(spark: SparkSession, surfaces: DataFrame,
           params: LinkerParams = LinkerParams()): DataFrame = {
    val inCol = surfaces.columns(0)
    val distinctSurfaces = surfaces.select(col(inCol).as("surface")).distinct().cache()
    val n = distinctSurfaces.count()

    val maxDf = math.max(8L, (n * params.maxDfFraction).toLong)
    val rawTok = TextSim.tokens(
      distinctSurfaces.select(col("surface").as("id"), col("surface").as("text")),
      "id", "text", params.minTokenLen)
    // ONE document-frequency aggregation serves BOTH the stopword filter
    // and the TF-IDF weights (r06 — previously two full aggs over the
    // token frame: one for stopTokens, one inside tfidf). df per token is
    // identical computed before or after stopword removal (dropping other
    // tokens' rows cannot change a surviving token's document count), so
    // filtering AFTER the df join preserves the exact weights.
    val dfCounts = rawTok.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val tok = rawTok.join(dfCounts, Seq("token"))
      .filter(col("df") <= maxDf)
      .cache()

    // MinHash-LSH blocking (bands of 1 row: candidate iff ANY min-hash
    // collides; with k=12 a Jaccard-1/3 alias pair is missed with p≈(2/3)^12)
    val sig = TextSim.minHashSignatures(tok, params.minHashFunctions)
    val cand = TextSim.candidatePairs(
      TextSim.lshBands(sig, params.minHashFunctions, params.rowsPerBand), params.bucketCap)

    // TF-IDF weights straight from the carried df column (same formula as
    // TextSim.tfidf, minus its second aggregation + join)
    val weights = tok
      .withColumn("w", log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0)
      .select(col("id"), col("token"), col("w"))
    val links = TextSim.cosineOnPairs(cand, weights)
      .filter(col("cos") >= params.cosineThreshold)
      .select(col("a"), col("b"))

    val comps = ConnectedComponents.run(spark, links)

    // representative per component: longest surface, ties lexicographically
    // smallest — struct(min(-length, surface)) keeps this a single agg
    val reps = comps
      .select(col("component"), col("node"))
      .groupBy(col("component"))
      .agg(min(struct((-length(col("node"))).as("negLen"), col("node").as("s"))).as("rep"))
      .select(col("component"), col("rep.s").as("canonical"))

    distinctSurfaces
      .join(comps.withColumnRenamed("node", "surface"), Seq("surface"), "left")
      .join(reps, Seq("component"), "left")
      .select(col("surface"), coalesce(col("canonical"), col("surface")).as("canonical"))
  }
}
