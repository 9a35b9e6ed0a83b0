package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF coarse-quantization index — the 100 TB serving shape for
  * approximate similarity search. [[Similarity.ivfBatchTopK]] re-trains
  * k-means inside every call (fine for one-shot analytics, wrong for a
  * pipeline that answers many query batches): here the index is FIT once
  * (k-means on a deterministic bounded sample — the full corpus is never
  * scanned per training iteration), persisted as a tiny parquet of k·dim
  * doubles, and the corpus is assigned to cells in ONE pass whose result
  * can itself be stored bucketed by `cell` for shuffle-free probing.
  *
  * All vector math runs through the native kernels
  * ([[graft.functions.NearestCells]], [[graft.functions.CosineSimilarity]]);
  * plans stay O(1) in nCentroids.
  *
  * @param centroids cell id (array index) → centroid vector
  * @param bcastThreshold matrices of at least this many doubles route
  *        through an explicit per-executor Broadcast instead of the plan
  *        literal. TaskBinaryProbe ledger (BENCH/BASELINE.md): the literal
  *        form ships the matrix TWICE per task binary (Literal child +
  *        kernel reference object) and every task re-pays deserialization
  *        (~5.4 s at 10⁴×768 ≈ 123 MB) — per-stage and per-job; the
  *        broadcast is fetched once per executor for the job lifetime.
  *        Default 2²⁰ doubles (≈8 MB serialized, e.g. 10³ cells × 10³
  *        dims); small indexes keep the zero-session-state literal plan.
  */
final case class IvfIndex(centroids: Array[Seq[Double]],
                          bcastThreshold: Long = 1L << 20) {

  def nCentroids: Int = centroids.length

  @transient private var matBcast:
    org.apache.spark.broadcast.Broadcast[graft.functions.CentroidMatrix] = _

  // session functions bound to matBcast, dropped on release() — names are
  // keyed on (broadcast id, nProbe) so growth is bounded by the distinct
  // probe widths used against this index, but a released index must not
  // leave registry entries pinning a destroyed broadcast
  @transient private lazy val registeredFns =
    scala.collection.mutable.Set.empty[(SparkSession, String)]

  private def matrixDoubles: Long =
    centroids.length.toLong * (if (centroids.isEmpty) 0 else centroids(0).length)

  private def cells(spark: SparkSession, vecCol: Column, nProbe: Int): Column =
    if (matrixDoubles < bcastThreshold)
      call_function("ivf_cells", vecCol, typedLit(centroids.toSeq), lit(nProbe))
    else {
      synchronized {
        if (matBcast == null)
          matBcast = spark.sparkContext.broadcast(
            new graft.functions.CentroidMatrix(centroids.map(_.toArray)))
      }
      val fn = graft.functions.GraftFunctions.registerCentroidBcast(spark, matBcast, nProbe)
      synchronized { registeredFns += ((spark, fn)) }
      call_function(fn, vecCol)
    }

  /** Release the centroid broadcast and its registry entries (no-op on the
    * literal path). Call when the index is retired AND its plans have been
    * consumed — broadcasts otherwise live until context stop. */
  def release(): Unit = synchronized {
    registeredFns.foreach { case (s, fn) =>
      graft.functions.GraftFunctions.dropCentroidBcast(s, fn)
    }
    registeredFns.clear()
    if (matBcast != null) { matBcast.destroy(); matBcast = null }
  }

  /** One-pass corpus assignment: input columns preserved, plus `cell` (the
    * max-cosine centroid index). Write the result bucketed/partitioned by
    * `cell` to serve probes without a shuffle.
    *
    * LIFECYCLE: on the large-matrix (broadcast) path the returned plan
    * references this index's centroid broadcast — materialize the outputs
    * of every [[assignCorpus]]/[[batchTopK]] plan you intend to keep, then
    * call [[release]] when the index is retired (the declared
    * q_ann_index_topk serving query demonstrates the cycle; OpsSpec asserts
    * a ≥2²⁰-double fit→assign→topK→release cycle leaves no registry
    * entry). */
  def assignCorpus(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cell", element_at(cells(df.sparkSession, col("v"), 1), 1))
  }

  /** Batch k-NN against a PRE-ASSIGNED corpus (the output of
    * [[assignCorpus]], possibly read back from its bucketed layout):
    * queries explode to their nProbe cells, meet the corpus in an equi-join
    * on `cell`, exact cosine re-ranks, a per-query window keeps top k.
    * Identical plan shape to [[Similarity.ivfBatchTopK]] minus the
    * training. @return (qid, id, cos), rank ≤ k per qid, ties by id asc */
  def batchTopK(queries: DataFrame, corpusCells: DataFrame,
                idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .select(col("qid"), col("qv"),
        explode(cells(queries.sparkSession, col("qv"), nProbe)).as("cell"))
    val scored = q.join(corpusCells, Seq("cell"))
      .select(col("qid"), col("id"),
        Similarity.cosineNative(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"))
  }

  /** Persist as parquet (cell: int, centroid: array<double>) — k·dim
    * doubles, metadata-sized at any corpus scale. */
  def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(path)
  }
}

object IvfIndex {

  /** Persist an assigned corpus ([[IvfIndex.assignCorpus]] output) as a
    * catalog table bucketed by `cell`: probes then join WITHOUT exchanging
    * the corpus side — only the (tiny, query×nProbe) probe frame shuffles
    * to meet the buckets. At 100 TB this is the difference between
    * re-shuffling the whole corpus per query batch and a bucket-local
    * lookup (PlanSpec asserts the corpus-side Exchange is gone). */
  def writeAssignedBucketed(assigned: DataFrame, table: String, buckets: Int = 64): Unit =
    assigned.write.mode("overwrite")
      .bucketBy(buckets, "cell")
      .sortBy("cell")
      .saveAsTable(table)

  /** Fit on a deterministic sample: the `trainCap` lowest-xxhash64(id) rows
    * (uniform, order- and partitioning-independent, reproducible). The full
    * corpus is touched only by [[IvfIndex.assignCorpus]] afterwards — never
    * by the k-means iterations. */
  def fit(spark: SparkSession, data: DataFrame, idCol: String, vecCol: String,
          nCentroids: Int, iters: Int = 5, trainCap: Long = 100000): IvfIndex = {
    val d = data.select(col(idCol).as("id"), col(vecCol).as("v"))
    IvfIndex(Similarity.kMeansCentroids(spark, d, nCentroids, iters, trainCap))
  }

  def load(spark: SparkSession, path: String): IvfIndex = {
    val rows = spark.read.parquet(path).select(col("cell"), col("centroid"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
      .sortBy(_._1)
    IvfIndex(rows.map(_._2))
  }
}
