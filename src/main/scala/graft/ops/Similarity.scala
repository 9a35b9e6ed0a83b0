package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>` /
  * `array<double>`). Brute-force cosine top-k is the exact baseline; the
  * scale path blocks with random-hyperplane LSH (sign sketches) so only
  * bucket-local pairs are scored.
  *
  * Vector math runs through native Catalyst expressions
  * (graft.functions.{CosineSimilarity, NearestCells, SignSketch} — one
  * fused codegen loop per row each); the `zip_with` + `aggregate`
  * higher-order formulations are kept as portable fallbacks and parity
  * oracles. No UDFs, vectors never leave the executor.
  */
object Similarity {

  /** dot(a, b) over two array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Portable higher-order-function cosine — works without session setup;
    * the operators below prefer [[cosineNative]] (bit-identical results,
    * single fused codegen loop instead of interpreted lambda frames). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native Catalyst cosine (graft.functions.CosineSimilarity); requires
    * [[graft.functions.GraftFunctions.register]] on the session, which every
    * operator in this object performs. */
  def cosineNative(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Exact brute-force top-k by cosine against one query vector.
    * One scan + one top-k sort — the correctness baseline.
    * @return (id, cos) ordered by cos desc, id asc (deterministic ties) */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val q = array(query.map(lit): _*)
    df.select(col(idCol).as("id"), cosineNative(col(vecCol), q).as("cos"))
      .orderBy(desc("cos"), asc("id"))
      .limit(k)
  }

  /** Exact k-NN for EVERY row of `queries` against `corpus` by explicit
    * broadcast cartesian — valid ONLY when `corpus` fits in a broadcast
    * (dictionary-sized sides). For the scale path use [[ivfBatchTopK]],
    * which shuffle-joins on IVF cells instead of materializing q×c. */
  def crossTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
                k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = q.crossJoin(broadcast(c))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosineNative(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Random-hyperplane sign sketch: bit i = sign(dot(v, h_i)) where h_i is a
    * deterministic pseudo-random hyperplane derived from (i, dimension index)
    * via xxhash64 parity — reproducible across runs with no stored model.
    * Native fused loop (graft.functions.SignSketch); requires
    * [[graft.functions.GraftFunctions.register]] (every caller here does). */
  def signSketch(vecCol: Column, bits: Int): Column =
    call_function("sign_sketch", vecCol, lit(bits))

  /** Portable HOF formulation of [[signSketch]] — bit-identical by
    * construction (same hash chain, same left-to-right double accumulation);
    * kept as the parity oracle (PlanSpec asserts equality) and for sessions
    * without the registry. Cost: `bits` interpreted lambda passes per row —
    * use [[signSketch]] on hot paths. */
  def signSketchHof(vecCol: Column, bits: Int): Column = {
    val planes = (0 until bits).map { i =>
      // component j of hyperplane i ∈ {-1,+1}: parity of xxhash64(i, j)
      val comp = aggregate(
        zip_with(vecCol, sequence(lit(0), size(vecCol) - 1), (x, j) =>
          x.cast("double") * when(pmod(xxhash64(lit(i), j), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(comp > 0, lit(1L << i)).otherwise(lit(0L))
    }
    planes.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-blocked candidate scoring: ids sharing a sign-sketch band get their
    * exact cosine computed. @return (a, b, cos) with a < b
    *
    * `bandBits = 0` (default) SIZES THE BAND KEY TO THE CORPUS: a band with
    * w bits has only 2^w buckets, so at fixed w the per-bucket occupancy —
    * and with it the candidate-pair count — grows as n²/2^w. (Measured on
    * the 10× embeddings series: at the old fixed w=4, 16 buckets/band held
    * ~1.2k vectors each and the candidate set grew ~32× for 10× input —
    * 0.9 s → 71 s.) Auto mode keeps expected occupancy ~64 by setting
    * w = log2(n/64), i.e. buckets ∝ n and candidates ∝ n — the standard
    * E2LSH-style parameter scaling. Recall: a pair at angle θ still shares
    * a band with probability 1-(1-(1-θ/π)^w)^bands per the usual banding
    * bound — wider bands trade far-pair recall for linear work, while
    * exact/near-exact duplicates (θ≈0) collide in EVERY band at any width. */
  def embeddingLshPairs(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
                        bandBits: Int = 0, nBands: Int = 4, bucketCap: Int = 2000,
                        corpusSize: Option[Long] = None): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val ids = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val w =
      if (bandBits > 0) bandBits
      else {
        // `corpusSize` skips the sizing scan when the caller already knows n
        // — at 100 TB that count() is a full corpus pass per call
        val n = corpusSize.getOrElse(ids.count())
        math.max(4, math.min(60 / nBands,
          math.ceil(math.log(math.max(1.0, n / 64.0)) / math.log(2)).toInt))
      }
    System.err.println(s"[lsh] embeddingLshPairs band width w=$w (nBands=$nBands, " +
      s"${if (bandBits > 0) "fixed" else corpusSize.map(n => s"auto from supplied n=$n").getOrElse("auto from count()")})")
    val bits = nBands * w
    val sk = ids.withColumn("sketch", signSketch(col("v"), bits)).persist()
    val bandKeys = (0 until nBands).map { b =>
      shiftrightunsigned(col("sketch"), b * w).bitwiseAND(lit((1L << w) - 1))
    }
    val bands = sk.select(col("id"), posexplode(array(bandKeys: _*))).toDF("id", "band", "key")
    val capped = bands
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
      .filter(col("sz") <= bucketCap).drop("sz")
    // explicit defaultParallelism-wide dedup exchange (reused by
    // dropDuplicates): candidate rows are 16 bytes but each pays an
    // O(dim) cosine downstream — AQE's byte-based coalescing would
    // serialize the scoring stage (see TextSim.candidatePairs)
    val cand = capped.as("l").join(capped.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .repartition(spark.sparkContext.defaultParallelism, col("a"), col("b"))
      .dropDuplicates("a", "b")
    // eager checkpoint of the (small, banded+capped) verified pair set, then
    // RELEASE the sketch cache — a lazily returned frame would leave sk
    // persisted for the session lifetime, evicting other users' blocks
    val out = cand
      .join(sk.select(col("id").as("a"), col("v").as("va")), Seq("a"))
      .join(sk.select(col("id").as("b"), col("v").as("vb")), Seq("b"))
      .select(col("a"), col("b"), cosineNative(col("va"), col("vb")).as("cos"))
      .localCheckpoint(true)
    sk.unpersist()
    out
  }

  /** The nProbe nearest centroid indices for a vector column, via the native
    * `ivf_cells` expression: the whole k×dim centroid matrix enters the plan
    * as ONE foldable literal that is evaluated once into a JVM kernel and
    * carried as a codegen reference object — plan size and analysis cost are
    * O(1) in k, so nCentroids can reach the √N cell counts the 100 TB sizing
    * prescribes (10³–10⁴ cells) without Catalyst blowup. Per row: one fused
    * O(k·dim) loop. (This replaces the round-2 `array(struct(lit…))`
    * formulation whose k·dim literal NODES capped IVF at toy cell counts.) */
  private def nearestCells(vecCol: Column, centroids: Array[Seq[Double]], nProbe: Int): Column =
    call_function("ivf_cells", vecCol, typedLit(centroids.toSeq), lit(nProbe))

  /** Default matrix size (in doubles) above which the ANN family switches
    * from the plan-literal `ivf_cells` to the broadcast-backed
    * `ivf_cells_bcast` — TaskBinaryProbe ledger (BENCH/BASELINE.md): the
    * literal form ships the matrix twice per task binary and every task
    * re-deserializes it (~11.7 s at 10⁴×768); 2²⁰ doubles ≈ 8 MB serialized
    * is where that cost starts to matter. */
  private[ops] val DefaultCentroidBcastThreshold: Long = 1L << 20

  /** [[nearestCells]] with automatic literal-vs-broadcast routing. On the
    * broadcast path the returned (handle, registered function name) pair —
    * None on the literal path — carries the cleanup obligations: eager
    * callers (the k-means iteration loop) drop the registry entry and
    * destroy the broadcast as soon as the action completes; lazy callers
    * force analysis of their final frame (which inlines the bound
    * expression) and drop the registry entry before returning, so the
    * analyzed plan holds the ONLY driver reference and the ContextCleaner
    * can actually reclaim the matrix once the caller drops the frame. */
  private def nearestCellsAuto(spark: SparkSession, vecCol: Column,
      centroids: Array[Seq[Double]], nProbe: Int, bcastThreshold: Long)
      : (Column, Option[(org.apache.spark.broadcast.Broadcast[graft.functions.CentroidMatrix], String)]) = {
    val nDoubles = centroids.length.toLong *
      (if (centroids.isEmpty) 0 else centroids(0).length)
    if (nDoubles < bcastThreshold) (nearestCells(vecCol, centroids, nProbe), None)
    else {
      val bc = spark.sparkContext.broadcast(
        new graft.functions.CentroidMatrix(centroids.map(_.toArray)))
      val fn = graft.functions.GraftFunctions.registerCentroidBcast(spark, bc, nProbe)
      (call_function(fn, vecCol), Some((bc, fn)))
    }
  }

  /** Deterministic distributed k-means (spherical, cosine assignment) for
    * IVF coarse quantization: seeds are a deterministic hash-based sample
    * (xxhash64 of the id — no Random, reproducible across runs and
    * partitionings), then `iters` rounds of assign + mean. Each round is one
    * native-kernel assignment pass (the centroid matrix rides along as a
    * single k·dim-double reference object — broadcast-sized by construction)
    * plus one groupBy(cell) aggregation; vectors never leave executors
    * except the k mean vectors collected per round.
    * @return centroid vectors indexed by cell id (0-based) */
  /** @param trainCap 0 = train on the full frame (exact current semantics —
    *        the oracle-checked configuration). > 0 = train on the `trainCap`
    *        lowest-xxhash64(id) rows (a deterministic uniform sample, order-
    *        and partitioning-independent): at 100 TB the per-iteration
    *        assignment scan must NOT touch the full corpus — k-means
    *        converges on a bounded sample and the corpus is assigned ONCE
    *        afterwards (see [[IvfIndex]]). */
  def kMeansCentroids(spark: SparkSession, data: DataFrame, k: Int,
                      iters: Int = 5, trainCap: Long = 0,
                      bcastThreshold: Long = DefaultCentroidBcastThreshold): Array[Seq[Double]] = {
    graft.functions.GraftFunctions.register(spark)
    val train =
      if (trainCap <= 0) data
      else data.withColumn("__h", xxhash64(col("id")))
        .orderBy(col("__h"), col("id")).limit(trainCap.toInt)
        .select(col("id"), col("v")).localCheckpoint(true)
    var centroids: Array[Seq[Double]] = train
      .withColumn("__r", xxhash64(col("id")))
      .orderBy(col("__r"), col("id")).limit(k)
      .select(col("v")).collect()
      .map(r => r.getSeq[Any](0).map(x => x.toString.toDouble))
    // dimension read off the collected seeds — the separate size() probe
    // job it replaces was one more driver round-trip per training call (r06)
    require(centroids.nonEmpty, "kMeansCentroids: empty training set")
    val dim = centroids(0).length
    for (_ <- 0 until iters) {
      val sums = (0 until dim).map(i =>
        sum(element_at(col("v"), i + 1).cast("double")).as(s"s$i"))
      // the matrix CHANGES every iteration — on the broadcast path each
      // round gets its own broadcast, dropped from the registry and
      // destroyed as soon as the (eager) aggregate collects, so k-means
      // never accumulates stale matrices or registry entries
      val (cellCol, bc) = nearestCellsAuto(spark, col("v"), centroids, 1, bcastThreshold)
      val means = train
        .withColumn("cell", element_at(cellCol, 1))
        .groupBy(col("cell")).agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      bc.foreach { case (b, fn) =>
        graft.functions.GraftFunctions.dropCentroidBcast(spark, fn)
        b.destroy()
      }
      // empty cells keep their previous centroid (deterministic)
      val updated = means.map { r =>
        val n = r.getLong(1).toDouble
        (r.getInt(0), (0 until dim).map(i => r.getDouble(i + 2) / n): Seq[Double])
      }.toMap
      centroids = centroids.zipWithIndex.map { case (v, i) => updated.getOrElse(i, v) }
    }
    centroids
  }

  /** IVF-style ANN against one query: assign vectors to nProbe nearest of
    * nCentroids k-means cells, search only those cells. Returns approximate
    * top-k (id, cos). */
  def ivfTopK(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, nCentroids: Int = 16, nProbe: Int = 4,
              kmeansIters: Int = 5, trainCap: Long = 0,
              bcastThreshold: Long = DefaultCentroidBcastThreshold): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val data = df.select(col(idCol).as("id"), col(vecCol).as("v")).localCheckpoint(true)
    val centroids = kMeansCentroids(spark, data, nCentroids, kmeansIters, trainCap,
      bcastThreshold = bcastThreshold)
    // assign: per row, the nProbe centroids with max cosine
    val (cellCol, bc) = nearestCellsAuto(spark, col("v"), centroids, nProbe, bcastThreshold)
    val assigned = data
      .select(col("id"), col("v"), explode(cellCol).as("cell"))
    val q = array(query.map(lit): _*)
    // query probes its own nProbe best cells — same ranking (cos desc,
    // index asc) as the kernel, computed driver-side on the tiny matrix
    val qCells = centroids.zipWithIndex
      .map { case (v, i) => (i, cosSeq(v, query)) }
      .sortBy { case (i, c) => (-c, i) }
      .take(nProbe).map(_._1).toSeq
    val out = assigned.filter(col("cell").isin(qCells: _*))
      .select(col("id"), cosineNative(col("v"), q).as("cos")).distinct()
      .orderBy(desc("cos"), asc("id")).limit(k)
    // resolve now, then drop the registry entry: the analyzed plan becomes
    // the only driver reference to the broadcast, so the ContextCleaner can
    // reclaim the matrix once the caller drops the frame
    bc.foreach { case (_, fn) =>
      out.queryExecution.analyzed
      graft.functions.GraftFunctions.dropCentroidBcast(spark, fn)
    }
    out
  }

  /** Batch k-NN at scale: IVF-blocked instead of cartesian. Corpus vectors
    * are quantized to their single nearest k-means cell; each query probes
    * its `nProbe` nearest cells; candidates meet in a shuffle join
    * co-partitioned on `cell`, are scored with the native cosine, and a
    * per-query window keeps the top k.
    *
    * Cost: |corpus| + |queries|·nProbe rows shuffled on `cell` — never the
    * q×c cartesian that [[crossTopK]] materializes. With
    * `nProbe = nCentroids` every cell is probed, so the result is EXACT
    * (equal to brute force) while still exercising the whole blocked plan —
    * that is the driver-oracle configuration; partial probe is the
    * approximate scale configuration (recall asserted in OpsSpec).
    *
    * At 100 TB: nCentroids grows ~√N (10⁴⁺ cells) — the native-kernel
    * assignment keeps the plan O(1) in k (see [[nearestCells]]), the join
    * key space is wide so AQE's skew split handles lumpy cells, and the
    * centroid matrix stays k·dim doubles in one reference object.
    *
    * @return (qid, id, cos) with rank ≤ k per qid, ties broken by id asc */
  def ivfBatchTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
                   idCol: String, vecCol: String, k: Int,
                   nCentroids: Int = 16, nProbe: Int = 4,
                   kmeansIters: Int = 5, trainCap: Long = 0,
                   bcastThreshold: Long = DefaultCentroidBcastThreshold): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v")).localCheckpoint(true)
    val centroids = kMeansCentroids(spark, c, nCentroids, kmeansIters, trainCap,
      bcastThreshold = bcastThreshold)
    // corpus → exactly one cell (its max-cosine centroid); both sides share
    // ONE broadcast on the large-matrix path (two stages, one fetch/executor)
    val (assignCol, bc) = nearestCellsAuto(spark, col("v"), centroids, 1, bcastThreshold)
    val corpusCells = c.withColumn("cell", element_at(assignCol, 1))
    // queries → their nProbe best cells
    val (probeCol, probeFn) = bc match {
      case Some((b, _)) =>
        val fn = graft.functions.GraftFunctions.registerCentroidBcast(spark, b, nProbe)
        (call_function(fn, col("qv")), Some(fn))
      case None => (nearestCells(col("qv"), centroids, nProbe), None)
    }
    val queryCells = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .select(col("qid"), col("qv"), explode(probeCol).as("cell"))
    val scored = queryCells.join(corpusCells, Seq("cell"))
      .select(col("qid"), col("id"),
        cosineNative(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("id"))
    val out = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"))
    // resolve, then drop both registry entries (assign + probe) — see
    // ivfTopK: the analyzed plan keeps the one live broadcast reference
    bc.foreach { case (_, assignFn) =>
      out.queryExecution.analyzed
      (Seq(assignFn) ++ probeFn).distinct
        .foreach(graft.functions.GraftFunctions.dropCentroidBcast(spark, _))
    }
    out
  }

  private[ops] def cosSeq(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }
}
