package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star / small-star
  * join rounds (the classic map-reduce CC algorithm; converges in
  * O(log²ⁿ) rounds, each round a join + aggregation — no GraphFrames
  * dependency). Used for entity canonicalization (merging alias clusters)
  * and near-duplicate grouping.
  *
  * Scale notes: every round is a `groupBy(u).min` + equi-join — both shuffle
  * on the node id, so hub nodes (celebrity entities) hash-spread across
  * partitions; `localCheckpoint` per round truncates the growing lineage so
  * plans stay constant-size regardless of iteration count.
  */
object ConnectedComponents {

  /** @param edges DataFrame with two string columns (src, dst)
    * @param localThreshold edge sets at or below this size are solved with a
    *        driver-side union-find instead of iterative distributed rounds —
    *        broadcast-scale graphs (alias clusters, dedup groups) would
    *        otherwise pay 8-12 tiny Spark jobs of pure scheduling latency.
    *        The distributed small-star/large-star path engages above it.
    * @param localThresholdBytes byte bound on the driver fallback: edge COUNT
    *        alone is not a safe gate (1M edges of fat IRIs can be GBs), so
    *        the local path additionally requires the measured id payload
    *        (2 bytes/char UTF-16) to fit under this cap. Both the count and
    *        the byte estimate come from the one aggregate over the
    *        checkpointed symmetrized edges — no extra scan.
    * @return DataFrame(node, component) — component is the minimum node id
    *         (ordered lexicographically) of the node's component. Nodes with
    *         no edges are their own component and are NOT emitted (callers
    *         left-join and coalesce to self). */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 50,
          localThreshold: Long = 1000000L,
          localThresholdBytes: Long = 64L << 20): DataFrame = {
    import spark.implicits._
    val src = edges.columns(0)
    val dst = edges.columns(1)

    // Symmetric, loop-free edge list. Symmetrization uses explode over both
    // orientations in ONE pass — a self-union of the same plan with swapped
    // aliases would both scan twice and trip Catalyst's union constraint
    // rewriting (duplicate attribute ids across branches).
    def symmetrize(g: DataFrame): DataFrame =
      g.select(explode(array(
          struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .filter($"u" =!= $"v")
        .distinct()

    // Gate the driver fallback on the RAW loop-free edges (r06): the local
    // union-find is insensitive to duplicates and orientation, so small
    // graphs skip the symmetrize-distinct SHUFFLE entirely — the raw
    // checkpoint is a narrow map job. The symmetrized count/chars are
    // bounded by 2× the raw values, so gating on the doubled raw stats is
    // conservative: never local where the old gate wasn't.
    val raw = edges.select(col(src).as("u"), col(dst).as("v"))
      .filter($"u" =!= $"v")
      .localCheckpoint(true)
    val (rawCount, rawChars) = raw
      .select(count(lit(1)), coalesce(sum(length($"u") + length($"v")), lit(0L)))
      .as[(Long, Long)].first()
    if (solveLocally(rawCount * 2, rawChars * 2, localThreshold, localThresholdBytes))
      return localUnionFind(spark, raw)

    var e = symmetrize(raw).localCheckpoint(true)

    def largeStar(g: DataFrame): DataFrame = {
      val sym = symmetrize(g)
      val m = sym.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"mn", $"u").as("m"))
      sym.join(m, "u")
        .filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .filter($"u" =!= $"v")
        .distinct()
    }

    def smallStar(g: DataFrame): DataFrame = {
      // after large-star all edges point big → small (u > v)
      val down = g.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
      val m = down.groupBy($"u").agg(min($"v").as("m"))
      down.join(m, "u")
        .select($"v".as("u"), $"m".as("v"))
        .union(m.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v")
        .distinct()
    }

    var converged = false
    var iter = 0
    var sig = checksum(e)
    while (!converged && iter < maxIter) {
      iter += 1
      e = smallStar(largeStar(e)).localCheckpoint(true)
      val s = checksum(e)
      converged = s == sig
      sig = s
    }
    // fixed point is a star graph: (node, componentMin)
    e.select(explode(array(
        struct($"u".as("node"), $"v".as("component")),
        struct($"v".as("node"), $"v".as("component")))).as("x"))
      .select($"x.node".as("node"), $"x.component".as("component"))
      .groupBy($"node").agg(min($"component").as("component"))
  }

  /** Driver-fallback decision: small edge COUNT and small id PAYLOAD (chars
    * ×2 for UTF-16, ×2 again for union-find map overhead). Pure — unit
    * tested directly. */
  private[ops] def solveLocally(edgeCount: Long, idChars: Long,
                                maxEdges: Long, maxBytes: Long): Boolean =
    edgeCount <= maxEdges && idChars * 4 <= maxBytes

  /** Exact union-find on the driver for broadcast-scale edge sets. */
  private def localUnionFind(spark: SparkSession, e: DataFrame): DataFrame = {
    import spark.implicits._
    val pairs = e.as[(String, String)].collect()
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
    }
    parent.keys.toSeq.map(n => (n, find(n))).toDF("node", "component")
  }

  /** Convergence signature: count + xor + SUM of row hashes. Xor alone
    * cancels pairwise (an even number of changed rows with matching hashes
    * could fake a fixpoint); the wrapping sum breaks that cancellation —
    * a false positive now needs a simultaneous xor- and sum-collision. */
  private def checksum(df: DataFrame): (Long, Long, BigDecimal) = {
    import df.sparkSession.implicits._
    val h = xxhash64(col("u"), col("v"))
    df.select(
      count(lit(1)),
      coalesce(bit_xor(h), lit(0L)),
      // decimal sum: exact and overflow-free under ANSI mode (a plain long
      // sum of 64-bit hashes throws ArithmeticException at two rows)
      coalesce(sum(h.cast("decimal(38,0)")), lit(BigDecimal(0)))
    ).as[(Long, Long, BigDecimal)].first()
  }
}
