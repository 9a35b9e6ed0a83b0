package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bit-parity of the in-row set/sketch kernels (minhash_sig,
  * sorted_intersect_count, simhash64 — graft.functions.SetSketchExpressions)
  * against the exploded SQL formulations they replaced. The kernels claim
  * EXACT reproduction of Spark's xxhash64 fold, so every assertion here is
  * equality, not approximation — a Spark hash-implementation change or a
  * kernel seed drift fails loudly in `sbt test`, not as a driver-side
  * candidate-set mismatch.
  */
class SetSketchParitySpec extends SparkTestBase {
  import spark.implicits._

  // deterministic mixed corpus: near-dup clusters, disjoint docs, short docs,
  // punctuation/whitespace noise, and a doc that is a permutation of another
  private lazy val docs = {
    val rnd = new scala.util.Random(20260818L)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november")
    val base = (1L to 30L).map { i =>
      val words = Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "))
    }
    val nearDups = base.take(8).map { case (i, t) =>
      (i + 100L, t.replaceFirst("a", "o") + " extra")
    }
    val oddballs = Seq(
      (201L, "x"), (202L, ""), (203L, "  MIXED Case,   punct!! 42 "),
      (204L, base.head._2.split(" ").reverse.mkString(" ")))
    (base ++ nearDups ++ oddballs).toDF("doc_id", "text")
  }

  test("minhash_sig over char-shingle arrays == exploded minHashSignatures (long tokens)") {
    val exploded = TextSim.minHashSignatures(
      TextSim.charShingles(docs, "doc_id", "text", 5), 16)
    val inRow = TextSim.minHashSignaturesFromSets(
      TextSim.charShingleArrays(docs, "doc_id", "text", 5), 16)
    assert(exploded.except(inRow).isEmpty && inRow.except(exploded).isEmpty)
    assert(inRow.count() == docs.count()) // arrays path keeps every doc
  }

  test("minhash_sig over word-ngram arrays == exploded minHashSignatures (string tokens)") {
    val words = Dedup.wordTokens(docs, "doc_id", "text")
    val exploded = TextSim.minHashSignatures(Dedup.wordNgrams(docs, "doc_id", "text", 3), 16)
    val inRow = TextSim.minHashSignaturesFromSets(
      Dedup.ngramArraysFromWords(words, 3, hashed = false), 16)
    assert(exploded.except(inRow).isEmpty && inRow.except(exploded).isEmpty)
  }

  test("hashed gram sets preserve exact-Jaccard values (long vs string grams)") {
    // hashed = true stores xxhash64(gram) longs — candidate sets may differ
    // (different minhash values; recall guarded by DedupRecallSpec) but the
    // exact-Jaccard VALUE on any given pair must be identical, because set
    // sizes and intersections survive a collision-free hash
    val words = Dedup.wordTokens(docs, "doc_id", "text")
    val strSets = Dedup.ngramArraysFromWords(words, 3, hashed = false)
    val hashSets = Dedup.ngramArraysFromWords(words, 3, hashed = true)
    val ids = strSets.select(col("id"))
    val allPairs = ids.select(col("id").as("a"))
      .crossJoin(ids.select(col("id").as("b"))).filter(col("a") < col("b"))
    val s = TextSim.jaccardOnPairSets(allPairs, strSets)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val h = TextSim.jaccardOnPairSets(allPairs, hashSets)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(s.keySet == h.keySet)
    s.foreach { case (k, v) => assert(h(k) == v, s"pair $k: ${h(k)} != $v") }
  }

  test("jaccardOnPairSets == exploded jaccardOnPairs on the all-pairs set") {
    val ids = docs.select(col("doc_id").as("id"))
    val allPairs = ids.select(col("id").as("a"))
      .crossJoin(ids.select(col("id").as("b"))).filter(col("a") < col("b"))
    val sh = TextSim.charShingles(docs, "doc_id", "text", 5)
    val sets = TextSim.charShingleArrays(docs, "doc_id", "text", 5)
    val exploded = Dedup.jaccardOnPairs(allPairs, sh)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val inRow = TextSim.jaccardOnPairSets(allPairs, sets)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the exploded inner join drops zero-intersection pairs; the set path
    // reports them as 0.0 — identical on the positive support
    exploded.foreach { case (k, v) => assert(inRow(k) == v, s"pair $k: ${inRow(k)} != $v") }
    inRow.foreach { case (k, v) => if (!exploded.contains(k)) assert(v == 0.0, s"pair $k: $v") }
  }

  test("simhash64 kernel == exploded 64-way conditional aggregation") {
    val words = Dedup.wordTokens(docs, "doc_id", "text")
    val exploded = Dedup.simHashFromWordsExploded(words)
    val inRow = Dedup.simHash(docs, "doc_id", "text")
    assert(exploded.except(inRow).isEmpty && inRow.except(exploded).isEmpty)
    // tokenless docs (202: empty text) are dropped by BOTH formulations
    assert(inRow.filter(col("id") === 202L).isEmpty)
  }

  test("minHashNearDupPairs end-to-end matches the exploded r3 formulation") {
    val sh = TextSim.charShingles(docs, "doc_id", "text", 5)
    val sig = TextSim.minHashSignatures(sh, 16)
    val cand = TextSim.candidatePairs(TextSim.lshBands(sig, 16, 4), 1000)
    val r3Style = Dedup.jaccardOnPairs(cand, sh).filter(col("jaccard") >= 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val now = Dedup.minHashNearDupPairs(spark, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(now == r3Style)
    assert(now.nonEmpty) // the planted near-dups must actually surface
  }

  test("registered SQL surface: null k, null elements and empty arrays are defined, not crashes") {
    graft.functions.GraftFunctions.register(spark)
    // foldable NULL k → analysis-time TypeCheckFailure, not an NPE
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sig(array('a','b'), CAST(NULL AS INT))").collect()
    }
    assert(ex.getMessage.contains("minhash_sig"))
    // empty array → NULL signature (exploded groupBy drops tokenless docs);
    // null elements are skipped, so all-null == empty and mixed == non-null
    val r = spark.sql(
      """SELECT minhash_sig(array_remove(array('x'), 'x'), 4)  AS empty_sig,
                minhash_sig(array(CAST(NULL AS STRING)), 4)    AS allnull_sig,
                minhash_sig(array('a', NULL, 'b'), 4)          AS mixed_sig,
                minhash_sig(array('a', 'b'), 4)                AS plain_sig,
                simhash64(array('a', NULL, 'b'))               AS mixed_sim,
                simhash64(array('a', 'b'))                     AS plain_sim,
                sorted_intersect_count(array(1L, 2L, NULL), array(2L, 3L, NULL)) AS mixed_cnt
      """).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    assert(r.getLong(4) == r.getLong(5))
    assert(r.getLong(6) == 1L)
    // same semantics on long arrays and through a non-codegen (filter) path
    val viaFilter = spark.sql(
      """SELECT id FROM VALUES (1, array(1L, NULL)), (2, array(CAST(NULL AS BIGINT))) AS t(id, a)
         WHERE minhash_sig(a, 2) IS NOT NULL""").collect().map(_.getInt(0)).toSeq
    assert(viaFilter == Seq(1))
  }
}
