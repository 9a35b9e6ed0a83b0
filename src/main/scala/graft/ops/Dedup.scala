package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines, over any
  * (id, text) shaped input. All variants are expressed with codegen'd Spark
  * SQL functions; the quadratic stages only ever run inside LSH buckets or
  * candidate pair sets, never on the full corpus.
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct text, keeping the
    * smallest id (deterministic winner). The groupBy key is md5(text), so
    * hot/duplicate-heavy content spreads by hash — no skew on the id. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("copies"))

  /** Canonical-text fingerprint (lower-case, collapsed whitespace, md5) —
    * catches trivially-reformatted duplicates. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      md5(regexp_replace(trim(lower(col(textCol))), "\\s+", " ")).as("fingerprint"))

  /** Winnowing fingerprints (document fingerprinting, the MOSS scheme):
    * hash every char k-gram of the normalized text, slide a window of
    * `window` consecutive gram hashes, keep each window's MINIMUM —
    * guaranteeing any shared substring of length ≥ k+window-1 contributes
    * a shared fingerprint, while local edits only perturb nearby windows.
    * One row per distinct (id, fingerprint).
    *
    * Two hash modes (guarantee-equivalent — same gram positions, same
    * window minima, only the hash differs; parity asserted in OpsSpec):
    *  - `rolling = false` (oracle mode): md5-hex grams, lexicographic
    *    minima — reproducible in ANSI SQL, so the operator is
    *    DuckDB-oracle-checkable end-to-end. Hashing is O(n·k) with a
    *    32-char hex allocation per gram.
    *  - `rolling = true` (corpus-scale mode): a TRUE polynomial rolling
    *    hash via the native `winnow_fingerprints` kernel — one multiply-add
    *    per byte (O(n)), long fingerprints, window minima by monotonic
    *    deque, distinct-per-row inside the kernel. No shuffle at all when
    *    ids are unique (the (id, fingerprint) rows come out distinct).
    *
    * All array work happens INSIDE the row (no per-gram explode): in md5
    * mode the only shuffle is the final distinct, over the winnowed (small)
    * fingerprint set. */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 8, window: Int = 4,
                            rolling: Boolean = false): DataFrame = {
    val nt = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    if (rolling) {
      graft.functions.GraftFunctions.register(df.sparkSession)
      df.select(col(idCol).as("id"),
        explode(call_function("winnow_fingerprints", nt, lit(k), lit(window)))
          .as("fingerprint"))
    } else {
      val nGrams = greatest(length(nt) - (k - 1), lit(0))
      val gramHashes = transform(sequence(lit(1), nGrams), i => md5(nt.substr(i, lit(k))))
      // The gram array MUST be materialized behind a barrier before the
      // window pass: CollapseProject inlines a once-referenced alias into
      // the per-window lambda regardless of cost, so without the barrier
      // each of the ~n windows re-evaluates the whole O(n·k) md5 transform
      // — O(n²·k) interpreted evaluations per document. Measured: 721 s for
      // 500 × 300-char docs inlined vs ~2 s materialized (this single query
      // is what pushed the r3 driver Verify leg past its timeout).
      val grams = df.filter(nGrams >= window)
        .select(col(idCol).as("id"), gramHashes.as("gh"))
        .localCheckpoint(true)
      val mins = transform(sequence(lit(1), greatest(size(col("gh")) - (window - 1), lit(0))),
        j => array_min(slice(col("gh"), j, lit(window))))
      grams.select(col("id"), explode(array_distinct(mins)).as("fingerprint"))
        .distinct()
    }
  }

  /** MinHash-LSH near-duplicate pairs over character shingles:
    * shingle-set array → minhash signature (in-row kernel) → banded LSH
    * buckets → bucket-local pairs → exact Jaccard verification on the
    * candidates only (in-row sorted-merge kernel).
    *
    * The corpus token set stays inside its row end-to-end: the only
    * shuffles are the (4 rows/doc) band frame, the capped bucket self-join,
    * and the candidate↔doc-set joins — O(docs + candidates) rows, never
    * O(candidates × tokens/doc). Output is bit-identical to the r3 exploded
    * formulation (hash parity asserted in SetSketchParitySpec).
    * @return DataFrame(a, b, jaccard) with jaccard >= threshold, a < b */
  def minHashNearDupPairs(spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
                          shingleSize: Int = 5, numHashes: Int = 16, rowsPerBand: Int = 4,
                          threshold: Double = 0.7, bucketCap: Int = 1000): DataFrame = {
    // eager checkpoint, not lazy persist: the signature and verification
    // branches consume the shingle sets concurrently in a cold run, and
    // racing consumers duplicate the computation before a lazy cache lands
    val sets = TextSim.charShingleArrays(df, idCol, textCol, shingleSize).localCheckpoint(true)
    val sig = TextSim.minHashSignaturesFromSets(sets, numHashes)
    val cand = TextSim.candidatePairs(TextSim.lshBands(sig, numHashes, rowsPerBand), bucketCap)
    TextSim.jaccardOnPairSets(cand, sets).filter(col("jaccard") >= threshold)
  }

  /** Exact Jaccard over shingle sets for given candidate pairs. */
  def jaccardOnPairs(pairs: DataFrame, shingles: DataFrame): DataFrame = {
    val sizes = shingles.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(shingles.select(col("id").as("a"), col("token")), Seq("a"))
      .join(shingles.select(col("id").as("b"), col("token")), Seq("b", "token"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("both"))
    inter
      .join(sizes.select(col("id").as("a"), col("sz").as("sa")), Seq("a"))
      .join(sizes.select(col("id").as("b"), col("sz").as("sb")), Seq("b"))
      .select(col("a"), col("b"),
        (col("both") / (col("sa") + col("sb") - col("both"))).as("jaccard"))
  }

  /** Lower-cased word tokens per document `(id, w: array<string>)` — the ONE
    * corpus text scan the word-token family (simhash, word n-grams) shares;
    * [[simHashVerifiedPairs]] checkpoints it once so its two sketch families
    * never re-read the raw text. */
  private[graft] def wordTokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => length(t) > 0).as("w"))

  private def ngramsFromWords(words: DataFrame, n: Int): DataFrame =
    words.filter(size(col("w")) >= n).select(col("id"),
        explode(transform(sequence(lit(0), size(col("w")) - n),
          i => concat_ws(" ", slice(col("w"), i + 1, lit(n))))).as("token"))
      .distinct()

  /** Per-doc sorted distinct word n-gram SET as one in-row array — same
    * grams as [[ngramsFromWords]], kept in-row so the n-gram near-dup family
    * never shuffles the gram set.
    *
    * `hashed = true` (the corpus-scale default) stores each gram as its
    * xxhash64 long — `(id, sh: array<long>)`, 8 bytes/gram instead of a
    * ~20-30 byte string through two checkpoints and the verification joins,
    * and the downstream minhash kernel hashes 8-byte longs instead of long
    * strings. Set SIZES (and therefore exact-Jaccard values) are preserved
    * absent 64-bit collisions within one document's gram set (~g²/2⁶⁵ —
    * the same already-accepted semantics as the char-shingle family, which
    * hashes shingles to longs immediately). Candidate SETS differ from the
    * string formulation (different minhash values), covered by the corpus
    * recall margin (DedupRecallSpec guards it in-repo); exact-Jaccard
    * values are parity-tested in SetSketchParitySpec.
    * `hashed = false` keeps `(id, sh: array<string>)` for parity tests. */
  private[graft] def ngramArraysFromWords(words: DataFrame, n: Int,
                                          hashed: Boolean = true): DataFrame = {
    if (hashed) {
      // r06: fused native kernel (one loop per row) instead of the
      // interpreted transform+slice+concat_ws+xxhash64 HOF chain; output is
      // bit-identical (TokenSetParitySpec asserts it against the string
      // formulation below + explicit xxhash64 mapping).
      graft.functions.GraftFunctions.register(words.sparkSession)
      words.filter(size(col("w")) >= n)
        .select(col("id"), call_function("ngram_hash_set", col("w"), lit(n)).as("sh"))
    } else {
      val grams = transform(sequence(lit(0), size(col("w")) - n),
        i => concat_ws(" ", slice(col("w"), i + 1, lit(n))))
      words.filter(size(col("w")) >= n)
        .select(col("id"), array_sort(array_distinct(grams)).as("sh"))
    }
  }

  /** Exploded distinct word n-grams: (id, token). */
  def wordNgrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    ngramsFromWords(wordTokens(df, idCol, textCol), n)

  /** Word n-gram Jaccard near-dup pairs — same machinery, token shingles. */
  def ngramJaccardPairs(spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
                        threshold: Double = 0.5, bucketCap: Int = 1000): DataFrame = {
    val sets = ngramArraysFromWords(wordTokens(df, idCol, textCol), n).localCheckpoint(true)
    val sig = TextSim.minHashSignaturesFromSets(sets, numHashes)
    val cand = TextSim.candidatePairs(TextSim.lshBands(sig, numHashes, rowsPerBand), bucketCap)
    TextSim.jaccardOnPairSets(cand, sets).filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash per document: sign-sum of per-token hash bits weighted by
    * token frequency — near-dups have small Hamming distance. Computed by the
    * native in-row `simhash64` kernel (one pass over the word array, no
    * explode, no shuffle); bit-identical to the exploded 64-way
    * conditional-aggregation formulation ([[simHashFromWordsExploded]], kept
    * as the parity reference — SetSketchParitySpec). Tokenless docs are
    * dropped, matching the exploded groupBy. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simHashFromWords(wordTokens(df, idCol, textCol))

  private def simHashFromWords(words: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(words.sparkSession)
    words.filter(size(col("w")) > 0)
      .select(col("id"), call_function("simhash64", col("w")).as("simhash"))
  }

  private[graft] def simHashFromWordsExploded(words: DataFrame): DataFrame = {
    val tok = words.select(col("id"), explode(col("w")).as("token"))
    val hashed = tok.withColumn("h", xxhash64(col("token")))
    val bitSums = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = hashed.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs: block on 16-bit bands of the simhash (a pair
    * within Hamming distance 3 shares at least one of 4 bands), then verify
    * with exact Hamming distance via bit_count(xor). */
  def simHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val sh = simHash(df, idCol, textCol).localCheckpoint(true)
    val bandKeys = (0 until 4).map { b =>
      shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))
    }
    val bands = sh.select(col("id"), posexplode(array(bandKeys: _*))).toDF("id", "band", "key")
    val cand = TextSim.candidatePairs(bands)
    cand
      .join(sh.select(col("id").as("a"), col("simhash").as("ha")), Seq("a"))
      .join(sh.select(col("id").as("b"), col("simhash").as("hb")), Seq("b"))
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** SimHash-blocked near-dup pairs with EXACT verification: candidates come
    * from 16-bit simhash bands (a pair within Hamming 3 is GUARANTEED to
    * share a band — pigeonhole) UNIONED with MinHash-LSH bands over the same
    * word n-grams (short documents put genuinely near-identical pairs at
    * Hamming 5-12, beyond any scalable simhash banding — the second sketch
    * family recovers them). The final predicate is exact word n-gram
    * Jaccard ≥ threshold computed on the candidates only, so the output is
    * defined by a reproducible exact metric (oracle-checkable); the
    * sketches only decide which pairs get scored. Both blockers are banded
    * + bucket-capped — scale-safe, never all-pairs.
    *
    * The raw corpus text is scanned ONCE: both sketch families (simhash
    * word tokens and word n-grams) derive from the same checkpointed
    * [[wordTokens]] frame — the round-2 formulation paid the dominant text
    * scan twice. */
  def simHashVerifiedPairs(spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
                           n: Int = 3, threshold: Double = 0.8,
                           numHashes: Int = 16, rowsPerBand: Int = 2,
                           bucketCap: Int = 1000): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // BOTH sketch columns (simhash + hashed n-gram set) come out of ONE
    // pass over the corpus text and land in ONE eager checkpoint — r06:
    // the previous formulation checkpointed words, simhashes and grams
    // separately (three materialization jobs, two of them re-reading the
    // words frame; the kernels made the sketch math cheap enough that the
    // extra materializations dominated the stage).
    val sketches = wordTokens(df, idCol, textCol)
      .filter(size(col("w")) > 0)
      .select(col("id"),
        call_function("simhash64", col("w")).as("simhash"),
        when(size(col("w")) >= n, call_function("ngram_hash_set", col("w"), lit(n))).as("sh"))
      .localCheckpoint(true)
    val bandKeys = (0 until 4).map { b =>
      shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))
    }
    val simBands = sketches.select(col("id"), posexplode(array(bandKeys: _*))).toDF("id", "band", "key")
    val grams = sketches.filter(col("sh").isNotNull).select(col("id"), col("sh"))
    val sig = TextSim.minHashSignaturesFromSets(grams, numHashes)
    // BOTH blocker families feed ONE band frame (minhash band ids offset
    // past the 4 simhash bands so buckets stay family-disjoint) and ONE
    // candidatePairs chain — r06 (2): the per-family chains each paid a
    // bucket-cap window, a bucket self-join and a dedup exchange, plus a
    // third exchange for the cross-family union; the fused frame pays each
    // once. Candidate set is IDENTICAL: buckets are keyed (band, key), the
    // band-id spaces are disjoint, so per-bucket caps and pair generation
    // are unchanged and candidatePairs' trailing dropDuplicates is exactly
    // the old cross-family dedup. Same hub-bucket cap as every blocker: a
    // degenerate band key shared by millions of docs must not go quadratic.
    val minBands = TextSim.lshBands(sig, numHashes, rowsPerBand)
      .select(col("id"), (col("band") + 4).as("band"), col("key"))
    val cand = TextSim.candidatePairs(simBands.union(minBands), bucketCap)
    TextSim.jaccardOnPairSets(cand, grams).filter(col("jaccard") >= threshold)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold over LSH buckets
    * from random-hyperplane signs (see Similarity.embeddingLshPairs). */
  def embeddingNearDupPairs(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double = 0.98, corpusSize: Option[Long] = None): DataFrame =
    Similarity.embeddingLshPairs(spark, df, idCol, vecCol, corpusSize = corpusSize)
      .filter(col("cos") >= threshold)
}
