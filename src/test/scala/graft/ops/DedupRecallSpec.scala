package graft.ops

import graft.SparkTestBase

/** In-repo guard for the corpus-specific recall assumption behind the
  * driver-oracle equality of `q_dedup_minhash_pairs` / `q_dedup_cc_groups`
  * (r3 ADVICE): those queries equate LSH-banded MinHash CANDIDATES with the
  * DuckDB exact cross-join pair set at Jaccard ≥ 0.7, which holds only
  * because every true pair in the synthetic corpus sits well above the
  * threshold (j ≥ 0.9 ⇒ per-pair miss probability (1-j⁴)⁴ < 2e-6). If a
  * future corpus or parameter change breaks full recall, THIS test fails in
  * `sbt test` — loudly, with the missed pairs — instead of surfacing only as
  * an opaque driver-side hash mismatch. */
class DedupRecallSpec extends SparkTestBase {

  test("minhash LSH candidates cover every exact >=0.7 pair on the oracle corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    // same parameters as Dedup.minHashNearDupPairs defaults (and the driver query)
    val sh = TextSim.charShingles(docs, "doc_id", "text", n = 5).localCheckpoint(true)
    val sig = TextSim.minHashSignatures(sh, 16)
    val cand = TextSim.candidatePairs(TextSim.lshBands(sig, 16, rowsPerBand = 4), 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // exact ≥0.7 ground truth, brute-forced driver-side (500 docs)
    val sets: Map[Long, Set[Long]] = sh.collect()
      .groupBy(_.getLong(0)).map { case (id, rows) => id -> rows.map(_.getLong(1)).toSet }
    val ids = sets.keys.toArray.sorted
    val exact = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (sets(a) & sets(b)).size
      if inter > 0
      jac = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if jac >= 0.7
    } yield (a, b)).toSet

    assert(exact.nonEmpty, "vacuous corpus: no exact near-dup pairs at all")
    val missed = exact -- cand
    assert(missed.isEmpty,
      s"LSH candidates miss ${missed.size} exact pairs (corpus recall assumption broken): " +
        missed.take(10).mkString(", "))
  }

  test("hashed-gram minhash candidates cover every exact >=0.5 word-3-gram pair") {
    // guards q_dedup_ngram_pairs / q_dedup_simhash_pairs after the
    // hashed-gram switch: grams are stored as xxhash64 longs, so the minhash
    // values (and hence the LSH candidate set) differ from the string
    // formulation — full recall on the oracle corpus must still hold at the
    // driver's 8-bands-of-2 parameters (j ≥ 0.9 ⇒ miss prob (1-j²)⁸ < 2e-6)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val words = Dedup.wordTokens(docs, "doc_id", "text")
    val sets = Dedup.ngramArraysFromWords(words, 3).localCheckpoint(true)
    val sig = TextSim.minHashSignaturesFromSets(sets, 16)
    val cand = TextSim.candidatePairs(TextSim.lshBands(sig, 16, rowsPerBand = 2), 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // exact ≥0.5 ground truth over the STRING gram sets (the oracle's world)
    val strSets: Map[Long, Set[String]] =
      Dedup.ngramArraysFromWords(words, 3, hashed = false).collect()
        .groupBy(_.getLong(0)).map { case (id, rows) =>
          id -> rows.flatMap(_.getSeq[String](1)).toSet
        }
    val ids = strSets.keys.toArray.sorted
    val exact = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (strSets(a) & strSets(b)).size
      if inter > 0
      jac = inter.toDouble / (strSets(a).size + strSets(b).size - inter)
      if jac >= 0.5
    } yield (a, b)).toSet

    assert(exact.nonEmpty, "vacuous corpus: no exact n-gram near-dup pairs at all")
    val missed = exact -- cand
    assert(missed.isEmpty,
      s"hashed-gram LSH candidates miss ${missed.size} exact pairs: " +
        missed.take(10).mkString(", "))
  }
}
