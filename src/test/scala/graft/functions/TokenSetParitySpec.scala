package graft.functions

import graft.SparkTestBase
import graft.ops.{Dedup, TextAnalysis, TextSim}
import org.apache.spark.sql.functions._

/** Bit-parity of the r06 token-set kernels against the HOF formulations
  * they replaced — same xxhash64 values, same sorted-distinct ordering,
  * same clamped-window/short-input edge cases, same tie-breaking. */
class TokenSetParitySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val texts = Seq(
    (1L, "The quick brown fox jumps over the lazy dog and that was it for the day."),
    (2L, "der hund und die katze sind nicht auf das dach mit sich"),
    (3L, ""), // empty
    (4L, "ab"), // shorter than shingle width
    (5L, "aaaaa aaaaa aaaaa"), // heavy duplicate shingles
    (6L, "héllo wörld — naïve façade über alles à-la-carte ÿ"), // multibyte
    (7L, "    leading and trailing whitespace   "),
    (8L, "le la les est pour the and of den till och att"), // cross-language tie material
    (9L, "日本語テキスト with mixed 漢字 and ascii"), // non-latin multibyte
    (10L, "a b c d e f g h i j k l m n o p q r s t u v w x y z")
  ).toDF("doc_id", "text")

  test("shingle_set kernel matches the HOF charShingleArrays formulation") {
    graft.functions.GraftFunctions.register(spark)
    for (n <- Seq(2, 5, 8)) {
      val kernel = TextSim.charShingleArrays(texts, "doc_id", "text", n)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val hof = TextSim.charShingleArraysHof(texts, "doc_id", "text", n)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(kernel.keySet == hof.keySet)
      kernel.foreach { case (id, ks) =>
        assert(ks == hof(id), s"shingle_set mismatch for doc $id at n=$n")
      }
    }
  }

  test("ngram_hash_set kernel matches the string-gram formulation + xxhash64") {
    graft.functions.GraftFunctions.register(spark)
    val words = texts.select(col("doc_id").as("id"),
      filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0).as("w"))
    for (n <- Seq(2, 3)) {
      val kernel = Dedup.ngramArraysFromWords(words, n, hashed = true)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val viaStrings = Dedup.ngramArraysFromWords(words, n, hashed = false)
        .select(col("id"), array_sort(array_distinct(transform(col("sh"), g => xxhash64(g)))).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(kernel.keySet == viaStrings.keySet)
      kernel.foreach { case (id, ks) =>
        assert(ks == viaStrings(id), s"ngram_hash_set mismatch for doc $id at n=$n")
      }
    }
  }

  test("lang_id_words kernel matches the HOF marker-count CASE chain") {
    graft.functions.GraftFunctions.register(spark)
    val kernel = texts.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val hof = texts.select(col("doc_id"), TextAnalysis.langIdHof(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kernel == hof)
    assert(kernel(3L) == "und") // no words at all
  }

  test("count_nonempty matches size(filter(length > 0)) incl. whitespace edges") {
    graft.functions.GraftFunctions.register(spark)
    val kernel = texts.select(col("doc_id"),
        call_function("count_nonempty", split(col("text"), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hof = texts.select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), x => length(x) > 0)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kernel == hof)
  }

  test("qualityFeatures translate-based counts match the regexp_replace formulation") {
    val q = TextAnalysis.qualityFeatures(texts, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // independent recomputation with the OLD regex formulation
    val old = texts.select(col("doc_id"),
        length(regexp_replace(col("text"), "[^A-Za-zÀ-ÿ]", "")).as("alpha"),
        length(regexp_replace(col("text"), "[^.,;:!?]", "")).as("punct"),
        length(col("text")).as("nc"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    old.foreach { case (id, (alpha, punct, nc)) =>
      val row = q(id)
      val ar = row.getAs[Double]("alpha_ratio")
      val pr = row.getAs[Double]("punct_ratio")
      val expAr = if (nc > 0) BigDecimal(alpha.toDouble / nc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0
      val expPr = if (nc > 0) BigDecimal(punct.toDouble / nc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0
      assert(math.abs(ar - expAr) < 1e-9, s"alpha_ratio mismatch doc $id: $ar vs $expAr")
      assert(math.abs(pr - expPr) < 1e-9, s"punct_ratio mismatch doc $id: $pr vs $expPr")
    }
  }
}
