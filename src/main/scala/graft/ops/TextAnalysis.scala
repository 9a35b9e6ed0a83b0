package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, n-gram-heuristic language identification, and document
  * fingerprinting. Pure codegen'd column expressions — the hot path stays
  * inside whole-stage codegen, no UDFs.
  */
object TextAnalysis {

  /** BPE-ish token pattern: word pieces, digit runs, or single punctuation. */
  val TokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-zÀ-ÿ0-9\\s]"

  def tokenCount(text: Column): Column = size(regexp_extract_all(text, lit(TokenRe), lit(0)))

  def whitespaceTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** The exact character inventory of the regex class `[A-Za-zÀ-ÿ]`
    * (U+00C0–U+00FF inclusive — × and ÷ included, faithfully), enumerated so
    * `translate` can count set membership without the per-char regex engine
    * + replacement-string allocation of `regexp_replace`. */
  private val alphaSet: String =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('À' to 'ÿ')).mkString
  private val punctSet: String = ".,;:!?"

  /** Quality features + a composite score in [0,1]:
    * length band, mean word length band, alpha ratio, punctuation ratio.
    *
    * r06: the alpha/punct counts are `length(t) - length(translate(t, set,
    * ""))` — `translate` (codegen'd map lookup) deletes exactly the chars
    * the old `regexp_replace(t, "[^set]", "")` KEPT, so the counts are
    * identical without running the regex engine over every char twice and
    * allocating both stripped strings; the whitespace token count runs
    * through the fused `count_nonempty` kernel instead of an interpreted
    * `filter(split(...))` lambda pass. Output equality is pinned by the
    * unchanged q_text_quality DuckDB oracle and OpsSpec. */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val t = col(textCol)
    val nChars = length(t)
    val nTokens = call_function("count_nonempty", split(t, "\\s+"))
    val alphaChars = nChars - length(translate(t, alphaSet, ""))
    val punctChars = nChars - length(translate(t, punctSet, ""))
    val meanWordLen = when(nTokens > 0, nChars.cast("double") / nTokens).otherwise(lit(0.0))
    val alphaRatio = when(nChars > 0, alphaChars.cast("double") / nChars).otherwise(lit(0.0))
    val punctRatio = when(nChars > 0, punctChars.cast("double") / nChars).otherwise(lit(0.0))
    val score =
      (when(nTokens >= 10 && nTokens <= 10000, lit(0.25)).otherwise(lit(0.0)) +
        when(meanWordLen >= 3.0 && meanWordLen <= 12.0, lit(0.25)).otherwise(lit(0.0)) +
        when(alphaRatio >= 0.6, lit(0.25)).otherwise(lit(0.0)) +
        when(punctRatio <= 0.1, lit(0.25)).otherwise(lit(0.0)))
    df.select(col(idCol).as("id"),
      nTokens.as("n_tokens"),
      nChars.as("n_chars"),
      round(meanWordLen, 4).as("mean_word_len"),
      round(alphaRatio, 4).as("alpha_ratio"),
      round(punctRatio, 4).as("punct_ratio"),
      round(score, 2).as("quality_score"))
  }

  /** Marker words per language for the stopword language heuristic. Marker
    * overlap across languages is fine — every language counts its own hits
    * and the max wins (ties: list order). The DuckDB oracle SQL is GENERATED
    * from this table (SparkEntry.langIdOracleSql), so the two sides cannot
    * drift. */
  val langMarkers: Seq[(String, Seq[String])] =
    graft.functions.LangMarkers.table

  /** Language ID via the fused `lang_id_words` kernel (one pass over the
    * word array instead of 8 interpreted `filter` marker scans — r06;
    * parity with [[langIdHof]] asserted in TokenSetParitySpec). Requires
    * [[graft.functions.GraftFunctions.register]] on the session — callers
    * with a DataFrame in hand use [[langIdFor]]. */
  def langId(text: Column): Column =
    call_function("lang_id_words",
      split(lower(text), "[^a-zà-ÿ]+"))

  /** [[langId]] with the session registration handled from the frame. */
  def langIdFor(df: DataFrame, text: Column): Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    langId(text)
  }

  /** Portable higher-order-function formulation of [[langId]] — the
    * kernel's parity oracle: count stopword hits per language over word
    * tokens, pick the max (ties: language order above); no hits → "und". */
  def langIdHof(text: Column): Column = {
    val words = filter(split(lower(text), "[^a-zà-ÿ]+"), w => length(w) > 0)
    val scores = langMarkers.map { case (lang, markers) =>
      val cnt = size(filter(words, w => markers.map(m => w === m).reduce(_ || _)))
      (lang, cnt)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, cnt), acc) =>
      when(cnt > 0 && cnt === best, lit(lang)).otherwise(acc)
    }
  }

  /** Normalized-content fingerprint (lower, collapse whitespace, md5). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))
}
