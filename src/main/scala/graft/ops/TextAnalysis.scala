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

  /** Quality features + a composite score in [0,1]:
    * length band, mean word length band, alpha ratio, punctuation ratio. */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nTokens = whitespaceTokenCount(t)
    val alphaChars = length(regexp_replace(t, "[^A-Za-zÀ-ÿ]", ""))
    val punctChars = length(regexp_replace(t, "[^.,;:!?]", ""))
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
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "und", "die", "das", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr" -> Seq("le", "et", "la", "les", "est", "des", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "y", "los", "las", "es", "un", "una", "por", "con", "para"),
    "it" -> Seq("il", "e", "di", "che", "per", "della", "sono", "anche", "come", "alla"),
    "pt" -> Seq("o", "os", "as", "um", "uma", "para", "com", "mais", "mas", "seu"),
    "nl" -> Seq("de", "het", "een", "van", "en", "dat", "niet", "met", "voor", "zijn"),
    "sv" -> Seq("och", "att", "det", "som", "en", "är", "av", "för", "den", "till"))

  /** Language ID: count stopword hits per language over word tokens, pick the
    * max (ties: language order above); no hits → "und" (undetermined). */
  def langId(text: Column): Column = {
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
