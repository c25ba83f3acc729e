package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, and document fingerprinting.
  *
  * Everything is built from codegen'd string/regex built-ins; ratios divide
  * exact integer counts so outputs are bit-reproducible across engines.
  */
object TextAnalysis {

  /** Whitespace-delimited token count (regex \S+ runs — robust to leading/
    * trailing/repeated whitespace). */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish subword token count: splits words into runs of letters,
    * digits, or single punctuation, the usual pre-tokenization shape. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Per-document stats frame: counts + exact-ratio quality features.
    * All counts come from ONE scan over the text
    * (graft.functions.TextStats) instead of ~10 independent regex passes —
    * same formulas, the regex versions remain the DuckDB oracle.
    */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val st = col("__st")
    val nChars = st.getField("n_chars")
    val nTokens = st.getField("n_tokens")
    val nAlpha = st.getField("n_alpha")
    val nPunct = st.getField("n_punct")
    val nSpace = st.getField("n_space")
    df.select(col(idCol), call_function("text_stats", col(textCol)).as("__st"))
      .select(col(idCol),
        nChars.as("n_chars"),
        nTokens.as("n_tokens"),
        st.getField("n_subwords").as("n_subwords"),
        nAlpha.as("n_alpha"),
        nPunct.as("n_punct"),
        when(nTokens > 0, (nChars - nSpace).cast("double") / nTokens).as("mean_token_len"),
        when(nChars > 0, nAlpha.cast("double") / nChars).as("alpha_ratio"),
        when(nChars > 0, nPunct.cast("double") / nChars).as("punct_ratio"))
  }

  /** Stopword-list scores used by quality scoring and language ID. */
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  /** Whole-word hit count in one scan (graft.functions.WordHitsExpr) —
    * identical to summing `\b<word>\b` regex counts, which remains the
    * DuckDB oracle formula. Requires GraftFunctions registered (done by
    * GraftSession.prepare). */
  private def hits(text: Column, words: Seq[String]): Column =
    call_function("word_hits", text, array(words.map(lit): _*))

  /** Heuristic quality score in [0,1]: blends length sanity, stopword
    * density and alphabetic ratio — the usual cheap pre-filter before
    * expensive model-based scoring. Deterministic arithmetic on exact
    * counts.
    */
  def qualityScore(text: Column): Column = {
    val nTokens = tokenCount(text).cast("double")
    val nChars = length(text).cast("double")
    val sw = hits(lower(text), stopwords("en")).cast("double")
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    val lenScore = when(nTokens >= 10 && nTokens <= 100000, lit(1.0))
      .otherwise(nTokens / lit(10.0))
    val swScore = when(nTokens > 0, least(sw * lit(4.0) / nTokens, lit(1.0))).otherwise(lit(0.0))
    val alphaScore = when(nChars > 0, alpha / nChars).otherwise(lit(0.0))
    (lenScore + swScore + alphaScore) / lit(3.0)
  }

  /** Heuristic language ID over {en, es, de, fr}: stopword-hit argmax with
    * deterministic tie-break (en > es > de > fr by >= chains), 'und'
    * (undetermined) when no list hits.
    */
  def langId(text: Column): Column = {
    val lo = lower(text)
    val en = hits(lo, stopwords("en"))
    val es = hits(lo, stopwords("es"))
    val de = hits(lo, stopwords("de"))
    val fr = hits(lo, stopwords("fr"))
    when(en === 0 && es === 0 && de === 0 && fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed,
    * trimmed text. Collision-safe enough for dedup keys at 100 TB.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))
}
