package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * All are pure `Column` algebra (no UDFs) so they run inside whole-stage
  * codegen — at 100 TB these are scan-side, shuffle-free map operations.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish subword token estimate: alpha runs count ~ per 4 chars,
    * digits and punctuation are one token each (the usual "chars/4" BPE
    * rule of thumb made exact and engine-portable).
    */
  def bpeTokenEstimate(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"))

  /** Small per-language stopword lists for n-gram/stopword language ID.
    * Deliberately tiny and deterministic — the heuristic, not a model.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "un", "una", "en", "por"))

  /** Stopword-overlap score for one language: number of tokens that are in
    * the language's stopword list.
    */
  def langScore(text: Column, lang: String): Column =
    size(array_intersect(tokens(text),
      array(stopwords(lang).map(lit): _*)))
      .cast("int")

  /** Heuristic language ID: argmax of stopword overlap, alphabetical
    * tie-break, "und" (undetermined) when no stopword hits at all.
    */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scores = langs.map(l => langScore(text, l))
    val best = greatest(scores: _*)
    val pick = langs.zip(scores).foldRight(lit("und")) {
      case ((l, s), acc) => when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight means earlier (alphabetical) languages override later ones
    pick
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0d))
      .otherwise(length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", "")) /
        length(text).cast("double"))

  /** Digit character ratio. */
  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0d))
      .otherwise(length(regexp_replace(text, "[^0-9]", "")) /
        length(text).cast("double"))

  /** English stopword ratio over whitespace tokens. */
  def stopwordRatio(text: Column): Column =
    when(tokenCount(text) === 0, lit(0d))
      .otherwise(langScore(text, "en") / tokenCount(text).cast("double"))

  /** Mean whitespace-token length. */
  def meanWordLen(text: Column): Column =
    when(tokenCount(text) === 0, lit(0d))
      .otherwise(length(regexp_replace(text, "\\s+", "")) /
        tokenCount(text).cast("double"))

  /** Composite quality score in [0,1]: rewards mid-length documents with
    * word-like tokens and some stopwords; punishes digit/punct walls.
    * Deterministic and engine-portable (same formula runs in any SQL).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50d, lit(1d))
    val wordScore = when(meanWordLen(text).between(3d, 10d), 1d).otherwise(0.5)
    val stopScore = least(stopwordRatio(text) * 4d, lit(1d))
    val penalty = punctRatio(text) + digitRatio(text)
    greatest(lit(0d), least(lit(1d),
      lenScore * 0.3 + wordScore * 0.3 + stopScore * 0.4 - penalty))
  }

  /** Polynomial rolling-hash document fingerprint over the raw characters:
    * `h = fold(h * 31 + codepoint) mod 1e9+7`. Computed by the codegen
    * `RollingHash` Catalyst expression — one primitive-typed pass per row
    * inside whole-stage codegen (the HOF spelling was CodegenFallback,
    * interpreted per character). Portable: any engine with a list-reduce
    * reproduces it bit-for-bit (int64 arithmetic only; (1e9+6)*31+cp never
    * overflows a long).
    */
  def fingerprintExpr(textCol: String): Column =
    graft.expr.VectorExprs.rolling_hash(col(textCol))

  /** Full analysis frame over a documents table. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_bpe_tokens", bpeTokenEstimate(t))
      .withColumn("pred_lang", langId(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("digit_ratio", digitRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprintExpr(textCol))
  }
}
