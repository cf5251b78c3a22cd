package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  *
  * All are pure `functions._` compositions, built to stay codegen'd: regex
  * split/replace are native expressions; the only lambda HOFs left are the
  * stopword/marker membership filters. Metrics that need the token array
  * accept a precomputed `tokens` column so one split feeds many metrics
  * (Catalyst does not CSE across lambda HOFs — reuse must be explicit).
  */
object TextFunctions {

  /** Whitespace tokens. Blank text ⇒ empty array. Spark's `trim` strips
    * SPACES only, so tab/newline-bounded text makes `split` emit empty edge
    * tokens — `array_remove(_, "")` (native, codegen'd, no lambda) drops
    * them, which also covers the all-whitespace case. This is the ONE
    * tokenization contract: the JVM-side mirror is [[tokensJvm]], and every
    * model-fitting and scoring path must use one of the two so fit and
    * predict can never tokenize differently. */
  def tokens(text: Column): Column =
    array_remove(split(trim(text), "\\s+"), "")

  /** JVM mirror of [[tokens]] for `mapPartitions` scorers (NaiveBayes
    * predict, Unigram encode): same split regex, same empty-drop. Java's
    * `split("\\s+")` never emits trailing empties and only a leading one —
    * filtering "" makes it value-identical to the column version. */
  def tokensJvm(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  /** Word-boundary-marked character n-grams, DISTINCT and SORTED per
    * document — the fastText/CCNet-style language-ID feature set: each
    * whitespace token `w` becomes `_w_` and contributes every n-length
    * substring for each n in `ns`; the per-doc set is deduplicated
    * (binarized/presence features — Metsis et al. 2006's binarized
    * multinomial NB, which is also what makes decision margins robust on
    * short texts) and sorted so fit, predict, and any independent replay
    * enumerate features in one canonical order. JVM-side only, used by
    * both [[graft.operators.NaiveBayes.fitCharGrams]] and
    * `predictCharGrams` — a single implementation, so fit and predict can
    * never featurize differently. Caller lowercases. */
  def charGramsJvm(lowerText: String, ns: Seq[Int]): Array[String] = {
    val out = scala.collection.mutable.SortedSet.empty[String]
    tokensJvm(lowerText).foreach { w =>
      val s = "_" + w + "_"
      ns.foreach { n =>
        var i = 0
        while (i + n <= s.length) { out += s.substring(i, i + n); i += 1 }
      }
    }
    out.toArray
  }

  /** One-pass text statistics struct (n_chars, n_punct, n_letters, n_upper,
    * n_tokens, sum_token_len, stopword_hits) — see
    * [[graft.plans.TextProfileExpr]]. Project it ONCE and derive many
    * metrics from the struct fields; each call is its own pass. */
  def textProfile(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    graft.plans.TextProfileExpr.textProfile(text, stopwords)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    textProfile(text).getField("n_tokens").cast("long")

  /** struct(entropy, n_distinct): Shannon character entropy (bits/char) —
    * the codec-free low-entropy/degenerate-content quality signal. See
    * [[graft.plans.CharEntropyExpr]] for the determinism contract. */
  def charEntropy(text: Column): Column =
    graft.plans.CharEntropyExpr.charEntropy(text)

  /** BPE-ish subword count: letter runs + digit runs + individual symbol
    * chars, each one "token" (a cheap deterministic stand-in for a real
    * tokenizer's count, for per-doc budget accounting). Lookaround-free so
    * the same pattern runs on RE2 engines. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
      .cast("long")

  /** Raw-DEFLATE(level 6) compressed byte count of the UTF-8 text — the
    * real compression-ratio quality signal; see
    * [[graft.plans.DeflateExpr]] for the determinism contract. Ratio =
    * deflateLen / octet_length. */
  def deflateLen(text: Column): Column =
    graft.plans.DeflateLenExpr.deflateLen(text)

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

  /** Over a precomputed LOWERCASE token array. Set membership runs in a
    * native expression (one hash probe per token). */
  def stopwordRatioOf(lowerToks: Column,
      stopwords: Seq[String] = defaultStopwords): Column =
    when(size(lowerToks) === 0, lit(0.0)).otherwise(
      graft.plans.SketchExpressions.countInSet(lowerToks, stopwords).cast("double") /
        size(lowerToks).cast("double"))

  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    stopwordRatioOfProfile(textProfile(text, stopwords))

  /** Per-script character counts (latin/cyrillic/cjk/arabic) in one native
    * pass — multilingual routing and mixed-script spam detection. Counts
    * are codepoint-RANGE-based so a character-class regex reproduces them
    * on any engine; see [[graft.plans.ScriptProfileExpr]]. */
  def scriptProfile(text: Column): Column =
    graft.plans.ScriptProfileExpr.scriptProfile(text)

  /** Blocklist audit over a lowercased token array — C4-style "bad word"
    * filtering: `struct(n_blocked, n_blocked_terms)` = total blocklisted
    * occurrences (native count-in-set pass) and how many DISTINCT blocklist
    * terms appear. The blocklist travels inside the expressions (broadcast
    * by literal), never as a join. */
  def blocklistAudit(lowerToks: Column, blocklist: Seq[String]): Column = {
    require(blocklist.nonEmpty, "blocklist must not be empty")
    struct(
      graft.plans.SketchExpressions.countInSet(lowerToks, blocklist)
        .cast("long").as("n_blocked"),
      // array_intersect already returns distinct elements — no pre-distinct
      size(array_intersect(lowerToks, array(blocklist.map(lit): _*)))
        .cast("long").as("n_blocked_terms"))
  }

  /** Derivations from a projected [[textProfile]] struct. */
  def stopwordRatioOfProfile(p: Column): Column =
    when(p.getField("n_tokens") === 0, lit(0.0)).otherwise(
      p.getField("stopword_hits").cast("double") / p.getField("n_tokens").cast("double"))

  def meanTokenLengthOfProfile(p: Column): Column =
    when(p.getField("n_tokens") === 0, lit(0.0)).otherwise(
      p.getField("sum_token_len").cast("double") / p.getField("n_tokens").cast("double"))

  def qualityScoreOfProfile(p: Column): Column = {
    val n = p.getField("n_chars").cast("double")
    val lenScore = when(n < 10, n / 10.0).when(n > 10000, lit(0.5)).otherwise(lit(1.0))
    val punctScore = when(n > 0 && p.getField("n_punct").cast("double") / n > 0.3, lit(0.0))
      .otherwise(lit(1.0))
    val swScore = when(stopwordRatioOfProfile(p) > 0.05, lit(1.0)).otherwise(lit(0.3))
    val mtl = meanTokenLengthOfProfile(p)
    val wordScore = when(mtl >= 2.5 && mtl <= 12.0, lit(1.0)).otherwise(lit(0.4))
    round(lenScore * 0.25 + punctScore * 0.25 + swScore * 0.25 + wordScore * 0.25, 4)
  }

  /** The required-stopword set of the Gopher quality rules (Rae et al.
    * 2021, appendix A — public paper): a natural-language English document
    * should contain at least 2 of these. */
  val gopherRequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style quality rule struct (Rae et al. 2021, appendix A) — the
    * standard pretraining pre-filter battery, computed in ONE projection
    * over the token array so every metric shares the tokenization:
    *
    *   - `n_words`, `mean_word_len` (rule: 50 ≤ n ≤ 100k, 3 ≤ mean ≤ 10)
    *   - `symbol_ratio`: (`#` chars + `…` chars + literal `...` runs) per
    *     word (rule: < 0.1)
    *   - `alpha_word_frac`: fraction of words containing a latin letter
    *     (rule: > 0.8)
    *   - `n_required_stop`: distinct hits in [[gopherRequiredStopwords]]
    *     (rule: ≥ 2)
    *   - `passes`: the conjunction.
    *
    * The paper's LINE-based rules (bullet-start / ellipsis-end fractions)
    * are omitted: they need a line structure this engine treats as a
    * presentation concern (a caller with multi-line text can explode on
    * `\n` and aggregate the same way). Every field is integer arithmetic or
    * an integer-over-integer division, so the struct is exactly
    * reproducible on any SQL engine — no float accumulation order anywhere.
    * `...` counting uses non-overlapping left-to-right replace semantics,
    * identical across engines. */
  def gopherRules(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val nd = n.cast("double")
    val sumLen = length(concat_ws("", toks))
    val meanLen = when(n === 0, lit(0.0)).otherwise(sumLen.cast("double") / nd)
    val nHash = length(text) - length(replace(text, lit("#"), lit("")))
    val nEllipsisChar = length(text) - length(replace(text, lit("…"), lit("")))
    val nEllipsisRun = (length(text) - length(replace(text, lit("..."), lit("")))) / 3
    val symbolRatio = when(n === 0, lit(0.0)).otherwise(
      (nHash + nEllipsisChar + nEllipsisRun).cast("double") / nd)
    val alphaFrac = when(n === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nd)
    val nStop = size(array_intersect(
      transform(toks, t => lower(t)),
      array(gopherRequiredStopwords.map(lit): _*)))
    struct(
      n.cast("long").as("n_words"),
      meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      alphaFrac.as("alpha_word_frac"),
      nStop.cast("long").as("n_required_stop"),
      (n >= 50 && n <= 100000 && meanLen >= 3.0 && meanLen <= 10.0 &&
        symbolRatio < 0.1 && alphaFrac > 0.8 && nStop >= 2).as("passes"))
  }

  /** Mean token length over a precomputed token array — sum of token lengths
    * is `length(concat_ws("", toks))`, all codegen'd. */
  def meanTokenLengthOf(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      length(concat_ws("", toks)).cast("double") / size(toks).cast("double"))

  def meanTokenLength(text: Column): Column =
    meanTokenLengthOfProfile(textProfile(text))

  /** Composite quality score in [0,1] — the classic cheap pre-filter for web
    * text (length band, low punctuation noise, some stopwords ⇒ natural
    * language, sane mean word length). Weights are fixed so the score is
    * deterministic and oracle-checkable. */
  def qualityScoreOf(text: Column, toks: Column, lowerToks: Column): Column = {
    val n = length(text).cast("double")
    val lenScore = when(n < 10, n / 10.0).when(n > 10000, lit(0.5)).otherwise(lit(1.0))
    val punctScore = when(punctRatio(text) > 0.3, lit(0.0)).otherwise(lit(1.0))
    val swScore = when(stopwordRatioOf(lowerToks) > 0.05, lit(1.0)).otherwise(lit(0.3))
    val mtl = meanTokenLengthOf(toks)
    val wordScore = when(mtl >= 2.5 && mtl <= 12.0, lit(1.0)).otherwise(lit(0.4))
    round(lenScore * 0.25 + punctScore * 0.25 + swScore * 0.25 + wordScore * 0.25, 4)
  }

  def qualityScore(text: Column): Column =
    qualityScoreOfProfile(textProfile(text))

  /** N-gram (stopword-marker) heuristic language ID over a fixed label set —
    * deterministic argmax with (score, lang) tuple tie-break. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "los", "las", "que", "de", "y", "es", "en", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "des", "une", "dans", "pour"))

  /** Over a precomputed LOWERCASE token array. */
  def langIdOf(lowerToks: Column): Column = {
    val scores = langMarkers.map { case (lang, words) =>
      struct(graft.plans.SketchExpressions.countInSet(lowerToks, words).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(size(lowerToks) === 0, lit("und")).otherwise(best.getField("lang"))
  }

  def langId(text: Column): Column = langIdOf(tokens(lower(text)))
}
