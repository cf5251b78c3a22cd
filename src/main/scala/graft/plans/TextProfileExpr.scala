package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `text_profile(text)`: one pass over the string computing every cheap
  * text-quality statistic at once:
  *
  *   struct(n_chars, n_punct, n_letters, n_upper,
  *          n_tokens, sum_token_len, stopword_hits)
  *
  * Replaces 2 regexp_replace passes + 2 regex splits + a membership filter
  * (≥5 scans and a pile of intermediate strings) with a single char loop.
  * Semantics match the composed formulation on ASCII text exactly:
  * whitespace = Java regex `\s` ([ \t\n\x0B\f\r]), punctuation =
  * `\p{Punct}` (ASCII), stopword comparison is ASCII-lowercased.
  */
case class TextProfileExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TextProfileExpr.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_profile"

  @transient private lazy val stopwordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(w => s.add(w))
    s
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def isPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var punct = 0; var letters = 0; var upper = 0
    var tokens = 0; var sumTokLen = 0L; var stopHits = 0
    var i = 0
    val tokBuf = new java.lang.StringBuilder(24)
    def closeToken(): Unit = if (tokBuf.length() > 0) {
      tokens += 1
      sumTokLen += tokBuf.length()
      if (stopwordSet.contains(tokBuf.toString)) stopHits += 1
      tokBuf.setLength(0)
    }
    while (i < n) {
      val c = s.charAt(i)
      if (isPunct(c)) punct += 1
      if (Character.isLetter(c)) {
        letters += 1
        if (Character.isUpperCase(c)) upper += 1
      }
      if (isWs(c)) closeToken()
      else tokBuf.append(Character.toLowerCase(c))
      i += 1
    }
    closeToken()
    new GenericInternalRow(Array[Any](n, punct, letters, upper, tokens, sumTokLen, stopHits))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextProfileExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_letters", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("stopword_hits", IntegerType, nullable = false)))

  def textProfile(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(TextProfileExpr(ColumnBridge.expression(text), stopwords))
}

/** `script_profile(text)`: struct(n_latin, n_cyrillic, n_cjk, n_arabic) —
  * per-script character counts for multilingual corpus curation (script
  * routing, mixed-script spam detection, the pre-filter before per-language
  * quality models). One char pass, no regex.
  *
  * Counts are RANGE-based, not Unicode-property-based, so any engine
  * counting the same codepoint ranges with a character-class regex
  * reproduces them exactly (property tables drift across ICU versions;
  * ranges cannot): latin = A-Z a-z U+00C0-U+024F, cyrillic =
  * U+0400-U+04FF, cjk = U+4E00-U+9FFF (BMP unified block), arabic =
  * U+0600-U+06FF. All ranges are BMP, surrogate-free, so UTF-16 char
  * iteration counts codepoints correctly. */
case class ScriptProfileExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ScriptProfileExpr.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "script_profile"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var latin = 0; var cyr = 0; var cjk = 0; var ar = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= 0x00C0 && c <= 0x024F)) latin += 1
      else if (c >= 0x0400 && c <= 0x04FF) cyr += 1
      else if (c >= 0x4E00 && c <= 0x9FFF) cjk += 1
      else if (c >= 0x0600 && c <= 0x06FF) ar += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](latin, cyr, cjk, ar))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScriptProfileExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_latin", IntegerType, nullable = false),
    StructField("n_cyrillic", IntegerType, nullable = false),
    StructField("n_cjk", IntegerType, nullable = false),
    StructField("n_arabic", IntegerType, nullable = false)))

  def scriptProfile(text: Column): Column =
    ColumnBridge.column(ScriptProfileExpr(ColumnBridge.expression(text)))
}

/** `char_entropy(text)`: struct(entropy, n_distinct) — Shannon entropy in
  * bits per character of the text's character distribution, and the
  * distinct-character count. Low entropy flags degenerate content
  * (repeated filler, padding); it is the cheap stand-in for the
  * compression-ratio quality filter of C4-style corpus cleaning, without
  * depending on any codec implementation.
  *
  * One char pass + one pass over the (≤ alphabet-size) count table.
  * Determinism contract: terms are accumulated in ASCENDING char-code
  * order, so any engine that sums `-(n_i/N)·log2(n_i/N)` over the sorted
  * alphabet reproduces the identical double (the d25 DuckDB oracle does
  * exactly that; margins off the round-4 boundary are checked offline on
  * the frozen corpus). */
case class CharEntropyExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = CharEntropyExpr.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_entropy"

  private val Ln2 = math.log(2.0)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n == 0) return new GenericInternalRow(Array[Any](0.0, 0))
    // ASCII fast table + sorted map spill for anything above
    val ascii = new Array[Int](128)
    var high: java.util.TreeMap[Int, Int] = null
    var i = 0
    while (i < n) {
      val c = s.charAt(i).toInt
      if (c < 128) ascii(c) += 1
      else {
        if (high == null) high = new java.util.TreeMap[Int, Int]()
        high.merge(c, 1, (a, b) => a + b)
      }
      i += 1
    }
    val total = n.toDouble
    var entropy = 0.0
    var distinct = 0
    var c = 0
    while (c < 128) {
      val cnt = ascii(c)
      if (cnt > 0) {
        distinct += 1
        val p = cnt / total
        entropy -= p * (math.log(p) / Ln2)
      }
      c += 1
    }
    if (high != null) {
      val it = high.values().iterator()
      while (it.hasNext) {
        distinct += 1
        val p = it.next() / total
        entropy -= p * (math.log(p) / Ln2)
      }
    }
    new GenericInternalRow(Array[Any](entropy, distinct))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyExpr {
  val schema: StructType = StructType(Seq(
    StructField("entropy", DoubleType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))

  def charEntropy(text: Column): Column =
    ColumnBridge.column(CharEntropyExpr(ColumnBridge.expression(text)))
}
