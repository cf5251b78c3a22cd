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
