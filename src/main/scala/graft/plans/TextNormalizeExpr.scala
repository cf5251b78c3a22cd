package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `normalize_text(text)`: CCNet-style text normalization for
  * normalization-aware deduplication — documents that differ only in case,
  * accents, digits, punctuation, or whitespace hash identically afterwards.
  *
  * Pipeline (one Java pass after the Unicode decomposition):
  *   1. Unicode NFD decomposition, then drop combining marks
  *      (= accent stripping: `á` → `a`);
  *   2. lowercase (full-string Unicode mapping, root locale);
  *   3. fold every ASCII digit to `0` (CCNet's digit bucketing — version
  *      strings and counters stop defeating exact-hash dedup);
  *   4. collapse every run of characters outside `[a-z0-9]` to a single
  *      space and trim (punctuation/whitespace insensitivity).
  *
  * Cross-engine contract (pinned by the d68 oracle): the result equals the
  * DuckDB expression
  * `trim(regexp_replace(regexp_replace(lower(strip_accents(s)),
  *   '[0-9]', '0', 'g'), '[^a-z0-9]+', ' ', 'g'))`
  * — utf8proc's accent stripping and Java's NFD+drop-marks agree on Latin
  * text, and steps 3-4 are pure ASCII so the engines cannot diverge there.
  * Digit folding before collapse is equivalent to folding inside the
  * keep-set (`0` survives the `[^a-z0-9]` collapse), which is how the
  * single pass below implements it.
  *
  * A native expression (not 3 regexp_replace + lower + trim Columns)
  * because the composed form makes 4 full string copies per row and Spark
  * has no accent-strip/NFD builtin at all — this is the hot inner loop of
  * corpus-wide dedup, one scan over 100 TB of text.
  */
case class TextNormalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_text"

  private def isMark(c: Char): Boolean = {
    val t = Character.getType(c)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString
    // NFD + drop combining marks (skip the decomposition for pure-ASCII
    // input — the common case in an English-dominated corpus — where NFD
    // is the identity and the mark scan would find nothing)
    val stripped =
      if (isAscii(raw)) raw
      else {
        val d = java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(d.length)
        var i = 0
        while (i < d.length) {
          val c = d.charAt(i)
          if (!isMark(c)) sb.append(c)
          i += 1
        }
        sb.toString
      }
    val lowered = stripped.toLowerCase(java.util.Locale.ROOT)
    // digit fold + non-[a-z0-9] run collapse + trim, single pass
    val out = new java.lang.StringBuilder(lowered.length)
    var pendingSep = false
    var i = 0
    while (i < lowered.length) {
      val c = lowered.charAt(i)
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') {
        if (pendingSep && out.length() > 0) out.append(' ')
        pendingSep = false
        out.append(if (c >= '0' && c <= '9') '0' else c)
      } else pendingSep = true
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) return false
      i += 1
    }
    true
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormalizeExpr {
  def normalizeText(text: Column): Column =
    ColumnBridge.column(TextNormalizeExpr(ColumnBridge.expression(text)))
}
