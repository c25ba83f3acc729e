package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text statistics.
  *
  * The naive stats plan evaluates ~10 independent regex automata per
  * document (`\S+` tokenization, subword split, three character-class
  * strips); on 100 TB of documents each pass re-reads every byte. This
  * expression computes all counts in ONE scan over the string and stays
  * inside whole-stage codegen (the generated code calls the static
  * counter, no interpreter fallback).
  *
  * Definitions match the regex formulas bit-for-bit (they remain the
  * DuckDB oracle):
  *  - n_tokens:  maximal runs of non-whitespace (`\S+`), whitespace =
  *    Java/RE2 `\s` = space, \t, \n, \x0B, \f, \r
  *  - n_subwords: runs of letters, runs of digits, single other
  *    non-whitespace chars (`[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]`)
  *  - n_alpha / n_punct / n_space: chars in [a-zA-Z] / [.!?,;:] / ' '
  */
object TextStats {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_space", IntegerType, nullable = false)))

  @inline private def isSpace(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isAlpha(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isDigit(c: Int): Boolean = c >= '0' && c <= '9'
  @inline private def isPunct(c: Int): Boolean =
    c == '.' || c == '!' || c == '?' || c == ',' || c == ';' || c == ':'

  /** One pass over the string; invoked from generated code. Iterates per
    * CODE POINT (the regex formulas the DuckDB oracle runs match per code
    * point): a supplementary char (a surrogate pair in UTF-16) counts as
    * ONE char and one 'other' subword, and never truncates the scan.
    */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val len = str.length
    var n = 0
    var tokens = 0; var subwords = 0; var alpha = 0; var punct = 0; var space = 0
    // char classes: 0 = whitespace, 1 = letter, 2 = digit, 3 = other
    var prev = 0
    var i = 0
    while (i < len) {
      val c = str.codePointAt(i)
      n += 1
      val cls =
        if (isSpace(c)) 0
        else if (isAlpha(c)) 1
        else if (isDigit(c)) 2
        else 3
      if (cls != 0 && prev == 0) tokens += 1
      cls match {
        case 1 => alpha += 1; if (prev != 1) subwords += 1
        case 2 => if (prev != 2) subwords += 1
        case 3 => subwords += 1 // each symbol is its own subword
        case _ =>
      }
      if (isPunct(c)) punct += 1
      if (c == ' ') space += 1
      prev = cls
      i += Character.charCount(c)
    }
    InternalRow(n, tokens, subwords, alpha, punct, space)
  }
}

object WordHits {
  /** Whole-word occurrence count in ONE scan: runs of word chars
    * ([A-Za-z0-9_], i.e. regex `\w`) are matched against the word set —
    * exactly `\b<word>\b` semantics summed over the set, without one
    * regex automaton pass per word. */
  def count(s: UTF8String, words: java.util.HashSet[String]): Int = {
    val str = s.toString
    val n = str.length
    var hits = 0
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '_') {
        val start = i
        while (i < n && {
          val d = str.charAt(i)
          (d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z') ||
            (d >= '0' && d <= '9') || d == '_'
        }) i += 1
        if (words.contains(str.substring(start, i))) hits += 1
      } else i += 1
    }
    hits
  }
}

/** `word_hits(text, array('w1', ...))` -> INT, registered in GraftFunctions.
  * The word list is folded at plan time (must be a literal array). */
case class WordHitsExpr(child: Expression, words: Seq[String]) extends UnaryExpression {

  override def prettyName: String = "word_hits"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add); s
  }

  override protected def nullSafeEval(input: Any): Any =
    WordHits.count(input.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet<String>")
    defineCodeGen(ctx, ev, c => s"graft.functions.WordHits.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `text_stats(text)` -> struct, registered in GraftFunctions. */
case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "text_stats"
  override def dataType: DataType = TextStats.schema
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
