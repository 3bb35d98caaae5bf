package org.apache.spark.sql.graft

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels for the dedup family's hot path.
  *
  * The composed-functions formulation
  * `transform(sequence(1, size(toks)-n+1), i => concat_ws(" ", slice(toks, i, n)))`
  * re-evaluates the whole `split(lower(text))` subtree once PER SEQUENCE
  * ELEMENT, because higher-order-function lambdas are interpreted and get
  * no subexpression elimination — O(tokens²) work per document (measured
  * ~2.5 s per pass over 5 000 sf0.1 documents, ×4 passes in jaccardPairs).
  * These kernels tokenize once and build the distinct shingle set in a
  * single pass, invoked as one static call from within whole-stage codegen.
  *
  * Semantics are bit-compatible with the composed form (and the DuckDB
  * oracle's `list_transform(range(...), i -> array_to_string(t[i:i+n-1]))`):
  * lowercase, split on `\W+`, drop empty tokens, tail-truncating window,
  * and a document with no word characters yields the single empty shingle.
  * `TextKernelsSpec` pins equality against the composed form on fixture
  * data.
  */
object TextKernels {
  private val NonWord = Pattern.compile("\\W+")

  /** Lowercased non-empty word tokens of `text`. */
  def tokenStrings(text: UTF8String): Array[String] = {
    val parts = NonWord.split(text.toString.toLowerCase(Locale.ROOT), -1)
    var n = 0
    var i = 0
    while (i < parts.length) { if (!parts(i).isEmpty) n += 1; i += 1 }
    if (n == parts.length) parts
    else {
      val out = new Array[String](n)
      var j = 0
      i = 0
      while (i < parts.length) {
        if (!parts(i).isEmpty) { out(j) = parts(i); j += 1 }
        i += 1
      }
      out
    }
  }

  def tokens(text: UTF8String): ArrayData = {
    val toks = tokenStrings(text)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingles (first-occurrence order), matching
    * `array_distinct(transform(sequence(1, greatest(size-n+1, 1)),
    * i => concat_ws(" ", slice(toks, i, n))))`. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenStrings(text)
    val m = math.max(toks.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String](math.max(m * 2, 8))
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      val end = math.min(i + n, toks.length)
      var k = i
      while (k < end) {
        if (k > i) sb.append(' ')
        sb.append(toks(k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}

/** `token_array(text)`: one-pass codegen'd tokenization (lowercase, split
  * `\W+`, drop empties). */
case class TokenArray(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_array"

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.tokens(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"org.apache.spark.sql.graft.TextKernels.tokens($t)")

  override protected def withNewChildInternal(newChild: Expression): TokenArray =
    copy(child = newChild)
}

/** `shingle_array(text, n)`: one-pass codegen'd distinct word n-gram
  * shingles of the normalized token stream. */
case class ShingleArray(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle width must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.shingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"org.apache.spark.sql.graft.TextKernels.shingles($t, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

/** Column-level entry points (sql-package bridge, same shape as
  * [[VectorBridge]]). */
object TextBridge {
  def tokenArray(text: Column): Column =
    ExpressionUtils.column(TokenArray(ExpressionUtils.expression(text)))
  def shingleArray(text: Column, n: Int): Column =
    ExpressionUtils.column(ShingleArray(ExpressionUtils.expression(text), n))
}
