package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic subword (GreedyPiece) tokenization — the WordPiece-style
  * greedy longest-match segmentation (public technique: Wu et al. 2016,
  * and the encode step of BPE inference) over a corpus-trained piece
  * vocabulary. Training is relational ([[graft.ext.Subword.trainVocab]]);
  * encoding is this codegen'd kernel: one static call per document inside
  * whole-stage codegen, no join, no shuffle — token-budgeting 100 TB is a
  * single scan with a model-sized (≤ vocab entries) broadcast reference.
  *
  * Determinism contract (what the DuckDB oracle replays): words are the
  * `\W+`-lowercase tokens of [[TextKernels.tokenStrings]]; within a word,
  * scan left to right, at each position consume the LONGEST vocab piece
  * (≤ maxLen chars) matching at that position, else one (unknown)
  * character; every consumed piece counts 1 token. All single characters
  * seen in training are in the vocab, so segmentation always advances.
  * Offsets are Java char offsets — identical to SQL code-point semantics
  * for any BMP/ASCII corpus (the fixtures are ASCII).
  */
object SubwordKernels {

  /** Greedy piece count of one already-normalized word. */
  def countWord(w: String, vocab: java.util.HashSet[String],
      maxLen: Int): Int = {
    val n = w.length
    var pos = 0
    var cnt = 0
    while (pos < n) {
      var adv = 1
      var l = math.min(maxLen, n - pos)
      var found = false
      while (!found && l >= 1) {
        if (vocab.contains(w.substring(pos, pos + l))) { adv = l; found = true }
        l -= 1
      }
      pos += adv
      cnt += 1
    }
    cnt
  }

  /** Subword token count of a whole document (Σ over word occurrences). */
  def countTokens(text: UTF8String, vocab: java.util.HashSet[String],
      maxLen: Int): Int = {
    val words = TextKernels.tokenStrings(text)
    var total = 0
    var i = 0
    while (i < words.length) {
      total += countWord(words(i), vocab, maxLen)
      i += 1
    }
    total
  }
}

/** `subword_count(text)`: corpus-trained greedy-subword token count as one
  * codegen'd kernel call. The vocab rides as a reference object (shipped
  * once per executor with the generated class, like the LSH plane
  * literals). */
case class SubwordCount(child: Expression, vocab: Array[String], maxLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(maxLen >= 1, "maxLen must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "subword_count"

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }

  override protected def nullSafeEval(t: Any): Any =
    SubwordKernels.countTokens(t.asInstanceOf[UTF8String], vocabSet, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("vocabSet", vocabSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, t =>
      s"org.apache.spark.sql.graft.SubwordKernels.countTokens($t, $setRef, $maxLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}

object SubwordBridge {
  def subwordCount(text: Column, vocab: Array[String], maxLen: Int): Column =
    ExpressionUtils.column(SubwordCount(
      ExpressionUtils.expression(text), vocab, maxLen))
}
