package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation kernel for the unigram-LM tokenizer trainer
  * ([[graft.operators.Unigram]]) — SentencePiece's model family (Kudo
  * 2018), next to the merge-based [[graft.operators.Bpe]].
  *
  * Determinism is the design constraint: piece scores are FIXED-POINT
  * integer log2 values ([[UnigramRuntime.log2fp]] — an exact bit
  * algorithm, no libm), the DP compares only integer sums, and ties
  * resolve by (fewer pieces, then longest-first candidate scan) — so
  * the segmentation, the EM counts and the final vocabulary are
  * bit-identical at any parallelism and replayable by an in-memory
  * reference (the PropertySpec law).
  */
object UnigramRuntime {

  /** floor(log2(x) · 2^16) for x ≥ 1, via the classic integer
    * square-and-compare fraction algorithm (Q32 mantissa, 128-bit
    * squares through Math.multiplyHigh) — no floating point, no libm,
    * bit-identical everywhere.
    */
  def log2fp(x: Long): Long = {
    require(x >= 1L, s"log2fp needs x >= 1, got $x")
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var y: Long = if (msb >= 32) x >>> (msb - 32) else x << (32 - msb)
    var frac = 0L
    var i = 0
    while (i < 16) {
      val hi = Math.multiplyHigh(y, y)
      val lo = y * y
      var z = (hi << 32) | (lo >>> 32)
      frac <<= 1
      if (z >= (2L << 32)) { frac |= 1L; z = z >>> 1 }
      y = z
      i += 1
    }
    (msb.toLong << 16) | frac
  }

  private val NegInf = Long.MinValue / 4

  /** Whole-document segmentation: lowercase, split on single spaces
    * (TextOps.tokens' contract), Viterbi each word, concatenate the
    * piece sequences — one codegen'd pass per document, no interpreted
    * HOF lambda and no per-word explode/shuffle.
    */
  def viterbiText(text: UTF8String, pieces: Array[String], scores: Array[Long],
      maxLen: Int): ArrayData = {
    val words = text.toLowerCase.toString.split(" ", -1)
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val seg = viterbi(UTF8String.fromString(words(i)), pieces, scores, maxLen)
        var j = 0
        while (j < seg.numElements()) { out.add(seg.getUTF8String(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Max-score segmentation of `word` under the (sorted) piece table:
    * best[i] = max over vocab pieces ending at i of best[j] + score.
    * Ties prefer FEWER pieces; remaining ties keep the first candidate
    * in the longest-first scan (strict-improvement replacement) — a
    * total, deterministic rule. Returns the piece sequence; empty if
    * the word is unsegmentable (cannot happen while the trainer keeps
    * every single character in the vocabulary).
    */
  def viterbi(word: UTF8String, pieces: Array[String], scores: Array[Long],
      maxLen: Int): ArrayData = {
    val w = word.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val best = new Array[Long](n + 1)
    val nPieces = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) { best(i) = NegInf; i += 1 }
    i = 1
    while (i <= n) {
      var len = math.min(maxLen, i)
      while (len >= 1) {
        val j = i - len
        if (best(j) > NegInf) {
          val idx = java.util.Arrays.binarySearch(
            pieces.asInstanceOf[Array[AnyRef]], w.substring(j, i))
          if (idx >= 0) {
            val cand = best(j) + scores(idx)
            if (cand > best(i) ||
                (cand == best(i) && nPieces(j) + 1 < nPieces(i))) {
              best(i) = cand
              nPieces(i) = nPieces(j) + 1
              back(i) = j
            }
          }
        }
        len -= 1
      }
      i += 1
    }
    if (best(n) == NegInf) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nPieces(n))
    var pos = n
    var k = nPieces(n) - 1
    while (pos > 0) {
      out(k) = UTF8String.fromString(w.substring(back(pos), pos))
      pos = back(pos)
      k -= 1
    }
    new GenericArrayData(out)
  }
}

/** string word -> array<string> best unigram-LM segmentation. The piece
  * table (sorted pieces + Q16 log-prob scores) is a plan-time constant
  * shipped once per executor as codegen reference objects — the
  * [[ClassifierScoreTable]] device; a vocabulary past the tens of MB
  * would move to a broadcast-joined lattice, same dataflow.
  */
case class UnigramViterbi(child: Expression, pieces: Array[String],
    scores: Array[Long], maxLen: Int) extends UnaryExpression {
  require(pieces.nonEmpty, "piece table must not be empty")
  require(pieces.length == scores.length, "pieces and scores must align")
  require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_unigram_viterbi needs string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    UnigramRuntime.viterbi(input.asInstanceOf[UTF8String], pieces, scores, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("unigramPieces", pieces, "java.lang.String[]")
    val sRef = ctx.addReferenceObj("unigramScores", scores, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramRuntime.viterbi($c, $pRef, $sRef, $maxLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}

/** string document -> array<string> unigram segmentation of every
  * whitespace word — [[UnigramViterbi]] lifted to whole documents so
  * corpus tokenization is one codegen'd scan pass (no per-word explode,
  * no interpreted HOF lambda).
  */
case class UnigramTokenize(child: Expression, pieces: Array[String],
    scores: Array[Long], maxLen: Int) extends UnaryExpression {
  require(pieces.nonEmpty, "piece table must not be empty")
  require(pieces.length == scores.length, "pieces and scores must align")
  require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_unigram_tokenize needs string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    UnigramRuntime.viterbiText(input.asInstanceOf[UTF8String], pieces, scores, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("unigramPieces", pieces, "java.lang.String[]")
    val sRef = ctx.addReferenceObj("unigramScores", scores, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramRuntime.viterbiText($c, $pRef, $sRef, $maxLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramTokenize =
    copy(child = newChild)
}

/** bigint x >= 1 -> floor(log2(x)·2^16): [[UnigramRuntime.log2fp]] as a
  * per-row scalar expression. The SAME exact bit recurrence
  * [[graft.operators.BigramLm.log2Frame]] unrolls column-wise (the
  * parity law is in PropertySpec), so a caller whose input frame is NOT
  * bounded — or who wants to skip the distinct-vals join frame's extra
  * stages entirely — gets bit-identical Q16 values in one codegen'd
  * projection.
  */
case class Log2Fp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_log2fp needs bigint, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    UnigramRuntime.log2fp(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramRuntime.log2fp($c);")

  override protected def withNewChildInternal(newChild: Expression): Log2Fp =
    copy(child = newChild)
}

object UnigramExprs {
  def unigramViterbi(c: Column, pieces: Array[String], scores: Array[Long], maxLen: Int): Column =
    GraftColumnBridge.column(UnigramViterbi(GraftColumnBridge.expression(c), pieces, scores, maxLen))
  def unigramTokenize(c: Column, pieces: Array[String], scores: Array[Long], maxLen: Int): Column =
    GraftColumnBridge.column(UnigramTokenize(GraftColumnBridge.expression(c), pieces, scores, maxLen))
  def log2fp(c: Column): Column =
    GraftColumnBridge.column(Log2Fp(GraftColumnBridge.expression(c)))
}
