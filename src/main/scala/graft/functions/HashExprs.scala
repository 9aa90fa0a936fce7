package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash-heavy LLM-data operators.
  *
  * The minhash/simhash inner loops are O(k × elements) per row; phrased
  * as nested higher-order functions they run as *interpreted* lambda
  * calls (HOFs never enter whole-stage codegen), which measured ~100×
  * slower than a primitive JVM loop at sf0.1 (q23: 227s -> ~2s). These
  * expressions do the same arithmetic in tight `while` loops over
  * primitive longs — the brief's preference order: native Expression >
  * HOF chain > UDF, for hot paths.
  *
  * Determinism contract: identical math to the SQL-expressible
  * formulations in [[graft.operators.TextOps]] (polynomial mod-1e9+7
  * hashes), so oracle SQL reproduces the values bit-for-bit where they
  * surface in query output.
  */
object HashCoeffs {
  val Prime: Long = 1000000007L

  /** Deterministic (a, b) coefficient pairs from a fixed MMIX LCG — fully
    * specified here, no JVM RNG.
    */
  def coefficients(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    var s = seed
    def next(): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 1) % (Prime - 1)) + 1
    }
    val as = Array.fill(k)(next())
    val bs = Array.fill(k)(next())
    (as, bs)
  }
}

/** array<string> -> array<long>: per-element polynomial rolling hash
  * (acc0=7, acc = (acc*31 + codepoint) mod 1e9+7) — the native twin of
  * [[graft.operators.TextOps.polyHash]]. Null elements hash to null.
  */
case class PolyHashArray(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polyHashArray needs array<string>, got $t")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // fold CODE POINTS, not UTF-16 units — Spark's ascii()/substr()
        // and DuckDB's ascii(substr()) are codepoint-based, and the
        // twin HOF formulation (TextOps.polyHash) must hash identically
        // for supplementary characters too
        val s = arr.getUTF8String(i).toString
        var acc = 7L
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          acc = (acc * 31L + cp.toLong) % HashCoeffs.Prime
          j += Character.charCount(cp)
        }
        out(i) = acc
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHashArray =
    copy(child = newChild)
}

/** array<long> (element hashes) -> array<long> (k-slot minhash
  * signature): sig[j] = min over h of (a_j*h + b_j) mod 1e9+7; empty
  * arrays yield Prime ("infinity") in every slot.
  */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val (as, bs) = HashCoeffs.coefficients(k, seed)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(HashCoeffs.Prime)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null elements carry no signal; skip them
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % HashCoeffs.Prime
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** array<long> (token hashes) -> long: 64-bit simhash. Bit j is set iff
  * the majority of tokens have parity-1 in slot j under hash
  * (a_j*h + b_j) mod 1e9+7.
  */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  @transient private lazy val (as, bs) = HashCoeffs.coefficients(64, seed)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null elements carry no signal; skip them
        val h = arr.getLong(i)
        var j = 0
        while (j < 64) {
          if ((as(j) * h + bs(j)) % HashCoeffs.Prime % 2L == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object HashExprs {
  /** Column wrappers. */
  def polyHashArray(c: Column): Column =
    GraftColumnBridge.column(PolyHashArray(GraftColumnBridge.expression(c)))
  def minHashSignature(c: Column, k: Int, seed: Long): Column =
    GraftColumnBridge.column(MinHashSignature(GraftColumnBridge.expression(c), k, seed))
  def simHash64(c: Column, seed: Long): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(c), seed))
}
