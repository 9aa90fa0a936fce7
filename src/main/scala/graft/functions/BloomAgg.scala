package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter BUILD as a native mergeable aggregate: the bitmap is
  * assembled inside the query plan (map-side partial bitmaps OR-merged
  * by the aggregation machinery, exactly like a sum's partials), so a
  * SQL user composes build + probe with a scalar subquery and Catalyst
  * schedules the whole flow — no driver-side fold, no separate action:
  *
  * {{{
  * SELECT * FROM corpus_grams
  * WHERE graft_bloom_contains(xxhash64(g),
  *         (SELECT graft_bloom_agg(xxhash64(gram), 1048576, 11) FROM banlist), 11)
  * }}}
  *
  * This is the plan-side twin of [[graft.operators.Bloom.build]] (whose
  * `treeAggregate` returns the driver-side `Filter` object for Scala
  * callers); both insert through the same [[HashRuntime]] kernel, so a
  * bitmap built by either probes identically.
  *
  * `numBits` is fixed at plan time (an aggregate can't size itself from
  * a count it hasn't finished); sizing guidance is [[graft.operators.Bloom.sizeFor]].
  * The result is BINARY, little-endian words — see
  * [[HashRuntime.bloomBytesFromWords]] for the layout contract.
  */
case class BloomAggregate(
    child: Expression,
    numBits: Long,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && numBits <= (1L << 31) && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two in [64, 2^31], got $numBits")
  require(k >= 1 && k <= 32, s"probe count k must be in [1,32], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_bloom_agg needs bigint keys, got $t")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long]((numBits >>> 6).toInt)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) HashRuntime.bloomInsert(v.asInstanceOf[Long], buffer, k)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = HashRuntime.bloomBytesFromWords(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    HashRuntime.bloomBytesFromWords(buffer)

  override def deserialize(storage: Array[Byte]): Array[Long] =
    HashRuntime.bloomWordsFromBytes(storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAggregate =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_agg"
}

/** bigint (key hash) × binary (bitmap from [[BloomAggregate]]) ->
  * boolean. Unlike [[BloomMightContain]] the bitmap is a runtime value
  * (typically a scalar subquery), so the probe count `k` must be passed
  * again and MUST match the build's — the bitmap doesn't self-describe.
  * Probes the BINARY directly (no per-row copy into a long array).
  */
case class BloomContainsBytes(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1 && k <= 32, s"probe count k must be in [1,32], got $k")
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains needs (bigint, binary), got ($l, $r)")
    }

  override protected def nullSafeEval(key: Any, bitmap: Any): Any =
    HashRuntime.bloomContainsBytes(key.asInstanceOf[Long], bitmap.asInstanceOf[Array[Byte]], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashRuntime.bloomContainsBytes($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsBytes =
    copy(left = newLeft, right = newRight)
}
