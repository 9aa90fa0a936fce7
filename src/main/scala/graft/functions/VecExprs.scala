package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native vector expressions for the similarity-search operators.
  *
  * The embedding dot product is the hot inner op of every cosine query
  * (q24/q30/q33): as `aggregate(zip_with(...))` it runs interpreted per
  * PAIR — at sf0.1 that is ~10^8 lambda dispatches. [[DotProduct]] is the
  * same sequential left fold as a primitive loop with codegen, so scoring
  * stays inside WholeStageCodegen; bit-identical IEEE order keeps the
  * DuckDB oracle exact (list_sum folds in the same order).
  *
  * [[LshSignatures]] computes ALL hyperplane-table signatures of a vector
  * in one native call (tables × planes × dim multiply-adds) — the
  * interpreted predecessor built one Column tree per plane, unusable at
  * the table counts a low-threshold corpus needs (see
  * [[graft.operators.Similarity.cosinePairsLsh]]).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"graft_dot needs two array<double>, got ($l, $r)")
    }

  // null when lengths differ or any element is null — the zip_with
  // null-padding semantics this replaces (a null never silently scores)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashRuntime.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("dot")
      s"""
         |java.lang.Double $d = graft.functions.HashRuntime.dotOrNull($a, $b);
         |if ($d == null) { ${ev.isNull} = true; } else { ${ev.value} = $d.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** array<double> -> array<int>: one sign-pattern LSH signature per table
  * under the deterministic hyperplane matrix (tables × planes × dim from
  * the seeded LCG stream). Throws on a dim mismatch rather than
  * null-padding — a short vector falling into one shared bucket would
  * silently turn the bucketed join into a cross join.
  */
case class LshSignatures(child: Expression, tables: Int, planes: Int, dim: Int, seed: Long)
    extends UnaryExpression {
  require(tables >= 1 && planes >= 1 && planes <= 30 && dim >= 1,
    s"invalid LSH geometry: tables=$tables planes=$planes dim=$dim")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_lsh_sigs needs array<double>, got $t")
    }

  @transient private lazy val planeMatrix: Array[Double] =
    HashRuntime.hyperplaneMatrix(tables, planes, dim, seed)

  override protected def nullSafeEval(input: Any): Any =
    HashRuntime.lshSignatures(input.asInstanceOf[ArrayData], planeMatrix, tables, planes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planeMatrix, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashRuntime.lshSignatures($c, $planesRef, $tables, $planes, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignatures =
    copy(child = newChild)
}

object VecExprs {
  /** Column wrappers. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def lshSignatures(v: Column, tables: Int, planes: Int, dim: Int, seed: Long): Column =
    GraftColumnBridge.column(LshSignatures(GraftColumnBridge.expression(v), tables, planes, dim, seed))
}
