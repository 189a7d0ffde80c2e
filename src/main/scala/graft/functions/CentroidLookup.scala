package graft.functions

import org.apache.spark.sql.{Column, GraftBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: fetch centroid `idx` of a [[CodebookRef]]'s
  * group 0 as `array<double>` — the residual computation's companion to
  * [[NearestCentroid]] when the codebook is too large to embed as a
  * `typedLit` (the literal form `element_at(typedLit(coarse), cell + 1)`
  * puts the WHOLE codebook in the plan; this reads one row of a task-local
  * / broadcast-resolved matrix). An out-of-range index is an error by
  * construction (callers derive `idx` from the same matrix) — this throws
  * rather than guessing. */
case class CentroidLookup(
    idx: Expression,
    codebooks: CodebookRef) extends UnaryExpression {

  override def child: Expression = idx
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (idx.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"centroid_lookup expects int, got ${idx.dataType}")

  @transient private lazy val cbResolved: Array[Array[Double]] = codebooks.value(0)

  override protected def nullSafeEval(i: Any): Any =
    new GenericArrayData(cbResolved(i.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refObj = ctx.addReferenceObj("codebookRef", codebooks,
      "graft.functions.CodebookRef")
    val ref = ctx.addMutableState("double[][]", "centroidLookupCb",
      v => s"$v = $refObj.value()[0];")
    nullSafeCodeGen(ctx, ev, i =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($ref[$i]);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(idx = newChild)
}

object CentroidLookup {
  def apply(idx: Column, codebooks: CodebookRef): Column =
    ExpressionUtils.column(CentroidLookup(ExpressionUtils.expression(idx), codebooks))
}
