package graft.functions

import org.apache.spark.sql.{Column, GraftBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass L2 normalization of a numeric array — the fused form of the
  * HOF composition every PQ/IVFADC path normalizes with:
  *
  * {{{
  *   val n = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x))
  *   when(n > 0, transform(v, x => x.cast("double") / n))
  *     .otherwise(transform(v, x => x.cast("double") * 0.0))
  * }}}
  *
  * The composed form is interpreted (higher-order functions take no part in
  * whole-stage codegen) and — because Catalyst does no CSE inside a lambda —
  * re-evaluates the full norm aggregate PER ELEMENT of the division
  * transform: O(d²) multiply-adds per row for a d-dim vector. This
  * expression computes the identical result in one O(d) pass.
  *
  * Semantics are BIT-IDENTICAL by construction (pinned in L2NormalizeSpec):
  * the norm is the same left-fold IEEE sum of squares in element order,
  * `Math.sqrt` is Spark's `sqrt`, the `norm > 0` branch test uses Spark's
  * SQL double ordering (NaN above everything — a NaN norm DIVIDES, like the
  * composition), the positive branch divides each double-cast element by
  * the norm, and the zero-norm branch multiplies each double-cast element
  * by 0.0 (so zero vectors stay zero, sign propagation included). Null
  * handling mirrors the composition: a null array is null; a null ELEMENT
  * nulls the aggregate (null acc absorbs), so the `when` predicate is
  * unknown and every element takes the ×0.0 branch, null elements staying
  * null.
  */
object L2Normalize {
  def apply(v: Column): Column =
    ExpressionUtils.column(L2NormalizeExpr(ExpressionUtils.expression(v)))
}

object L2NormalizeExpr {
  // element-type codes for the static kernel (codegen-callable)
  val TDouble = 0; val TFloat = 1; val TLong = 2; val TInt = 3
  val TShort = 4; val TByte = 5

  /** The normalize kernel — called from interpreted eval AND generated code
    * (static forwarder), never null input. See the class doc for the exact
    * bit-identity contract with the HOF composition. */
  def normalize(arr: ArrayData, typeCode: Int): ArrayData = {
    val n = arr.numElements()
    val xs = new Array[Double](n)
    val isNull = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) isNull(i) = true
      else xs(i) = typeCode match {
        case TDouble => arr.getDouble(i)
        case TFloat => arr.getFloat(i).toDouble
        case TLong => arr.getLong(i).toDouble
        case TInt => arr.getInt(i).toDouble
        case TShort => arr.getShort(i).toDouble
        case TByte => arr.getByte(i).toDouble
      }
      i += 1
    }
    // left-fold sum of squares in element order — a null element nulls the
    // accumulator (and it stays null), exactly like the aggregate() fold
    var acc = 0.0
    var accNull = false
    i = 0
    while (i < n && !accNull) {
      if (isNull(i)) accNull = true else acc += xs(i) * xs(i)
      i += 1
    }
    // Spark's GreaterThan on doubles orders NaN ABOVE every value (SQL NaN
    // semantics), so a NaN norm takes the DIVISION branch — Double.compare
    // reproduces that ordering (and -0.0 < 0.0 stays false either way)
    val norm = Math.sqrt(acc)
    val positive = !accNull && java.lang.Double.compare(norm, 0.0) > 0
    val out = new Array[Any](n)
    i = 0
    if (positive) {
      while (i < n) { out(i) = if (isNull(i)) null else xs(i) / norm; i += 1 }
    } else {
      while (i < n) { out(i) = if (isNull(i)) null else xs(i) * 0.0; i += 1 }
    }
    new GenericArrayData(out)
  }
}

case class L2NormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(DoubleType, containsNull)
    case _ => ArrayType(DoubleType, containsNull = true)
  }

  private lazy val typeCode: Int =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType => L2NormalizeExpr.TDouble
      case FloatType => L2NormalizeExpr.TFloat
      case LongType => L2NormalizeExpr.TLong
      case IntegerType => L2NormalizeExpr.TInt
      case ShortType => L2NormalizeExpr.TShort
      case ByteType => L2NormalizeExpr.TByte
      case t => throw new IllegalArgumentException(
        s"l2_normalize: unsupported element type $t")
    }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType | LongType | IntegerType
        | ShortType | ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"l2_normalize expects array<numeric> input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    L2NormalizeExpr.normalize(input.asInstanceOf[ArrayData], typeCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.L2NormalizeExpr.normalize($c, $typeCode)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
