package graft.functions

import org.apache.spark.sql.{Column, GraftBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: A ∩ B CONTENTS of two SORTED-ASCENDING,
  * DISTINCT `array<long>` columns, by linear merge walk — the sibling of
  * [[SortedIntersectSize]] for callers that need the members, not just the
  * cardinality (e.g. triangle counting credits every common out-neighbor).
  *
  * The built-in `array_intersect` builds a hash set PER EVALUATION — on a
  * million-edge pass that is a million transient hash sets plus boxing;
  * this walk is O(n+m), allocates exactly one result array, and runs
  * inside whole-stage codegen. Same contract as the size form: inputs
  * sorted ascending and duplicate-free, or the result silently drops
  * members — an internal engine expression, not a general function.
  */
case class SortedIntersect(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect expects array<bigint> inputs, got (${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (n, m) = (x.numElements(), y.numElements())
    val buf = new Array[Long](math.min(n, m))
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { buf(c) = xv; c += 1; i += 1; j += 1 }
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, c))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val buf = ctx.freshName("buf")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |long[] $buf = new long[$n < $m ? $n : $m];
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; } else if ($xv > $yv) { $j++; }
         |  else { $buf[$c++] = $xv; $i++; $j++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($buf, $c));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {
  /** Column API: `sorted_intersect($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersect(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
