package graft.functions

import org.apache.spark.sql.{Column, GraftBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: |A ∩ B| of two SORTED-ASCENDING, DISTINCT
  * `array<long>` columns, by linear merge walk.
  *
  * This is the dedup-verification hot path (exact-Jaccard over hashed
  * shingle sets runs once per candidate PAIR — millions of evaluations per
  * corpus pass). The built-in `array_intersect` builds a hash set per
  * evaluation and materializes the intersection ARRAY just to take its
  * size; the merge walk is O(n+m) with zero allocation and runs inside
  * whole-stage codegen as a tight primitive loop.
  *
  * CONTRACT: both inputs sorted ascending and duplicate-free — the shape
  * the signature builders produce via `array_sort(array_distinct(...))`
  * (sorting is paid once per DOCUMENT; the walk's savings repeat once per
  * candidate PAIR). Unsorted input silently undercounts — this is an
  * internal engine expression, not a general-purpose function.
  */
case class SortedIntersectSize(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size expects array<bigint> inputs, got (${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; } else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Column API: `sorted_intersect_size($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectSize(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
