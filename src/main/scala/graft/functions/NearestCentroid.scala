package graft.functions

import org.apache.spark.sql.{Column, GraftBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: squared-L2 argmin of a numeric array against
  * one of several driver-side codebooks — THE hot inner loop of every
  * quantizer in this engine (two-level semantic cells, PQ encode, IVFADC
  * coarse assignment).
  *
  * Why an Expression and not higher-order functions: the HOF form
  * (`array_min` over `aggregate(zip_with(...))` structs) evaluates an
  * interpreted lambda per element per centroid and allocates a zipped
  * intermediate array per centroid per row — measured ~3-5 s per Lloyd
  * iteration on a 20 k × 64-dim corpus, which made quantizer fits
  * job-count-AND-interpreter-bound. This expression reads columnar
  * `ArrayData` primitives in one tight codegen'd double loop over a
  * codebook held as a plain `double[][][]` reference object (embedded once
  * per task via `addReferenceObj`, never per row), and participates in
  * whole-stage codegen with the enclosing projection.
  *
  * Shape: `codebooks(group)(centroid)(dim)`. `group` selects which codebook
  * this row scans (two-level assignment passes the row's top cell; flat
  * callers pass literal 0). Returns the LOCAL index of the nearest centroid
  * within the selected group (ties → lower index — array_min's struct
  * ordering, replicated exactly). Distances accumulate in double over the
  * common prefix length, matching the HOF semantics it replaces.
  * A group index outside `codebooks` or an empty codebook is an error by
  * construction (callers derive `group` from the same matrix) — this throws
  * rather than guessing.
  */
case class NearestCentroid(
    vec: Expression,
    group: Expression,
    codebooks: CodebookRef) extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = group
  override def dataType: DataType = IntegerType

  private def elemIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val grpOk = group.dataType == IntegerType
    if (vecOk && grpOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects (array<float|double>, int), got (${vec.dataType}, ${group.dataType})")
  }

  @transient private lazy val cbResolved: Array[Array[Array[Double]]] =
    codebooks.value

  override protected def nullSafeEval(v: Any, g: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val cb = cbResolved(g.asInstanceOf[Int])
    var best = 0
    var bestD = Double.MaxValue
    val isF = elemIsFloat
    var c = 0
    while (c < cb.length) {
      val cen = cb(c)
      val n = math.min(x.numElements(), cen.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val xv = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
        val diff = xv - cen(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // resolve the codebook ONCE per operator instance (mutable-state init):
    // for BroadcastCodebooks this is the executor-local broadcast fetch —
    // the plan carries only the handle
    val refObj = ctx.addReferenceObj("codebookRef", codebooks,
      "graft.functions.CodebookRef")
    val ref = ctx.addMutableState("double[][][]", "nearestCentroidCbs",
      v => s"$v = $refObj.value();")
    val get = if (elemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
              else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (v, g) => {
      val cb = ctx.freshName("cb"); val cen = ctx.freshName("cen")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      s"""
         |double[][] $cb = $ref[$g];
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cb.length; $c++) {
         |  double[] $cen = $cb[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $cen.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = ${get(v, i)} - $cen[$i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, group = newRight)
}

object NearestCentroid {
  /** Column API, flat codebook: local argmin index within `codebook`. */
  def apply(v: Column, codebook: Seq[Seq[Double]]): Column =
    apply(v, org.apache.spark.sql.functions.lit(0), Array(codebook.map(_.toArray).toArray))

  /** Column API, grouped codebooks: argmin within `codebooks(group)`. */
  def apply(v: Column, group: Column, codebooks: Array[Array[Array[Double]]]): Column =
    apply(v, group, PlainCodebooks(codebooks))

  /** Column API over an explicit carrier (plan-embedded or broadcast). */
  def apply(v: Column, group: Column, codebooks: CodebookRef): Column =
    ExpressionUtils.column(NearestCentroid(
      ExpressionUtils.expression(v), ExpressionUtils.expression(group), codebooks))
}
