package graft.functions

import org.apache.spark.sql.{Column, GraftBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the `p` squared-L2-NEAREST centroid indices
  * of a numeric array against a driver-side codebook, ascending by
  * distance (ties → lower index) — [[NearestCentroid]]'s multi-probe
  * sibling. This is the map-only form of "rank all centroids per row and
  * keep nProbe": the window alternative materializes an n·k-row cross
  * join plus a per-row shuffle, which is exactly the anti-pattern
  * NearestCentroid was built to kill; here the top-p selection runs as a
  * p-sized insertion pass inside the same tight codegen'd loop (p is the
  * IVF nProbe — small by definition, so insertion beats any heap).
  *
  * Returns `array<int>` of LOCAL indices within `codebooks(group)`,
  * length min(p, centroids). Same contract as NearestCentroid otherwise:
  * codebook embedded once per task via `addReferenceObj`, distances
  * accumulate in double over the common prefix length, out-of-range group
  * throws by construction. */
case class NearestCentroids(
    vec: Expression,
    group: Expression,
    codebooks: CodebookRef,
    p: Int) extends BinaryExpression {

  require(p >= 1, s"nearest_centroids needs p >= 1, got $p")

  override def left: Expression = vec
  override def right: Expression = group
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

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
      s"nearest_centroids expects (array<float|double>, int), got (${vec.dataType}, ${group.dataType})")
  }

  @transient private lazy val cbResolved: Array[Array[Array[Double]]] =
    codebooks.value

  override protected def nullSafeEval(v: Any, g: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val cb = cbResolved(g.asInstanceOf[Int])
    val m = math.min(p, cb.length)
    val bi = new Array[Int](m)
    val bd = new Array[Double](m)
    java.util.Arrays.fill(bd, Double.MaxValue)
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
      // strict < keeps the EARLIER centroid on ties (scan order = index order)
      if (d < bd(m - 1)) {
        var j = m - 1
        while (j > 0 && d < bd(j - 1)) { bd(j) = bd(j - 1); bi(j) = bi(j - 1); j -= 1 }
        bd(j) = d; bi(j) = c
      }
      c += 1
    }
    new GenericArrayData(bi)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // resolve once per operator instance — see NearestCentroid.doGenCode
    val refObj = ctx.addReferenceObj("codebookRef", codebooks,
      "graft.functions.CodebookRef")
    val ref = ctx.addMutableState("double[][][]", "nearestCentroidsCbs",
      v => s"$v = $refObj.value();")
    val get = if (elemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
              else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (v, g) => {
      val cb = ctx.freshName("cb"); val cen = ctx.freshName("cen")
      val m = ctx.freshName("m"); val bi = ctx.freshName("bi"); val bd = ctx.freshName("bd")
      val c = ctx.freshName("c"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      s"""
         |double[][] $cb = $ref[$g];
         |int $m = java.lang.Math.min($p, $cb.length);
         |int[] $bi = new int[$m];
         |double[] $bd = new double[$m];
         |java.util.Arrays.fill($bd, Double.MAX_VALUE);
         |for (int $c = 0; $c < $cb.length; $c++) {
         |  double[] $cen = $cb[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $cen.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = ${get(v, i)} - $cen[$i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bd[$m - 1]) {
         |    int $j = $m - 1;
         |    while ($j > 0 && $d < $bd[$j - 1]) {
         |      $bd[$j] = $bd[$j - 1]; $bi[$j] = $bi[$j - 1]; $j--;
         |    }
         |    $bd[$j] = $d; $bi[$j] = $c;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bi);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, group = newRight)
}

object NearestCentroids {
  /** Column API, flat codebook: the p nearest local indices. */
  def apply(v: Column, codebook: Seq[Seq[Double]], p: Int): Column =
    apply(v, org.apache.spark.sql.functions.lit(0),
      Array(codebook.map(_.toArray).toArray), p)

  /** Column API, grouped codebooks. */
  def apply(v: Column, group: Column, codebooks: Array[Array[Array[Double]]], p: Int): Column =
    apply(v, group, PlainCodebooks(codebooks), p)

  /** Column API over an explicit carrier (plan-embedded or broadcast). */
  def apply(v: Column, group: Column, codebooks: CodebookRef, p: Int): Column =
    ExpressionUtils.column(NearestCentroids(
      ExpressionUtils.expression(v), ExpressionUtils.expression(group), codebooks, p))
}
