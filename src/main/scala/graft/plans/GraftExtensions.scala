package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, SortedIntersectSize}

/** Session extensions exposing graft's native expressions to SQL text, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the Column API.
  *
  * Register with either
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `GraftExtensions.install(builder)`.
  *
  * Scope note (SURVEY.md §7 "Custom Catalyst work: none required"): every
  * reference operator maps to Spark built-ins, so this deliberately stops at
  * function injection — no custom Rule/Strategy is planned unless an operator
  * shows up that composition can't express.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectFunction(GraftExtensions.sortedIntersectDescriptor)
  }
}

object GraftExtensions {

  private[plans] val cosineSimDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, "cosine_sim"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"cosine_sim expects 2 arguments, got ${args.length}")
      CosineSimilarity(args(0), args(1))
    })

  private[plans] val sortedIntersectDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_intersect_size"),
    new ExpressionInfo(classOf[SortedIntersectSize].getName, null, "sorted_intersect_size"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"sorted_intersect_size expects 2 arguments, got ${args.length}")
      SortedIntersectSize(args(0), args(1))
    })

  /** Programmatic alternative when the session already exists (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(cosineSimDescriptor, sortedIntersectDescriptor).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
