package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Conv, Expression, ExpressionInfo, Literal, Md5, Remainder, ShiftLeft, ShiftRight, Substring}
import org.apache.spark.sql.types.{LongType, StringType}

import graft.functions.{CosineSimilarity, GraftFunctions, SortedIntersectSize}

/** Session extensions exposing graft's native expressions to SQL text, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the Column API.
  *
  * Register with either
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `GraftExtensions.install(builder)`.
  *
  * Scope note (SURVEY.md §7 "Custom Catalyst work: none required"): every
  * reference operator maps to Spark built-ins, so this deliberately stops at
  * function injection, the TABLE-VALUED serving faces
  * ([[GraftTableFunctions]]: bm25_topk / dedup_exact_marks / lm_ppl /
  * ann_topk), plus
  * ONE analyzer rule — [[AsOfSqlRule]], which makes the as-of join (the one
  * whole-operator semantic a single expression can't carry) reachable from
  * SQL text via the `asof_on` marker; see [[AsOfSql]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
    GraftTableFunctions.all.foreach(ext.injectTableFunction)
    ext.injectResolutionRule(AsOfSqlRule)
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

  /** Column-COMPOSITION functions (zOrder2, hashSplitBucket build expression
    * trees rather than being single Expressions): the SQL registration
    * builds the SAME tree from catalyst nodes directly — a Column built tree
    * carries unresolved function nodes that a registry builder may not hand
    * back into analysis. GraftExtensionsSpec asserts SQL ≡ Column API, so
    * the two constructions cannot drift. Tuning args must be literals,
    * exactly like Spark's own `round(x, 2)`. */
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an INT literal, got $other")
  }

  private def zOrderNExpr(cols: Seq[Expression], bits: Int): Expression = {
    val n = cols.size
    require(n >= 2, s"zorder needs >= 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"need 1 <= bits and n*bits <= 63, got n=$n bits=$bits")
    val mask = Literal((1L << bits) - 1)
    val masked = cols.map(c => BitwiseAnd(Cast(c, LongType), mask))
    val placed: Seq[Expression] = (0 until bits).flatMap { i =>
      masked.zipWithIndex.map { case (c, j) =>
        ShiftLeft(BitwiseAnd(ShiftRight(c, Literal(i)), Literal(1L)), Literal(n * i + j))
      }
    }
    placed.reduce(BitwiseOr(_, _))
  }

  private def zOrder2Expr(a: Expression, b: Expression, bits: Int): Expression =
    zOrderNExpr(Seq(a, b), bits)

  private[plans] val zOrderDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("zorder2"),
    new ExpressionInfo(GraftFunctions.getClass.getName, null, "zorder2"),
    (args: Seq[Expression]) => {
      require(args.length == 2 || args.length == 3,
        s"zorder2 expects (a, b[, bits]), got ${args.length} arguments")
      zOrder2Expr(args(0), args(1),
        if (args.length == 3) litInt(args(2), "zorder2 bits") else 16)
    })

  /** N-column Morton interleave from SQL text: `zorder_n(c1, c2, ..., bits)`
    * — last argument is the per-column bit width (INT literal), matching the
    * Column API's [[GraftFunctions.zOrderN]] layout bit-for-bit. */
  private[plans] val zOrderNDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("zorder_n"),
    new ExpressionInfo(GraftFunctions.getClass.getName, null, "zorder_n"),
    (args: Seq[Expression]) => {
      require(args.length >= 3,
        s"zorder_n expects (col1, col2, ..., bits), got ${args.length} arguments")
      zOrderNExpr(args.init, litInt(args.last, "zorder_n bits"))
    })

  private[plans] val hashSplitDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hash_split_bucket"),
    new ExpressionInfo(GraftFunctions.getClass.getName, null, "hash_split_bucket"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        s"hash_split_bucket expects (key, n_buckets), got ${args.length} arguments")
      val n = litInt(args(1), "hash_split_bucket n_buckets")
      Cast(Remainder(
        Cast(Conv(Substring(Md5(Cast(args(0), StringType)), Literal(1), Literal(8)),
          Literal(16), Literal(10)), LongType),
        Literal(n.toLong)), LongType)
    })

  private[plans] val asofOnDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("asof_on"),
    new ExpressionInfo(classOf[AsOfSql.AsOfOn].getName, null, "asof_on"),
    (args: Seq[Expression]) => AsOfSql.AsOfOn(args))

  /** The typed-Aggregator surface (§2.11), reachable from SQL text:
    * `bottom_k(order_key, payload, k)` — bounded-state deterministic group
    * sample, k a literal like Spark's own `approx_percentile` accuracy arg.
    * Built through the same udaf() wrapper the Column API uses, so SQL and
    * Scala cannot drift (GraftExtensionsSpec asserts ≡). */
  private[plans] val bottomKDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bottom_k"),
    new ExpressionInfo(classOf[graft.functions.BottomK].getName, null, "bottom_k"),
    (args: Seq[Expression]) => {
      require(args.length == 3, s"bottom_k expects (key, payload, k), got ${args.length}")
      val k = litInt(args(2), "bottom_k k")
      require(k >= 1, "bottom_k k must be >= 1")
      org.apache.spark.sql.GraftBridge.udafExpression(new graft.functions.BottomK(k),
        org.apache.spark.sql.Encoders.product[graft.functions.BottomK.In], args.take(2))
    })

  private[plans] val all = Seq(
    cosineSimDescriptor, sortedIntersectDescriptor, zOrderDescriptor,
    zOrderNDescriptor, hashSplitDescriptor, asofOnDescriptor, bottomKDescriptor)

  /** Programmatic alternative when the session already exists (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    GraftTableFunctions.register(spark)
  }
}
