package graft.functions

import org.apache.spark.sql.{Column, GraftBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass whitespace tokenizer — the fused form of the composition
  * every tokenize pass here ran per document:
  *
  * {{{
  *   when(length(trim(text)) === 0, array().cast("array<string>"))
  *     .otherwise(split(trim(text), "\\s+"))
  * }}}
  *
  * That form trims TWICE (no CSE across the `when` branches), converts the
  * UTF8String to a java.lang.String, runs a java.util.regex split, and
  * re-wraps every token — per document, on the hottest corpus pass the
  * LM/DSIR/BM25/dedup families share (measured: the q202 build's tokenize
  * stage was 70 s of task time at sf0.1, the single largest stage of the
  * lifecycle). This expression produces the identical token array in one
  * byte scan with zero String conversions: Java's `\s` class is exactly
  * ASCII `[ \t\n\x0B\f\r]`, whose bytes can never occur inside a UTF-8
  * multi-byte sequence, so the scan is byte-wise safe.
  *
  * PARTICIPATES IN WHOLE-STAGE CODEGEN (a static-helper call, the built-in
  * expressions' pattern): the composition it replaces was fully codegen, so
  * a CodegenFallback here would have split every surrounding stage into
  * interpreted projection — measured 0.5–0.8× on the BM25/phrase serve
  * family before the codegen path was added.
  *
  * Bit-identity with the composition (pinned in WsTokensSpec):
  *  - `trim` removes leading/trailing 0x20 SPACE bytes only;
  *  - an all-space / empty input yields an EMPTY array (the `when` branch);
  *  - Java `split(regex, -1)` semantics otherwise: a leading separator run
  *    emits a leading EMPTY token, a trailing run (tab/newline surviving
  *    the space-only trim) emits a trailing EMPTY token, consecutive
  *    separators collapse;
  *  - null input → null.
  */
object WsTokens {
  def apply(text: Column): Column =
    ExpressionUtils.column(WsTokensExpr(ExpressionUtils.expression(text)))
}

object WsTokensExpr {
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** The tokenize kernel — called from both interpreted eval and generated
    * code (static forwarder), never null input. */
  def tokenize(u: UTF8String): ArrayData = {
    val bytes = u.getBytes
    // trim: SPACE (0x20) only — Spark's trim default
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    if (lo == hi) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var tokStart = lo
    var i = lo
    while (i < hi) {
      if (isWs(bytes(i))) {
        out += UTF8String.fromBytes(bytes, tokStart, i - tokStart)
        i += 1
        while (i < hi && isWs(bytes(i))) i += 1
        tokStart = i
      } else i += 1
    }
    // limit = -1 keeps a trailing empty token when the (space-trimmed)
    // string ends in a non-space separator run
    out += UTF8String.fromBytes(bytes, tokStart, hi - tokStart)
    new GenericArrayData(out.toArray)
  }
}

case class WsTokensExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens expects a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    WsTokensExpr.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WsTokensExpr.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
