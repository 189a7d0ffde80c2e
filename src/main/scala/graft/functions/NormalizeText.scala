package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared normalization pipeline — one static method so the interpreted
  * and codegen paths are the SAME code (no dual-maintenance drift).
  *
  * Steps, in the exact order the DuckDB oracle replays them:
  *   1. line endings: CRLF and lone CR → LF
  *   2. strip C0 control chars except `\n`/`\t`, plus DEL (0x7F)
  *   3. collapse runs of spaces/tabs to ONE space
  *   4. strip leading/trailing `[ \t\n]`
  *   5. Unicode NFC (LAST, so the output is guaranteed composed even when
  *      step 2 removed a control char that sat between a base char and its
  *      combining mark — NFC-first would leave that pair decomposed)
  *
  * NFC is UAX #15 — deterministic and engine-independent (the JDK and
  * DuckDB's utf8proc both implement the same normative tables), which is
  * what makes the op fully oracle-able. NFKC is deliberately NOT used:
  * its compatibility foldings (ﬁ → fi, ² → 2) are lossy edits a curation
  * pipeline should opt into explicitly, not get from "normalize".
  */
object NormalizeTextUtil {
  private val crlf = Pattern.compile("\r\n?")
  private val ctrl = Pattern.compile("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]")
  private val runs = Pattern.compile("[ \t]+")
  private val edges = Pattern.compile("^[ \t\n]+|[ \t\n]+$")

  def normalize(s: String): String = {
    val a = crlf.matcher(s).replaceAll("\n")
    val b = ctrl.matcher(a).replaceAll("")
    val c = runs.matcher(b).replaceAll(" ")
    val d = edges.matcher(c).replaceAll("")
    java.text.Normalizer.normalize(d, java.text.Normalizer.Form.NFC)
  }
}

/** Native codegen expression: canonical text cleanup for ingest
  * (CCNet/RefinedWeb-style preprocessing — the step every downstream
  * token/hash/dedup op assumes has happened, since `"café"` and
  * `"café"` must fingerprint identically). Map-only, stays inside
  * whole-stage codegen; cost is a few linear regex passes per row. */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"normalize_text expects string input, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeTextUtil.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.NormalizeTextUtil.normalize($a.toString()));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  /** Column API: `normalize_text($"text")`. */
  def apply(c: Column): Column =
    ExpressionUtils.column(NormalizeText(ExpressionUtils.expression(c)))
}
