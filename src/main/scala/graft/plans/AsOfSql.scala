package graft.plans

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression, Unevaluable}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{CTERelationDef, CTERelationRef, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}

import graft.operators.AsOfJoin

/** SQL surface for the point-in-time as-of join (SURVEY §2.6 J2): the one
  * graft operator whose semantics a single expression can't carry, made
  * reachable from `spark.sql(...)` text via a MARKER predicate + analyzer
  * rewrite — standard SQL syntax, no parser fork:
  *
  * {{{
  * SELECT v.*, asof_value, asof_ts
  * FROM views v LEFT JOIN purchases p
  *   ON asof_on(v.user_id, p.user_id, v.ts, p.ts, p.event_id)
  * }}}
  *
  * `asof_on(leftKey, rightKey, leftTime, rightTime, rightTiebreak
  * [, tolerance])` is an unevaluable boolean marker; [[AsOfSqlRule]]
  * (injected by [[GraftExtensions]]) rewrites any LEFT JOIN whose entire ON
  * clause is the marker into the plan built by [[AsOfJoin.backward]] — the
  * identical union-then-window shape as the Column API (single key shuffle,
  * no row explosion), so SQL text and library calls cannot drift. The
  * optional `tolerance` is a string literal interval (e.g. `'7 days'`).
  *
  * Contract (checked, clear errors): LEFT (outer) join only — as-of attach
  * preserves every left row, null asof when no match; the ON clause is
  * exactly one `asof_on` call; key/time/tiebreak arguments are plain
  * columns, one side each. Output = every left column (original
  * qualifiers preserved) + each right column except the right key as
  * `asof_<name>` — reference them unqualified in the SELECT.
  */
object AsOfSql {

  /** Boolean marker predicate; never evaluated — [[AsOfSqlRule]] must
    * rewrite it away, and analysis fails loudly if it survives outside a
    * join ON clause (Unevaluable). */
  case class AsOfOn(children: Seq[Expression]) extends Expression with Unevaluable {
    require(children.length == 5 || children.length == 6,
      "asof_on expects (leftKey, rightKey, leftTime, rightTime, rightTiebreak[, tolerance])")
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  private def attr(e: Expression, what: String): AttributeReference = e match {
    case a: AttributeReference => a
    case other => throw new IllegalArgumentException(
      s"asof_on: $what must be a plain column reference, got $other")
  }

  private def sideOf(a: Attribute, left: LogicalPlan, right: LogicalPlan,
      what: String): Boolean =
    if (left.outputSet.contains(a)) true
    else if (right.outputSet.contains(a)) false
    else throw new IllegalArgumentException(
      s"asof_on: $what ($a) resolves to neither join side")

  /** Rewrite one marked Join into the as-of plan; left exprIds preserved so
    * outer references already resolved against the left side keep working. */
  private[plans] def rewrite(spark: SparkSession, left: LogicalPlan,
      right: LogicalPlan, m: AsOfOn): LogicalPlan = {
    val Seq(lkE, rkE, ltE, rtE, tbE) = m.children.take(5)
    val (lk, rk, lt, rt, tb) =
      (attr(lkE, "leftKey"), attr(rkE, "rightKey"), attr(ltE, "leftTime"),
        attr(rtE, "rightTime"), attr(tbE, "rightTiebreak"))
    // argument sides must match the declared roles
    Seq((lk, "leftKey", true), (lt, "leftTime", true), (rk, "rightKey", false),
      (rt, "rightTime", false), (tb, "rightTiebreak", false)).foreach {
      case (a, what, expectLeft) =>
        val isLeft = sideOf(a, left, right, what)
        require(isLeft == expectLeft,
          s"asof_on: $what ($a) must come from the ${if (expectLeft) "left" else "right"} side")
    }
    val tolerance = m.children.drop(5).headOption.map {
      case Literal(s, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"asof_on: tolerance must be a string literal interval, got $other")
    }

    val ldf = GraftBridge.ofRows(spark, left)
    val rdf = GraftBridge.ofRows(spark, right)
    val out = AsOfJoin.backward(ldf, rdf,
      leftKey = lk.name, rightKey = rk.name,
      leftTime = lt.name, rightTime = rt.name,
      rightTiebreak = tb.name,
      rightValueCols = rdf.columns.filterNot(_ == rk.name).toSeq,
      tolerance = tolerance)
    val rewritten = out.queryExecution.analyzed
    // left columns come first in backward's output, in left-column order:
    // alias them back to the ORIGINAL exprIds/qualifiers so outer
    // references resolved before this rewrite fires still bind
    val (newLeft, newAsof) = rewritten.output.splitAt(left.output.length)
    val stitched: Seq[NamedExpression] = left.output.zip(newLeft).map {
      case (old, nw) =>
        Alias(nw, old.name)(exprId = old.exprId, qualifier = old.qualifier)
    } ++ newAsof
    Project(stitched, rewritten)
  }
}

/** Analyzer rule: LEFT JOIN ... ON asof_on(...) → [[AsOfJoin.backward]]'s
  * plan. Runs in the resolution fixpoint, so `asof_*` output columns
  * referenced by the enclosing SELECT resolve on the next iteration.
  *
  * CTE note: a `WITH`-defined join input arrives as a [[CTERelationRef]]
  * leaf whose definition lives in an enclosing WithCTE node — outside the
  * subtree handed to the rewrite. The refs are inlined (definition body +
  * a projection restoring the ref's exprIds — the InlineCTE expansion)
  * before the rewrite, so the spliced plan is self-contained; un-rewritten
  * refs elsewhere in the query keep their WithCTE bookkeeping. */
case class AsOfSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def inlineCteRefs(plan: LogicalPlan,
      defs: Map[Long, CTERelationDef]): LogicalPlan = {
    var cur = plan
    // fixpoint bounded by the def count: an inlined body may itself contain
    // refs (WITH a AS ..., b AS (SELECT ... FROM a))
    var rounds = defs.size + 1
    while (rounds > 0 && cur.exists(_.isInstanceOf[CTERelationRef])) {
      cur = cur.transformUp {
        case ref: CTERelationRef if defs.contains(ref.cteId) =>
          val d = defs(ref.cteId)
          Project(d.child.output.zip(ref.output).map { case (o, nw) =>
            Alias(o, nw.name)(exprId = nw.exprId, qualifier = nw.qualifier)
          }, d.child)
      }
      rounds -= 1
    }
    cur
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    lazy val cteDefs: Map[Long, CTERelationDef] =
      plan.collect { case d: CTERelationDef => d.id -> d }.toMap
    plan.resolveOperatorsUp {
      case Join(l, r, LeftOuter, Some(m: AsOfSql.AsOfOn), _)
          if l.resolved && r.resolved && m.childrenResolved =>
        AsOfSql.rewrite(spark, inlineCteRefs(l, cteDefs), inlineCteRefs(r, cteDefs), m)
      case j @ Join(_, _, jt, Some(m: AsOfSql.AsOfOn), _)
          if jt != LeftOuter && j.childrenResolved && m.childrenResolved =>
        throw new IllegalArgumentException(
          s"asof_on: only LEFT (outer) join is supported (as-of attach preserves " +
            s"every left row); got join type $jt")
      // asof_on buried inside a larger condition (e.g. `ON asof_on(...) AND
      // x = y`) matches neither branch above; without this catch-all the
      // Unevaluable marker survives analysis and dies later with an opaque
      // planning error — fail HERE with the actual contract instead
      case j: Join
          if j.childrenResolved && j.condition.exists(c =>
            !c.isInstanceOf[AsOfSql.AsOfOn] &&
              c.exists(_.isInstanceOf[AsOfSql.AsOfOn])) =>
        throw new IllegalArgumentException(
          "asof_on must be the ENTIRE ON clause of a LEFT JOIN (it already " +
            "carries the key equality and the time ordering); fold extra " +
            "predicates into the join inputs or a WHERE on the result instead " +
            s"of combining them with asof_on: ${j.condition.get.sql}")
    }
  }
}
