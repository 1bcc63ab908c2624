package graft.plans

import org.apache.spark.sql.SparkSession
import scala.annotation.tailrec

import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join,
  LocalLimit, LogicalPlan, Project, SubqueryAlias, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer-injected scale guardrail: flags logical-plan shapes that run
  * fine at test scale and melt at 100 TB —
  *
  *  - a Window with an ORDER BY but NO PARTITION BY over raw (non-
  *    aggregated) data — the whole dataset moves through a single task;
  *    the reason q_win_ntile is a two-pass rewrite. A global window
  *    directly over an Aggregate output is the deliberate "small global
  *    pass" pattern (e.g. cumulative offsets over bins) and is allowed;
  *  - an INNER join with no condition at all — the accidental cartesian
  *    (an explicit crossJoin states intent and is left alone).
  *
  * Mode via `spark.graft.scalelint` (session conf, default `off` so the
  * engine never changes behavior unless asked): `warn` logs each finding
  * once per plan, `fail` throws ScaleLintViolation — the CI posture, so a
  * scale-killer cannot merge silently. Registered by GraftExtensions
  * (`injectOptimizerRule`), so `spark.sql.extensions` users get it for
  * free. The rule never rewrites anything — read-only inspection.
  */
case class ScaleLintRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def mode: String =
    spark.conf.get(ScaleLint.ConfKey, "off").toLowerCase

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val m = mode
    if (m == "warn" || m == "fail") {
      val findings = ScaleLint.findings(plan)
      findings.foreach { f =>
        if (m == "fail") throw new ScaleLint.ScaleLintViolation(f)
        else logWarning(s"[scalelint] $f")
      }
    }
    plan
  }
}

object ScaleLint {

  val ConfKey = "spark.graft.scalelint"

  final class ScaleLintViolation(msg: String) extends RuntimeException(
    s"$msg (set $ConfKey=warn to log instead, or off to disable)")

  /** The window's input with row-preserving unary nodes peeled off —
    * "directly over an Aggregate" must mean the direct producer chain,
    * not "an Aggregate exists SOMEWHERE below" (a tiny aggregate joined
    * to a huge raw table must not suppress the finding).
    */
  @tailrec private def producer(p: LogicalPlan): LogicalPlan = p match {
    case n: Project       => producer(n.child)
    case n: Filter        => producer(n.child)
    case n: SubqueryAlias => producer(n.child)
    case n: LocalLimit    => producer(n.child)
    case other            => other
  }

  /** Pure inspection — returns a message per scale-killer found. */
  def findings(plan: LogicalPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          !producer(w.child).isInstanceOf[Aggregate] =>
        out += ("global window (ORDER BY with no PARTITION BY) over " +
          "non-aggregated data moves the whole dataset through one task: " +
          w.windowExpressions.map(_.sql).mkString(", ").take(120))
      case j: Join if j.condition.isEmpty && j.joinType == Inner =>
        out += "condition-less inner join plans a cartesian product"
      case _ =>
    }
    out.result()
  }
}
