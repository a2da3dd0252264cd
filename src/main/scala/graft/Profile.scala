package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Ops-grade query introspection: walk an EXECUTED plan's SQL metrics
  * and return the numbers an operator actually observed — scan output
  * rows, shuffle records/bytes written, spill sizes, broadcast sizes.
  * This is what a pipeline's monitoring hooks read to alert on "the
  * nightly join suddenly shuffled 40× more rows": plan-shape asserts
  * catch regressions at review time, metric deltas catch them in
  * production. Works through AQE wrappers (final plan + materialized
  * stages).
  */
object Profile {

  case class OpMetric(operator: String, metric: String, value: Long)

  /** Flatten the executed plan through adaptive wrappers. */
  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
    case q: QueryStageExec        => p +: walk(q.plan)
    case _                        => p +: p.children.flatMap(walk)
  }

  /** Collect every populated SQL metric of an already-executed
    * DataFrame (run an action first; unexecuted metrics read 0). */
  def metrics(df: DataFrame): Seq[OpMetric] =
    walk(df.queryExecution.executedPlan).flatMap { op =>
      op.metrics.toSeq.collect {
        case (name, m) if m.value > 0 =>
          OpMetric(op.nodeName, name, m.value)
      }
    }

  /** Sum of a metric across operators whose node name contains `op`. */
  def total(df: DataFrame, op: String, metric: String): Long =
    metrics(df).filter(m => m.operator.contains(op) && m.metric == metric)
      .map(_.value).sum
}
