package graft.plans

/** Targeted log filter for WindowExec's execution-time "No Partition
  * Defined" warning.
  *
  * The engine's two deliberate global windows (the q_win_ntile
  * bin-offset pass over an aggregated #bins-row input; historical: the
  * IVF seed-ranking window, since restructured away) are
  * cardinality-bounded by construction, yet WindowExec re-warns on
  * every materialization — hundreds of identical lines per bench/test
  * run that bury any REAL unbounded global window. Constant-key
  * partition specs can't silence it either: the optimizer eliminates
  * foldable/constant window partition expressions outright.
  *
  * So the runtime warning is demoted to the logger it belongs to:
  * suppressed at the log4j2 level for the WindowExec logger ONLY.
  * This loses nothing — [[ScaleLintRule]] already flags every global
  * window over an UNBOUNDED producer at plan time (fail mode in CI,
  * warn mode in bench), with the bounded-producer allowance encoded
  * structurally instead of by log-reader memory. The plan-aware lint
  * is strictly a stronger detector than the anonymous runtime line.
  */
object LogHygiene {

  @volatile private var applied = false

  /** Raise the WindowExec logger to ERROR (idempotent, safe if log4j2
    * is absent — e.g. under a different slf4j backend).
    */
  def suppressBoundedWindowWarn(): Unit = {
    if (applied) return
    applied = true
    try {
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        org.apache.logging.log4j.Level.ERROR)
    } catch { case _: Throwable => () }
  }
}
