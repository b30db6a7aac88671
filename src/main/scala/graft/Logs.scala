package graft

/** Log hygiene for the driver mains (Bench/Verify/Plans/ConcurrentBench).
  *
  * Three registered queries intentionally run an UNPARTITIONED window on
  * an already-reduced frame (t18's per-source count frame, Strata's
  * exact global ntile behind the `spark.graft.approx` escape hatch,
  * c47's day-span suffix sums) — each is provably tiny at any SF (the
  * size arguments live at the call sites), but Spark's WindowExec warns
  * per task attempt, and at 221 queries x warm-up+runs the flood buries
  * every real warning in the bench/gate logs (the r14 BENCH tail was
  * 100% this line). Scope the silence to exactly that logger, in the
  * MAINS only — tests and library code keep full logging, so a NEW
  * unpartitioned window still surfaces in the suite.
  */
object Logs {
  def quietTinyFrameWindowWarnings(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // logging config must never kill a run
}
