package graft

/** Targeted logger hygiene for the harness mains.
  *
  * The registry's five answer-sized unpartitioned windows (see
  * RegistrySpec's allowlist — year grids, top-k vocab slices, calendar
  * rollups) fire WindowExec's "No Partition Defined" warning on every
  * materialization, flooding a bench run's tail with hundreds of lines
  * and burying any genuinely suspicious warning. Detection duty for a
  * NEW unpartitioned window (a real all-to-one-partition scale cliff)
  * lives in RegistrySpec's plan-shape guard, which fails `sbt test`
  * outright — strictly stronger than a log line — so the logger itself
  * can go quiet. Scoped to exactly the WindowExec class, not the window
  * package: WindowGroupLimitExec and friends keep their voices. */
object QuietLogs {
  def silenceKnownBoundedWindowWarning(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
