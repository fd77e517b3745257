package graft.core

import java.io.{FileOutputStream, IOException, PrintStream}

/** The reference's progress reporter: a message log written to
  * `mapred.Reporter.file-name` (default `report.debug`,
  * `app/MapReduceApp.java:114`), filtering by execution level — a
  * message is written iff its level ≤ the configured level
  * (`schedule/ReporterServant.java:25-42`; levels: 0 errors, 1 info,
  * 2 debug, `idl/mapReduce.idl:20-24`).
  *
  * Driver-side by design, like the reference's master-side servant;
  * executor-side progress is Spark's own event log/UI domain.
  */
final class Reporter(logName: String, executionLevel: Int) {
  private var ps: PrintStream = _

  /** Open the log file; false (not an exception) on failure, like the
    * servant's `open()`.
    */
  def open(): Boolean =
    try { ps = new PrintStream(new FileOutputStream(logName), true); true }
    catch { case _: IOException => false }

  def close(): Unit = if (ps != null) ps.close()

  def report(level: Int, message: String): Unit = synchronized {
    if (ps != null && level <= executionLevel) ps.print(message + "\n")
  }
}

object Reporter {
  /** Build from job properties with the reference's defaults. */
  def fromProps(props: java.util.Properties): Reporter =
    new Reporter(
      props.getProperty("mapred.Reporter.file-name", "report.debug"),
      props.getProperty("mapred.Reporter.level", "0").toInt)
}
