package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one JVM-wide session via
  * getOrCreate; suites must not stop() it).
  */
trait SparkSuite extends AnyFunSuite {
  // local[4, 2]: 4 threads, TWO task attempts — a retry-capable
  // scheduler so FaultRecoverySpec can demonstrate the reference's R6
  // semantics (failed task recreated, output identical). Fault-free
  // suites never hit the second attempt.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf(name: String): String = s"/root/testdata/$name"
}
