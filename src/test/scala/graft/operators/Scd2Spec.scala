package graft.operators

import graft.{QueryRegistry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** ev_scd2 — SCD type-2 history build: per-user version chains must be
  * contiguous and lossless (every event lands in exactly one version,
  * adjacent versions carry different types, valid_to links to the next
  * valid_from), and the whole build must plan exactly ONE hash
  * exchange — the gaps-and-islands chain reuses the user_id clustering
  * end-to-end (PLANS.md section).
  */
class Scd2Spec extends SparkSuite {

  private lazy val rows = QueryRegistry.byName("ev_scd2")
    .run(spark, sf("sf0.001")).collect()

  test("version chains are contiguous, typed-alternating, and lossless") {
    assert(rows.nonEmpty)
    val events = Tables(spark, sf("sf0.001")).events
    val perUser = events.groupBy(col("user_id")).count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("ver"))
      // versions are 1..n with no holes
      assert(sorted.map(_.getAs[Long]("ver")).toSeq == (1L to sorted.length).toSeq)
      // every event is in exactly one version
      assert(sorted.map(_.getAs[Long]("n_events")).sum == perUser(uid))
      // adjacent versions change type; valid_to chains to next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"))
          assert(a.getAs[String]("valid_to") == b.getAs[String]("valid_from"))
          assert(!a.getAs[Boolean]("is_current"))
        case _ => ()
      }
      // exactly the last version is current (and open-ended)
      assert(sorted.last.getAs[Boolean]("is_current"))
      assert(sorted.last.getAs[String]("valid_to") == "current")
    }
  }

  test("plans exactly one hash exchange (windows + island agg share user_id clustering)") {
    val df = QueryRegistry.byName("ev_scd2").run(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    val nHash = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nHash == 1, s"expected 1 hash exchange, got $nHash:\n$plan")
  }
}
