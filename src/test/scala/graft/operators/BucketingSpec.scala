package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both join sides on the join
  * key lets Spark plan the join with NO exchange on either side — the
  * shuffle happens once at write time and is amortized over every
  * subsequent join (the at-scale answer for repeatedly-joined fact
  * tables).
  */
class BucketingSpec extends SparkSuite {

  test("join of co-bucketed tables plans no shuffle exchange") {
    val t  = Tables(spark, sf("sf0.001"))
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // the in-memory catalog forgets tables across JVMs but their files
    // persist; clear the locations so saveAsTable can recreate them
    Seq("li_bucketed", "ord_bucketed").foreach { tbl =>
      val dir = new java.io.File(s"/tmp/graft-test-warehouse/$tbl")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    t.lineitem.select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    t.orders.select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    // and it computes the same thing as the unbucketed join
    val n  = joined.count()
    val n0 = t.lineitem.join(t.orders,
      col("l_orderkey") === col("o_orderkey")).count()
    assert(n == n0)
  }
}
