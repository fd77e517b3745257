package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.jdk.CollectionConverters._

class MaintenanceSpec extends SparkSuite {

  test("compactParquet merges a fragmented directory, values preserved") {
    val dir = Files.createTempDirectory("compact").resolve("frag").toString
    val t   = Tables(spark, sf("sf0.001"))
    t.lineitem.repartition(50).write.mode("overwrite").parquet(dir)

    def parquetFiles = Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
    assert(parquetFiles == 50)
    val before = t.lineitem.count()

    Maintenance.compactParquet(spark, dir, targetBytes = 64L << 20)

    assert(parquetFiles < 5, s"still $parquetFiles files after compaction")
    val after = spark.read.parquet(dir)
    assert(after.count() == before)
    assert(after.agg(sum(col("l_quantity"))).head.getDouble(0) ==
      t.lineitem.agg(sum(col("l_quantity"))).head.getDouble(0))
  }

  test("swapDirs never loses data: failed swap-in rolls the original back") {
    val base = Files.createTempDirectory("swap")
    val dst  = base.resolve("data").toString
    val t    = Tables(spark, sf("sf0.001"))
    t.region.write.mode("overwrite").parquet(dst)
    val before = spark.read.parquet(dst).count()

    // tmp does NOT exist -> the second rename fails mid-swap; the
    // original must be restored at dst (crash-window regression test
    // for the old delete-then-rename ordering, which would lose it)
    intercept[java.io.IOException] {
      Maintenance.swapDirs(spark, base.resolve("missing").toString, dst)
    }
    assert(spark.read.parquet(dst).count() == before,
      "original directory lost after failed swap")
    // and no stale backup left behind blocking the next attempt
    val nation = base.resolve("v2").toString
    t.nation.write.mode("overwrite").parquet(nation)
    Maintenance.swapDirs(spark, nation, dst)
    assert(spark.read.parquet(dst).count() == t.nation.count())
  }
}
