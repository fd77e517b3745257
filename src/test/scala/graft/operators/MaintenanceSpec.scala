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
}
