package graft.operators

import java.nio.file.Files

import graft.{QueryRegistry, SparkSuite, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order layout: correctness of the bit kernel and the MEASURED
  * data-skipping effect — per-file min/max envelopes must bound BOTH
  * dimensions, so a date-window predicate prunes files that a
  * single-dimension (customer-sorted) layout cannot.
  */
class ZOrderSpec extends SparkSuite {

  private def orders = Tables(spark, sf("sf0.01")).orders

  test("zval2 interleaves bits exactly (reference morton on samples)") {
    def mortonRef(x: Int, y: Int): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z |= (((x >> i) & 1).toLong << (2 * i)) |
          (((y >> i) & 1).toLong << (2 * i + 1))
      z
    }
    val samples = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (1499, 2400),
      (123, 4567), (65535, 0))
    val df = spark.createDataFrame(samples).toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zval2(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getInt(0), r.getInt(1)),
        s"(${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  test("q_zorder_layout buckets bound both dimensions simultaneously") {
    val got = QueryRegistry.byName("q_zorder_layout")
      .run(spark, sf("sf0.01")).collect()
    assert(got.length > 10, "expected a non-trivial bucket count")
    // every 2^16 z-range is a ≤256×256 rectangle in (custkey × day)
    got.foreach { r =>
      assert(r.getAs[Long]("max_ck") - r.getAs[Long]("min_ck") <= 511)
      val d0 = java.time.LocalDate.parse(r.getAs[String]("min_d"))
      val d1 = java.time.LocalDate.parse(r.getAs[String]("max_d"))
      assert(java.time.temporal.ChronoUnit.DAYS.between(d0, d1) <= 511)
    }
  }

  private def filesKeptByDateWindow(dir: String): (Int, Int) = {
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("lo"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("hi"))
      .collect()
    val (w0, w1) = ("1998-03-01", "1998-03-31")
    val kept = perFile.count { r =>
      !(r.getString(1) > w1 || r.getString(2) < w0)
    }
    (kept, perFile.length)
  }

  test("z-ordered files prune on a date window; custkey-sorted files cannot") {
    val day = datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
    val zDir = Files.createTempDirectory("zorder").toString
    val ckDir = Files.createTempDirectory("cksort").toString
    ZOrder.writeZOrdered(orders, zDir, col("o_custkey"), day, 16)
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(ckDir)
    // layout preserves the data
    assert(spark.read.parquet(zDir).count() == orders.count())
    val (zKept, zTotal) = filesKeptByDateWindow(zDir)
    val (ckKept, ckTotal) = filesKeptByDateWindow(ckDir)
    assert(zTotal >= 8 && ckTotal >= 8, s"want real file counts: $zTotal, $ckTotal")
    // single-dim sort: every file spans ~the full date domain
    assert(ckKept >= ckTotal - 1,
      s"custkey-sorted should NOT prune on date ($ckKept/$ckTotal)")
    // z-order: the 30-day window touches a small minority of files
    assert(zKept <= zTotal / 2,
      s"z-order should prune most files on a date window ($zKept/$zTotal)")
  }
}
