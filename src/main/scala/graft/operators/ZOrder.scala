package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping: interleaving the bits of two dimensions makes contiguous
  * z-value ranges cover small RECTANGLES of the key space, so a file
  * layout that is range-partitioned and sorted by the z-value carries
  * tight min/max envelopes on BOTH dimensions — parquet/lakehouse
  * readers can then prune files on either predicate. A single-column
  * sort gives this for one dimension only.
  *
  * The kernel is the classic shift-or-mask bit spread (16 bits →
  * every other bit of 32), composed from Spark's codegen'd bitwise
  * built-ins — no UDF, no custom expression needed — with a
  * text-identical SQL twin ([[spread16Sql]]) so the DuckDB oracle
  * computes the same integers.
  */
object ZOrder {

  private val spreadSteps =
    Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Low 16 bits of `c` spread onto the even bit positions. */
  def spread16(c: Column): Column =
    spreadSteps.foldLeft(c.cast("long").bitwiseAND(lit(65535L))) {
      case (v, (sh, mask)) => v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(mask))
    }

  /** Two 16-bit dimensions interleaved into one 32-bit z-value; `x`
    * occupies the even bits, `y` the odd.
    */
  def zval2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** SQL twin of [[spread16]] (DuckDB/ANSI bitwise syntax). */
  def spread16Sql(v: String): String =
    spreadSteps.foldLeft(s"(($v) & 65535)") { case (s, (sh, mask)) =>
      s"((($s) | (($s) << $sh)) & $mask)"
    }

  /** Write `df` laid out along the z-curve of (x, y): range-partition
    * into `nFiles` contiguous z-ranges (one output file each, sort
    * completed within the partition). At 100 TB this is the standard
    * OPTIMIZE-ZORDER shape: one range exchange over the narrow z-value
    * (AQE-sized in a real deployment), no global sort barrier beyond
    * it, and every written file gets a both-dimensions-bounded
    * min/max footer that downstream scans prune on — ZOrderSpec
    * measures the effect vs a single-dimension sort.
    */
  def writeZOrdered(df: DataFrame, dir: String, x: Column, y: Column,
      nFiles: Int): Unit =
    df.withColumn("__z", zval2(x, y))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
