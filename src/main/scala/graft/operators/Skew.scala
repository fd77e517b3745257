package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (AQE's skew-join handles
  * sort-merge joins at runtime; these cover the two shapes AQE does
  * not: skewed broadcast-side-too-big joins and skewed aggregations
  * with expensive per-group state).
  *
  * Both are salt-based: the hot key space is multiplied by a salt so
  * one reducer's work spreads over `nSalts` tasks, at the cost of a
  * second (tiny) aggregation step or a small-side replication factor
  * of `nSalts`.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum-style aggregates over a
    * skewed key. Phase 1 aggregates (key, salt) — spreading a hot key
    * over `nSalts` tasks; phase 2 merges the ≤ nSalts partials per key.
    * The salt is derived deterministically from a discriminator column
    * (any roughly-unique column, e.g. an event id), keeping the whole
    * plan replayable.
    */
  def saltedCount(df: DataFrame, key: Column, discriminator: Column,
      nSalts: Int): DataFrame =
    df.groupBy(key.as("key"), pmod(xxhash64(discriminator), lit(nSalts)).as("salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col("key"))
      .agg(sum(col("partial_n")).as("n"))

  /** Salted equi-join of a skewed big side against a small side that is
    * over the broadcast threshold: the big side gets a deterministic
    * salt in [0, nSalts); the small side is replicated once per salt
    * value; the join key becomes (key, salt). A hot key's rows land in
    * nSalts different tasks instead of one straggler.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      discriminator: Column, nSalts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(discriminator), lit(nSalts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
