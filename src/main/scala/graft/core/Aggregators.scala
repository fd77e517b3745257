package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (SURVEY §7.3): the recommended reduce
  * path for algebraic reducers. Unlike the generic [[Reducer]] (which
  * sees the full value iterator and therefore can only pre-combine when
  * the caller asserts associativity), an `Aggregator`'s shape makes
  * the combiner contract structural — `merge` IS the combiner — so
  * Catalyst always plans partial aggregation (the reference's O8)
  * map-side, and the shuffle carries one buffer per key per partition.
  */
object Aggregators {

  /** Word count's reducer (`user/WordReducerServant.java:24-40`) as a
    * typed aggregator: sums integer-valued strings.
    */
  val sumValueStrings: Aggregator[(String, String), Long, String] =
    new Aggregator[(String, String), Long, String] {
      override def zero: Long = 0L
      override def reduce(b: Long, a: (String, String)): Long = b + a._2.toLong
      override def merge(b1: Long, b2: Long): Long = b1 + b2
      override def finish(r: Long): String = r.toString
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** Reduce a keyed dataset with a typed aggregator — the engine's
    * `reduceByKey` for the string-pair record model.
    */
  def reduceByKey[B](ds: Dataset[(String, String)],
      agg: Aggregator[(String, String), B, String]): Dataset[(String, String)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1).agg(agg.toColumn).map { case (k, v) => (k, v) }
  }
}
