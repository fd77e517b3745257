package graft.core

import org.apache.spark.Partitioner
import org.apache.spark.sql.{Dataset, SparkSession}

import scala.collection.mutable

/** The reference's user-programmable surface (`mapreduce/idl/
  * mapReduce.idl:34-84`), as Scala traits over Spark.
  *
  * Records are string pairs because every concrete reference
  * implementation is string-monomorphic (SURVEY §1.1); the traits stay
  * generic in spirit via plain Scala composition — a user needing typed
  * records uses the DataFrame/Dataset API directly.
  */
trait Mapper extends Serializable {
  /** IDL `Mapper.map` (`idl/mapReduce.idl:70-73`): 1 record → 0..N pairs. */
  def map(key: String, value: String): IterableOnce[(String, String)]
}

/** IDL `Reducer.reduce` (`idl/mapReduce.idl:76-79`). Values arrive in
  * merge-dependent order exactly as in the reference (SURVEY §7.4#4) —
  * implementations must not assume an ordering. When used as a combiner
  * the function must be associative and commutative (the reference
  * imposes the same unchecked contract by defaulting the combiner to
  * the reducer, `schedule/MasterServant.java:198-201`).
  */
trait Reducer extends Serializable {
  def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)]
}

/** IDL `Partitioner.getPartition` (`idl/mapReduce.idl:82-84`) plus the
  * Java-side sort comparator the reference attaches to it
  * (`servant/PartitionerServant.java:25-33`).
  */
trait KeyPartitioner extends Serializable {
  def getPartition(key: String, numPartitions: Int): Int
  def comparator: Ordering[String] = Ordering.String
}

/** Default partitioner: Java `String.hashCode` modulo n — file-layout
  * parity with `servant/PartitionerServant.java:20-23`, minus its
  * `Math.abs(Integer.MIN_VALUE)` crash (`floorMod` is total).
  */
object JavaHashPartitioner extends KeyPartitioner {
  override def getPartition(key: String, n: Int): Int =
    math.floorMod(key.hashCode, n)
}

/** Generic map/combine/partition/sort/shuffle/merge/reduce runner — the
  * whole reference pipeline (SURVEY §2.1 O5–O13) as one Spark job.
  *
  * Physical mapping:
  *  - map (O5): `flatMap` over the input scan, pipelined, no
  *    materialization — same iterator chaining as
  *    `MapTaskServant.doRun` but whole-stage friendly.
  *  - combine (O8): optional per-input-partition in-memory group+reduce
  *    before the shuffle (the reference's sort+combine-on-flush,
  *    `BufferOutputCollectorServant.java:116-175`) — bounds shuffle
  *    bytes at #distinct-keys per partition.
  *  - partition+sort+merge (O6,O7,O11):
  *    `repartitionAndSortWithinPartitions` with the user partitioner
  *    and its comparator — Spark's sort-shuffle spills where the
  *    reference OOMs (SURVEY §7.4#6).
  *  - group+reduce (O12): single adjacent-group scan over the sorted
  *    partition stream, identical to `ReduceTaskServant.java:263-301`.
  *
  * The RDD layer is used deliberately here (SURVEY §7.3): an arbitrary
  * user partition function + user comparator + streaming grouped reduce
  * is genuine per-partition imperative logic. Jobs expressible as
  * algebraic aggregations should use the DataFrame API / `Aggregator`
  * instead and get Catalyst's partial aggregation for free.
  */
object MapReduceJob {

  def run(
      spark: SparkSession,
      conf: JobConf,
      mapper: Mapper,
      reducer: Reducer,
      partitioner: KeyPartitioner = JavaHashPartitioner,
      format: graft.sources.KVFormat = graft.sources.TokenKVFormat,
  ): Unit =
    format.write(
      transform(spark, conf, mapper, reducer, partitioner, format), conf)

  /** The dataflow without the sink — exposed for tests and composition. */
  def transform(
      spark: SparkSession,
      conf: JobConf,
      mapper: Mapper,
      reducer: Reducer,
      partitioner: KeyPartitioner = JavaHashPartitioner,
      format: graft.sources.KVFormat = graft.sources.TokenKVFormat,
  ): Dataset[(String, String)] = {
    import spark.implicits._

    val records = format.read(spark, conf)
    val mapped  = records.flatMap { case (k, v) => mapper.map(k, v) }

    if (conf.numReducers == 0) {
      // O10 map-only: no partition/sort/shuffle, streams straight out
      // (`servant/DirectOutputCollectorServant.java`).
      mapped
    } else {
      val combined =
        if (conf.combine) mapped.mapPartitions(it => combinePartition(it, reducer))
        else mapped

      val sparkPartitioner = new Partitioner {
        override def numPartitions: Int = conf.numReducers
        override def getPartition(key: Any): Int =
          partitioner.getPartition(key.asInstanceOf[String], conf.numReducers)
      }
      implicit val ord: Ordering[String] = partitioner.comparator

      val reduced = combined.rdd
        .repartitionAndSortWithinPartitions(sparkPartitioner)
        .mapPartitions(it => groupAdjacent(it).flatMap { case (k, vs) =>
          reducer.reduce(k, vs.iterator)
        })
      spark.createDataset(reduced)
    }
  }

  /** Map-side combine: group this partition's output in memory and run
    * the reducer-as-combiner over each group. Uses a hash map rather
    * than the reference's sort (equivalent for its contract-bound
    * associative+commutative reducers, and cheaper than sorting).
    */
  private def combinePartition(
      it: Iterator[(String, String)], reducer: Reducer): Iterator[(String, String)] = {
    val groups = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    it.foreach { case (k, v) =>
      groups.getOrElseUpdate(k, mutable.ArrayBuffer.empty[String]) += v
    }
    groups.iterator.flatMap { case (k, vs) => reducer.reduce(k, vs.iterator) }
  }

  /** Adjacent-equal-key grouping over a key-sorted stream — the
    * reference's final reduce scan (`ReduceTaskServant.java:263-301`),
    * lazy so one group at a time is in memory.
    */
  private def groupAdjacent(
      it: Iterator[(String, String)]): Iterator[(String, Seq[String])] =
    new Iterator[(String, Seq[String])] {
      private val buf = it.buffered
      override def hasNext: Boolean = buf.hasNext
      override def next(): (String, Seq[String]) = {
        val key = buf.head._1
        val vs  = mutable.ArrayBuffer.empty[String]
        while (buf.hasNext && buf.head._1 == key) vs += buf.next()._2
        (key, vs.toSeq)
      }
    }
}

/** The one job the reference ships: word count
  * (`user/WordMapperServant.java`, `user/WordReducerServant.java`).
  */
object WordCount {
  /** `WordMapperServant.map`: emit (value, "1") for each token. */
  object TokenMapper extends Mapper {
    override def map(key: String, value: String): IterableOnce[(String, String)] =
      Iterator((value, "1"))
  }

  /** `WordReducerServant.reduce`: sum integer-valued strings — which is
    * exactly what makes it a sound combiner.
    */
  object SumReducer extends Reducer {
    override def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)] = {
      var sum = 0L
      values.foreach(v => sum += v.toLong)
      Iterator((key, sum.toString))
    }
  }

  def run(spark: SparkSession, conf: JobConf): Unit =
    MapReduceJob.run(spark, conf, TokenMapper, SumReducer)
}
