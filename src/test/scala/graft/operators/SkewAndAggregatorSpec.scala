package graft.operators

import graft.{SparkSuite, Tables}
import graft.core.Aggregators
import org.apache.spark.sql.functions._

class SkewAndAggregatorSpec extends SparkSuite {

  test("typed Aggregator word count matches the RDD-path golden counts") {
    import spark.implicits._
    val conf = graft.core.JobConf(
      input = "/root/reference/mapreduce/seed/teste10K.txt", output = "/tmp/unused")
    val pairs = graft.core.TokenFormat.read(spark, conf)
      .flatMap(kv => graft.core.WordCount.TokenMapper.map(kv._1, kv._2))
    val typed = Aggregators.reduceByKey(pairs, Aggregators.sumValueStrings)
      .collect().toMap
    val rdd = graft.core.MapReduceJob
      .transform(spark, conf, graft.core.WordCount.TokenMapper,
        graft.core.WordCount.SumReducer)
      .collect().toMap
    assert(typed == rdd)
  }

  test("typed Aggregator plans map-side partial aggregation (combiner)") {
    import spark.implicits._
    val conf = graft.core.JobConf(
      input = "/root/reference/mapreduce/seed/teste1K.txt", output = "/tmp/unused")
    val pairs = graft.core.TokenFormat.read(spark, conf)
      .flatMap(kv => graft.core.WordCount.TokenMapper.map(kv._1, kv._2))
    val plan = Aggregators.reduceByKey(pairs, Aggregators.sumValueStrings)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial"), s"no partial aggregation in:\n$plan")
  }

  test("saltedCount equals plain groupBy count") {
    val e = Tables(spark, sf("sf0.001")).events
    val plain = e.groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(e, col("event_type"), col("event_id"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val t   = Tables(spark, sf("sf0.001"))
    val e   = t.events
    val dim = e.select(col("event_type")).distinct()
      .withColumn("type_tag", upper(col("event_type")))
    val plain = e.join(dim, "event_type")
      .groupBy(col("type_tag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(e, dim, "event_type", col("event_id"), 8)
      .groupBy(col("type_tag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
