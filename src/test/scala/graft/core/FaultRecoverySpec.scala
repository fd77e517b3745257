package graft.core

import graft.SparkSuite
import org.apache.spark.TaskContext

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** The reference's R5/R6 fault-tolerance semantics demonstrated on the
  * real retry scheduler (SparkSuite runs `local[4, 2]` — two task
  * attempts): an injected first-attempt failure must leave output
  * IDENTICAL to the fault-free run — the same pass criterion as the
  * reference's manual fault tests (report §5) — both for the
  * MapReduce dataflow and for the V2 token writer's commit protocol
  * (the reference's new-id/new-files rule,
  * `schedule/WorkerInitializer.java:434-469`).
  */
class FaultRecoverySpec extends SparkSuite {

  test("R6 map task: injected first-attempt failure ⇒ fault-free-identical output") {
    val dir = Files.createTempDirectory("graft-fault")
    Files.write(dir.resolve("in.txt"),
      "a a b c a b d c a ".getBytes(StandardCharsets.UTF_8))
    val conf = JobConf(input = dir.resolve("in.txt").toString,
      output = "/unused", numReducers = 2)
    val clean = MapReduceJob
      .transform(spark, conf, WordCount.TokenMapper, WordCount.SumReducer)
      .collect().sorted
    val flaky = MapReduceJob
      .transform(spark, conf, FaultInjection.FlakyWordMapper, WordCount.SumReducer)
      .collect().sorted
    assert(clean.nonEmpty && flaky.sameElements(clean))
  }

  test("V2 writer: failed first write attempt ⇒ exactly-once committed files") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-fault-w").toString + "/out"
    val pairs = (1 to 200).map(i => (s"k${i % 5}", s"v$i"))
    val flaky = pairs.toDF("key", "value").repartition(2)
      .as[(String, String)]
      .mapPartitions { it =>
        val ctx = TaskContext.get()
        var n = 0
        it.map { kv =>
          n += 1
          // fail MID-FILE on the first attempt of partition 0, so the
          // aborted attempt has already streamed bytes into its
          // attempt-unique temp file — the case where a shared output
          // file would corrupt
          if (n == 10 && ctx != null && ctx.partitionId() == 0 &&
              ctx.attemptNumber() == 0)
            throw new RuntimeException("injected fault: first write attempt")
          kv
        }
      }
      .toDF("key", "value")
    flaky.write.format("graft-token").mode("append").save(out)
    val files = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(files.count(_.startsWith("part-")) == 2,
      s"exactly one committed file per partition: ${files.mkString(",")}")
    assert(!files.exists(_.startsWith("_")), "no temp litter after commit")
    val back = spark.read.format("graft-token").load(out)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(back.sorted == pairs.sorted,
      "retried attempt must replace, not duplicate, the failed attempt's rows")
  }
}
