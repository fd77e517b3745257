package graft.core

import org.apache.spark.TaskContext

/** Fault-injection doubles for demonstrating the engine's task-retry
  * correctness — the reference's recovery layer (R6: failed tasks
  * recreated and re-queued, `schedule/WorkerInitializer.java:434-469`)
  * is Spark's task retry; these mappers let a job exercise it
  * deterministically. Run with a retry-capable master, e.g.
  * `SPARK_MASTER=local[4,2]` (second number = task retries).
  */
object FaultInjection {

  /** Word-count mapper whose partition 0 throws on its first attempt,
    * then succeeds on retry. Results must equal the fault-free run —
    * the same pass criterion as the reference's manual fault tests
    * (report `data/scs_relatorio_final.pdf` §5).
    */
  object FlakyWordMapper extends Mapper {
    override def map(key: String, value: String): IterableOnce[(String, String)] = {
      val ctx = TaskContext.get()
      if (ctx != null && ctx.partitionId() == 0 && ctx.attemptNumber() == 0) {
        throw new RuntimeException(
          "injected fault: first attempt of partition 0")
      }
      WordCount.TokenMapper.map(key, value)
    }
  }
}
