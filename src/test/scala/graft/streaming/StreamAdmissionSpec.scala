package graft.streaming

import graft.{QueryRegistry, SparkSuite}

/** Pins dd_stream_admission's serving contract: the streaming screen
  * returns rows IDENTICAL to the batch CDC screen (one banding, one
  * confirm, one persisted index under both), and a re-run replays the
  * backlog deterministically (stateless serving — no cross-batch
  * state to drift).
  */
class StreamAdmissionSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("streaming admission equals the batch CDC screen, and replays") {
    val streamed =
      QueryRegistry.byName("dd_stream_admission").run(spark, dir).collect()
    val batch =
      QueryRegistry.byName("dd_minhash_cdc").run(spark, dir).collect()
    assert(streamed.sameElements(batch),
      "streaming admission diverges from the batch screen")
    val again =
      QueryRegistry.byName("dd_stream_admission").run(spark, dir).collect()
    assert(again.sameElements(streamed), "replay is not deterministic")
  }
}
