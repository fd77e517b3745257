package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the corpus-clean pipeline
  * (graft.dedup.DedupQueries's `dd_clean_corpus`): documents arrive
  * continuously (a crawl, an upload queue), each batch is quality-
  * gated and deduplicated against everything already admitted within
  * the watermark horizon, and only kept documents flow to the sink —
  * ingestion-time corpus hygiene instead of nightly batch rewrites.
  *
  * Scale notes: the quality gate is stateless and runs in the scan
  * stage. Dedup state is one entry per admitted content hash (16
  * bytes + timestamp) within the watermark — bounded by ingest rate ×
  * horizon, sharded by hash across executors (skew-free by
  * construction). The full text never enters the state store; only
  * the md5 key does.
  */
object DocumentStreams {

  case class Doc(doc_id: Long, text: String, ingest_ts: java.sql.Timestamp)

  /** Quality gate + exact content dedup within a watermark horizon.
    * Batch-equivalent semantics: quality verdict matches `tx_quality`'s
    * token band (10..2000 tokens), dedup keeps the FIRST-arriving copy
    * of each content hash (the streaming analog of dd_exact's min
    * doc_id representative — arrival order replaces id order).
    */
  def cleanStream(docs: DataFrame, horizon: String = "10 minutes"): DataFrame = {
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    docs
      .withColumn("n_tokens", size(toks))
      .filter(col("n_tokens").between(10, 2000))
      .withColumn("content_md5", md5(col("text")))
      .withWatermark("ingest_ts", horizon)
      .dropDuplicatesWithinWatermark("content_md5")
      .select(col("doc_id"), col("content_md5"), col("n_tokens"),
        col("ingest_ts"))
  }
}
