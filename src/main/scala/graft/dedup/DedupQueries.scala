package graft.dedup

import graft.Query

/** Deduplication operators (exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, embedding-cosine) — filled in incrementally.
  */
object DedupQueries {
  def all: Seq[Query] = Seq()
}
