package graft.similarity

import graft.Query

/** Embedding similarity search (brute-force cosine top-k, LSH/IVF
  * variants) — filled in incrementally.
  */
object SimilarityQueries {
  def all: Seq[Query] = Seq()
}
