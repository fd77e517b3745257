package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark query over the test tables plus
  * (when SQL-expressible) an equivalent ANSI SQL oracle that the driver
  * runs in DuckDB on the same parquet files.
  *
  * Contract (see SparkEntry): output column NAMES must be identical
  * between `run` and `oracle` — the driver sorts columns by name and
  * hashes values. Doubles are rounded on BOTH sides so that the two
  * engines' (order-sensitive) float summation agrees bit-for-bit after
  * rounding.
  */
final case class Query(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** headline queries are timed by Bench */
    headline: Boolean = false,
    /** For queries whose `run` executes driver-coordinated RDD jobs
      * EAGERLY (two-level prefix sum, distributed rank method): the
      * returned DataFrame's plan is a trivial local/parallelized tail,
      * so Explain and the plan lints audit THIS lazily-planned
      * intermediate instead — the range exchange + sort stage carrying
      * the query's real distributed work. None for ordinary queries,
      * whose `run` result is itself the auditable plan.
      */
    eagerPlan: Option[(SparkSession, String) => DataFrame] = None,
)

/** Central inventory — every module contributes its queries here; the
  * SURVEY.md §2 operator checklist maps onto these names.
  */
object QueryRegistry {
  def all: Seq[Query] =
    operators.MapReduceQueries.all ++
      operators.Relational.all ++
      operators.Events.all ++
      text.TextQueries.all ++
      dedup.DedupQueries.all ++
      similarity.SimilarityQueries.all ++
      multimodal.Multimodal.all ++
      streaming.StreamingQueries.all

  lazy val byName: Map[String, Query] = {
    val qs = all
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs.map(q => q.name -> q).toMap
  }
}
