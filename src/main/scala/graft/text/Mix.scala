package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Corpus mixing and sampling — the data-recipe stage of a training
  * pipeline (choose proportions per source/language/quality bucket,
  * sample deterministically, tag provenance).
  *
  * Sampling is hash-based, not `rand()`-based: a row is kept when
  * `xxhash64(id, salt) mod 1e6 < fraction·1e6`. That makes every
  * sample reproducible (same salt ⇒ same rows), stable under
  * recomputation/retries (no per-task RNG state), and consistent
  * across engines — properties `df.sample()` cannot give. All
  * operators are narrow (filter on a hash) — no shuffle.
  */
object Mix {

  private val M = 1000000L

  /** Deterministic Bernoulli sample of `fraction` by hashing `idCol`. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(
      pmod(xxhash64(col(idCol), lit(salt)), lit(M)) < (fraction * M).toLong)
  }

  /** Stratified sample: per-stratum fractions over `strataCol`
    * (e.g. per-language caps). Unlisted strata are dropped.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], salt: Long = 0L): DataFrame = {
    val frac = fractions.foldLeft(lit(-1.0)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.withColumn("__frac", frac)
      .filter(col("__frac") >= 0 &&
        pmod(xxhash64(col(idCol), lit(salt)), lit(M)) <
          (col("__frac") * M).cast("long"))
      .drop("__frac")
  }

  /** Weighted mix of named corpora: each source is hash-sampled to its
    * weight and tagged with a `mix_source` provenance column, then
    * unioned. Columns are aligned by name across sources.
    */
  def weighted(sources: Seq[(String, DataFrame, Double)], idCol: String,
      salt: Long = 0L): DataFrame = {
    require(sources.nonEmpty)
    val cols = sources.head._2.columns.toSeq
    sources.map { case (name, df, w) =>
      hashSample(df.select(cols.map(col): _*), idCol, w, salt)
        .withColumn("mix_source", lit(name))
    }.reduce(_ unionAll _)
  }
}
