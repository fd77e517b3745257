package graft.dedup

import graft.SparkSuite
import graft.functions.HashFunctions
import org.apache.spark.sql.functions._

/** Bit-parity pins for the round-16 min-hash loop kernels against the
  * built-in compositions they replaced (one `array_min(transform(…))`
  * per rehash; `size(array_intersect(a, b))`) — so every dd_ oracle
  * hash is unchanged by the swap. Both kernels contract on non-null
  * long elements, which is what shingleHashes produces.
  */
class HashKernelsSpec extends SparkSuite {

  import DedupQueries.{hashParams, MinhashP}

  /** Real shingle arrays from the sf0.001 corpus, empty ones included
    * (the production pipeline filters size > 0 AFTER min-hashing is
    * planned, so the kernel must honor the empty-array rule too).
    */
  private def sh = {
    val t = graft.Tables(spark, sf("sf0.001"))
    DedupQueries.dupCorpus(t).select(col("doc_id"),
      DedupQueries.shingleHashesComposed(col("text")).as("sh"))
  }

  test("MinHashes == array_min(transform) per rehash, bit for bit") {
    val diff = sh.select(
      HashFunctions.minHashes(col("sh"), hashParams, MinhashP).as("k"),
      DedupQueries.minHashesComposed.as("c"))
      .filter(not(col("k") <=> col("c")))
    assert(diff.count() == 0)
  }

  test("MinHashes of an empty array is all-null (the array_min-of-empty rule)") {
    val row = spark.range(1)
      .select(HashFunctions.minHashes(
        array().cast("array<long>"), hashParams, MinhashP).as("k"))
      .head().getSeq[Any](0)
    assert(row.length == hashParams.length && row.forall(_ == null))
  }

  test("IntersectSize == size(array_intersect) on corpus shingle pairs") {
    val a = sh.limit(40).select(col("doc_id").as("ia"), col("sh").as("sa"))
    val b = sh.limit(40).select(col("doc_id").as("ib"), col("sh").as("sb"))
    val diff = a.crossJoin(b).select(
      HashFunctions.intersectSize(col("sa"), col("sb")).as("k"),
      size(array_intersect(col("sa"), col("sb"))).as("c"))
      .filter(not(col("k") <=> col("c")))
    assert(diff.count() == 0)
  }

  test("IntersectSize counts DISTINCT common values, duplicates collapse") {
    val got = spark.sql(
      """select array(1L,1L,2L,9L) a, array(1L,2L,2L,3L) b
        |union all select array(5L), array()
        |union all select array(), array()""".stripMargin)
      .select(
        HashFunctions.intersectSize(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.forall { case (k, c) => k == c })
    assert(got.map(_._1).sorted.sameElements(Array(0, 0, 2)))
  }

  test("kernels match their interpreted eval (codegen off)") {
    val cols = Seq(
      HashFunctions.minHashes(col("sh"), hashParams, MinhashP).as("m"),
      HashFunctions.intersectSize(col("sh"), reverse(col("sh"))).as("i"))
    val on = sh.select(cols: _*).collect().map(_.toString).sorted
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = sh.select(cols: _*).collect().map(_.toString).sorted
      assert(on.sameElements(off))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
