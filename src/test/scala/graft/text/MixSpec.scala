package graft.text

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class MixSpec extends SparkSuite {

  private def docs = Tables(spark, sf("sf0.01")).documents

  test("hashSample is deterministic and near the target fraction") {
    val a = Mix.hashSample(docs, "doc_id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Mix.hashSample(docs, "doc_id", 0.3).collect().map(_.getLong(0)).toSet
    assert(a == b, "same salt must select the same rows")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.08, s"got ${a.size / n}")
    // different salt: a different (but equally sized-ish) subset
    val c = Mix.hashSample(docs, "doc_id", 0.3, salt = 7).collect()
      .map(_.getLong(0)).toSet
    assert(c != a)
  }

  test("hashSample edges: fraction 0 selects nothing, 1 selects everything") {
    assert(Mix.hashSample(docs, "doc_id", 0.0).count() == 0)
    assert(Mix.hashSample(docs, "doc_id", 1.0).count() == docs.count())
  }

  test("hashSample nests: the 10% sample is a subset of the 30% sample") {
    val big   = Mix.hashSample(docs, "doc_id", 0.3).collect().map(_.getLong(0)).toSet
    val small = Mix.hashSample(docs, "doc_id", 0.1).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("stratifiedSample honors per-language fractions and drops others") {
    val out = Mix.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 1.0, "fr" -> 0.5))
    val counts = out.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("en", "fr"))
    assert(counts("en") == full("en"))
    assert(math.abs(counts("fr").toDouble / full("fr") - 0.5) < 0.2)
  }

  test("weighted mix tags provenance and respects weights") {
    val part = docs.filter(col("doc_id") % 2 === 0)
    val rest = docs.filter(col("doc_id") % 2 === 1)
    val mixed = Mix.weighted(Seq(
      ("even", part, 1.0), ("odd", rest, 0.2)), "doc_id")
    val bySrc = mixed.groupBy(col("mix_source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("even") == part.count())
    assert(math.abs(bySrc("odd").toDouble / rest.count() - 0.2) < 0.1)
  }
}
