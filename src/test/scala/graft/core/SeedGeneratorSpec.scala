package graft.core

import graft.SparkSuite
import java.nio.file.Files

class SeedGeneratorSpec extends SparkSuite {

  test("generated corpus word counts derive from the printed golden counts") {
    val out = Files.createTempDirectory("seedgen").resolve("t.txt").toString
    val counts = SeedGenerator.generate(50000, out, seed = 7L)
    val conf = JobConf(input = out, output = "/tmp/unused", splitSize = 2048)
    val got = MapReduceJob
      .transform(spark, conf, WordCount.TokenMapper, WordCount.SumReducer)
      .collect().map { case (k, v) => k -> v.toLong }.toMap
    // per-word algebra exactly as in the reference's golden files
    assert(got("e") == counts.sum)
    assert(got("sao") == counts(0) + counts(1))
    assert(got("Goaiania") == counts(0))
    assert(got("Fortaleza") == counts(1))
    assert(got("a") == counts(2))
  }

  test("generation is reproducible per seed and distribution shows the 4/3/3 quirk") {
    val d = Files.createTempDirectory("seedgen2")
    val c1 = SeedGenerator.generate(200000, d.resolve("a.txt").toString, seed = 1L)
    val c2 = SeedGenerator.generate(200000, d.resolve("b.txt").toString, seed = 1L)
    assert(c1.sameElements(c2))
    // sentence 0 is sampled with p=0.4 vs 0.3 — expect a visible excess
    assert(c1(0) > c1(1) && c1(0) > c1(2))
  }
}
