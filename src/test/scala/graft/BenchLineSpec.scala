package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the LAST 2000 characters of Bench stdout
  * (sbt's trailing "[success] Total time" line included) and parses the
  * JSON line out of that tail. Round 5's full per-query median map grew
  * past the window with 89 registry queries and the round's bench
  * artifact recorded `parsed: null` — a whole round of timings lost.
  * This spec statically bounds the line for the CURRENT registry, in
  * the worst case (every query failed: longest names in the error list,
  * every headline median printed as null), so registry growth can never
  * silently re-break the contract.
  *
  * Parsing uses [[TinyJson]], not json4s: json4s is present only via
  * Spark's unmanaged jar directory, and a test must not depend on an
  * undeclared artifact of the Spark image (ADVICE r7 #1).
  */
class BenchLineSpec extends AnyFunSuite {
  private val budget = 1800 // 2000-char tail minus sbt's trailing lines

  private def line(results: Seq[(String, Option[Double])],
      contended: Boolean = false): String =
    Bench.stdoutLine(
      results,
      headlineSet = QueryRegistry.all.filter(_.headline).map(_.name).toSet,
      loadAvgJson = "31.999",
      passesOut = "BENCH_PASSES.json",
      sfDir = "/root/testdata/sf0.1",
      epochMs = 4102444800000L,
      contended = contended)

  test("worst case (all queries failed, contended) fits the driver's tail window") {
    val allFailed = QueryRegistry.all.map(_.name -> (None: Option[Double]))
    val l = line(allFailed, contended = true)
    assert(l.length <= budget, s"stdout line ${l.length} chars > $budget")
  }

  test("all-success with wide medians fits the tail window") {
    val wide = QueryRegistry.all.map(_.name -> Option(8888.888))
    val l = line(wide)
    assert(l.length <= budget, s"stdout line ${l.length} chars > $budget")
  }

  test("the line is valid JSON with the contract fields") {
    val l = line(QueryRegistry.all.map(_.name -> Option(1.234)))
    val j = TinyJson.parse(l).obj
    Seq("metric", "value", "unit", "queries", "sf").foreach(k =>
      assert(j.contains(k), s"stdout line lost contract field $k"))
    val qs = j("queries").obj.keySet
    assert(qs == QueryRegistry.all.filter(_.headline).map(_.name).toSet,
      "stdout queries map must carry exactly the headline set")
  }

  test("errors_truncated flag appears exactly when the 8-item cap bites") {
    val names = QueryRegistry.all.map(_.name)
    val manyFailed = line(names.map(_ -> (None: Option[Double])))
    val jm = TinyJson.parse(manyFailed).obj
    assert(jm("errors").arr.size == 8)
    assert(jm("errors_truncated") == TinyJson.JBool(true),
      "capped error list must carry the in-band truncation flag")
    assert(jm("n_errors").num == names.size.toDouble)
    val fewFailed = line(names.map(n =>
      n -> (if (n == names.head) None else Option(1.0))))
    val jf = TinyJson.parse(fewFailed).obj
    assert(!jf.contains("errors_truncated"),
      "flag must be absent when the error list is complete")
  }

  test("contended flag is in-band only when set") {
    val ok = QueryRegistry.all.map(_.name -> Option(1.0))
    assert(!TinyJson.parse(line(ok)).obj.contains("contended"),
      "quiet-box line must not carry the flag")
    assert(TinyJson.parse(line(ok, contended = true))
      .obj("contended") == TinyJson.JBool(true),
      "mostly-contended run must flag the artifact in-band")
  }

  test("headline set stays bounded so the line can never outgrow the window") {
    val n = QueryRegistry.all.count(_.headline)
    assert(n >= 10 && n <= 20, s"headline set drifted to $n queries")
  }
}
