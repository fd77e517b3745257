package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's cross-round drift block (r14 verdict ask #6): the
  * judge's normalization is a FIELD now, so its computation — prev
  * sidecar parsing, calibration-ratio lower-median, carried-common
  * totals, normalized ratio — must stay mechanical and regression-
  * proof, including the degraded inputs (no previous file content,
  * pre-calibration sidecars, nulls in the median map).
  */
class BenchDriftSpec extends AnyFunSuite {

  private val prev =
    """{"epoch_ms":111,
       "calibration":{"mr_wordcount":0.200,"q1_pricing_summary":0.400,"q6_forecast_revenue":0.100},
       "drift":{"available":false},
       "medians":{"a":1.000,"b":2.000,"mr_wordcount":0.200,"q1_pricing_summary":0.400,"q6_forecast_revenue":0.100,"gone":5.000,"nullq":null}}"""

  private def parse(json: String): Map[String, String] =
    """"([a-z_]+)":([0-9.]+|true|false|null)""".r.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2)).toMap

  test("factor is the calibration lower-median; carried ratio normalizes by it") {
    // current run: every calibration query exactly 2x slower (factor
    // 2.0), carried board (a, b + calibration) also 2x slower, so the
    // normalized ratio must come back to 1.0
    val results: Seq[(String, Option[Double])] = Seq(
      "a" -> Some(2.0), "b" -> Some(4.0),
      "mr_wordcount" -> Some(0.4), "q1_pricing_summary" -> Some(0.8),
      "q6_forecast_revenue" -> Some(0.2), "new_row" -> Some(9.9),
      "errored" -> None)
    val out = Bench.driftBlock(prev, results)
    assert(out.isDefined, "usable prev text produced no drift block")
    val f = parse(out.get)
    assert(f("available") == "true")
    assert(f("prev_epoch_ms") == "111")
    assert(f("factor") == "2.000")
    // common set: a, b, and the 3 calibration queries — never the
    // vanished query, the new row, the errored row, or prev's null
    assert(f("n_common") == "5")
    assert(f("carried_prev_total") == "3.700")
    assert(f("carried_total") == "7.400")
    assert(f("carried_ratio") == "2.000")
    assert(f("carried_ratio_normalized") == "1.000")
  }

  test("asymmetric drift: code-level change survives the normalization") {
    // box 2x slower (calibration exactly doubles) but the carried
    // board only 1.5x slower -> normalized 0.75: a genuine code win
    val results: Seq[(String, Option[Double])] = Seq(
      "a" -> Some(1.5), "b" -> Some(3.0),
      "mr_wordcount" -> Some(0.4), "q1_pricing_summary" -> Some(0.8),
      "q6_forecast_revenue" -> Some(0.2))
    val f = parse(Bench.driftBlock(prev, results).get)
    assert(f("factor") == "2.000")
    assert(f("carried_ratio_normalized") ==
      Bench.r3((1.5 + 3.0 + 0.4 + 0.8 + 0.2) / 3.7 / 2.0))
  }

  test("degraded inputs yield None, never a throw") {
    val results: Seq[(String, Option[Double])] =
      Seq("mr_wordcount" -> Some(0.4))
    assert(Bench.driftBlock("", results).isEmpty)
    assert(Bench.driftBlock("{\"epoch_ms\":5}", results).isEmpty)
    // a pre-calibration sidecar (medians but no calibration block)
    assert(Bench.driftBlock("""{"medians":{"a":1.0}}""", results).isEmpty)
    // calibration present but the current run measured none of them
    assert(Bench.driftBlock(prev, Seq("a" -> Some(1.0))).isEmpty)
  }
}
