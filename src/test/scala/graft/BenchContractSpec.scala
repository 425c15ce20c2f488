package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** The driver reads BENCH output by parsing JSON out of the LAST ~2000
  * characters of stdout (rounds 2-4 produced unparseable benches by
  * overflowing that tail). This spec renders the compact contract line
  * under worst-case conditions — max query count, long names, every
  * query failed — and asserts it still fits a 2000-char tail whole and
  * parses, failure lists capped but the true count preserved.
  */
class BenchContractSpec extends AnyFunSuite {

  private val results = (1 to 118).map { i =>
    (f"q$i%03d_some_very_long_query_name", 3.14159, 12.345)
  }

  test("compact contract line survives a 2000-char stdout tail, even all-failed") {
    // worst case: mass failure AND mass runaway (both lists capped)
    val failed = results.map(_._1).toList
    val runaway = results.map(_._1).toList
    // worst-case calibration list: start + interior probe per CalibEvery
    // queries + end (133 queries → 5 samples; 6 pins extra headroom).
    val calib = Seq(1.01, 9.87, 10.44, 0.45, 12.01, 0.39)
    val line = Bench.compactLine(results, failed, runaway, calib,
      "/root/testdata/sf0.1", "32")
    assert(line.length <= 1800, s"contract line too long: ${line.length} chars")

    // simulate the driver: noisy stdout, contract line last, keep the tail.
    val tail = ("log noise " * 500 + "\n" + line).takeRight(2000)
    val start = tail.indexOf("{\"metric\":\"total\"")
    assert(start >= 0, "contract line must start inside the tail")
    val parsed = JsonMethods.parse(tail.substring(start))

    assert((parsed \ "metric") === JString("total"))
    assert((parsed \ "queries_run") === JInt(118))
    assert((parsed \ "failed_count") === JInt(118))
    val JArray(shown) = (parsed \ "failed"): @unchecked
    assert(shown.length === 5, "failed list must be capped in the compact line")
    val JObject(qs) = (parsed \ "queries"): @unchecked
    assert(qs.length === 31, "slowest-31 cap")
    // round-9 ambient-detection fields: runaway marker (capped + true
    // count) and the interleaved calibration samples (round 10: start +
    // every-CalibEvery + end), parsed back exactly as
    // tools/bench_diff.py reads them — ALL samples, since bench_diff
    // judges contamination on the worst one.
    assert((parsed \ "runaway_count") === JInt(118))
    val JArray(run) = (parsed \ "runaway"): @unchecked
    assert(run.length === 5, "runaway list must be capped in the compact line")
    val JArray(got) = (parsed \ "calib_s"): @unchecked
    assert(got === calib.map(c => JDouble(BigDecimal(c).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // the probe's clean value depends on the configured parallelism,
    // so the line must say which one it ran at (bench_diff keys its
    // per-cpus clean calibration values on this).
    assert((parsed \ "cpus") === JString("32"))
  }

  test("median re-runs cover only the noisy slow tier, never runaways") {
    // fast tier: single shot (re-runs would double the bench for nothing)
    assert(Bench.rerunsFor(0.5) === 0)
    assert(Bench.rerunsFor(Bench.MedianRerunSec) === 0)
    // slow tier: GC/contention noise is real here — median-of-3
    assert(Bench.rerunsFor(3.0) === 2)
    assert(Bench.rerunsFor(19.9) === 2)
    // runaway: a first run this slow is a plan defect, not noise;
    // re-running it triples its damage (q39 r7: 21 s became ~3.5 min)
    assert(Bench.rerunsFor(Bench.RunawayCapSec) === 0)
    assert(Bench.rerunsFor(70.0) === 0)
  }

  test("detail line keeps the full failure list and every query") {
    val failed = results.map(_._1).take(50).toList
    val detail = Bench.detailLine(results, failed, List("q9_run"),
      Seq(1.0, 1.1), "sfX", "4")
    val parsed = JsonMethods.parse(detail)
    val JArray(f) = (parsed \ "failed"): @unchecked
    assert(f.length === 50)
    val JObject(qs) = (parsed \ "queries"): @unchecked
    assert(qs.length === 118)
    val JArray(run) = (parsed \ "runaway"): @unchecked
    assert(run === List(JString("q9_run")), "detail keeps the full runaway list")
  }
}
