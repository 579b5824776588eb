package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench outlier guard (r15 verdict #1): three rounds running,
  * same-code bench records disagreed per-query by up to 55x (x35 0.42
  * vs 23.04 s) because min-of-3 still loses when every rep lands in a
  * contended window. The guard compares each query's min against the
  * prior committed record and re-runs bounded retries; these tests pin
  * the two pure pieces — the baseline parser over the exact
  * BENCH_FULL.json layout Bench writes, and the anomaly rule's
  * boundaries (3x AND +1 s absolute; failures never retried).
  */
class BenchGuardSpec extends AnyFunSuite {

  test("parseBaseline reads the queries object of a BENCH_FULL record") {
    val json = """{"metric":"total","value":204.7,"unit":"sec",""" +
      """"queries":{"q1_revenue_by_month":0.412,"x35_cdc_apply":0.42,""" +
      """"x58_betweenness":14.22},"flaky":[],"full":"/x.json",""" +
      """"sf":"/root/testdata/sf0.1","reps":3,""" +
      """"samples":{"q1_revenue_by_month":[0.5,0.412,0.6]}}"""
    val b = Bench.parseBaseline(json)
    assert(b === Map("q1_revenue_by_month" -> 0.412,
      "x35_cdc_apply" -> 0.42, "x58_betweenness" -> 14.22))
  }

  test("parseBaseline is tolerant of junk") {
    assert(Bench.parseBaseline("") === Map.empty)
    assert(Bench.parseBaseline("{\"metric\":\"total\"}") === Map.empty)
    assert(Bench.parseBaseline("not json at all") === Map.empty)
    // unparseable value drops that key only
    val b = Bench.parseBaseline("""{"queries":{"a":1.5,"b":oops}}""")
    assert(b === Map("a" -> 1.5))
  }

  test("anomaly rule: both 3x and +1s absolute must hold") {
    // the x35 case: 23.04 vs 0.42 committed — anomalous
    assert(Bench.isAnomalous(23.04, Some(0.42)))
    // sub-second jitter: 4x ratio but under the +1 s floor — not
    assert(!Bench.isAnomalous(0.4, Some(0.1)))
    // big absolute but under 3x: a 14 s query drifting to 20 s — not
    assert(!Bench.isAnomalous(20.0, Some(14.2)))
    // exactly at the 3x boundary is NOT anomalous (strict >)
    assert(!Bench.isAnomalous(1.26, Some(0.42)))
    // just past both bounds is
    assert(Bench.isAnomalous(1.43, Some(0.42)))
  }

  test("anomaly rule: failures and missing baselines never retry") {
    assert(!Bench.isAnomalous(-1.0, Some(0.42)))
    assert(!Bench.isAnomalous(23.04, None))
    assert(!Bench.isAnomalous(23.04, Some(-1.0)))
  }
}
