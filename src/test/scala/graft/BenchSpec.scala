package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the bench harness's pure logic — the committed
  * snapshot is the round's only performance evidence, so the rules that
  * decide what gets re-measured (and what the round-over-round field
  * compares) are pinned here rather than trusted to the 25-minute run.
  */
class BenchSpec extends AnyFunSuite {

  test("isolation flagging: spread-over-median above floors, or a P90 outlier") {
    val p90 = 1.2
    // stable fast query: never flagged
    assert(!Bench.unstable(w = 0.4, ws = 0.39, c = 2.0, cs = 1.0, p90))
    // wall spread > median but UNDER the 1s floor: jitter, not flagged
    assert(!Bench.unstable(w = 0.8, ws = 0.9, c = 2.0, cs = 1.0, p90))
    // wall spread > median at the floor: flagged
    assert(Bench.unstable(w = 1.0, ws = 1.1, c = 0.0, cs = 0.0, p90))
    // wall spread exactly equal to median: NOT flagged (strict >)
    assert(!Bench.unstable(w = 1.5, ws = 1.5, c = 0.0, cs = 0.0, p90))
    // CPU spread > CPU median under the 5s CPU floor: not flagged
    assert(!Bench.unstable(w = 0.5, ws = 0.1, c = 4.0, cs = 4.5, p90))
    // CPU spread > CPU median at the floor: flagged
    assert(Bench.unstable(w = 0.5, ws = 0.1, c = 5.0, cs = 5.5, p90))
    // slow-but-stable outlier past 3x P90: flagged by the outlier clause
    assert(Bench.unstable(w = 3 * p90 + 0.01, ws = 0.0, c = 0.0, cs = 0.0, p90))
    assert(!Bench.unstable(w = 3 * p90, ws = 0.0, c = 0.0, cs = 0.0, p90))
  }

  test("prev-snapshot CPU medians parse from the committed JSON shape") {
    val dir = Files.createTempDirectory("graft_bench_prev")
    val f = dir.resolve("bench_full.json")
    Files.write(f,
      ("""{"metric":"total","value":1.0,"queries":{"a":9.9},""" +
        """"queries_cpu":{"q1_pricing_summary":1.234,"graph_bfs":32.090,"neg":-1.0},""" +
        """"spread_cpu":{"q1_pricing_summary":0.1}}""").getBytes("UTF-8"))
    val m = Bench.prevCpuMedians(f.toString)
    assert(m === Map("q1_pricing_summary" -> 1.234, "graph_bfs" -> 32.09,
      "neg" -> -1.0))
    // the cpu_vs_prev consumer drops non-positive priors; the parser
    // itself must not silently drop keys
    assert(m.values.exists(_ < 0))
    // a missing or malformed file reads as empty, never throws
    assert(Bench.prevCpuMedians(dir.resolve("absent.json").toString) === Map.empty)
    val junk = dir.resolve("junk.json")
    Files.write(junk, "not json at all".getBytes("UTF-8"))
    assert(Bench.prevCpuMedians(junk.toString) === Map.empty)
  }

  test("cpu regression rule: >1.5x over prev with both medians above 2s, worst-first") {
    val prev = Map("big_up" -> 10.0, "small_up" -> 0.5, "boundary" -> 4.0,
      "down" -> 20.0, "new_key" -> 3.0, "just_over_floor" -> 2.5)
    val cur = Map("big_up" -> 40.0,      // 4.0x, both > 2s: flagged
      "small_up" -> 5.0,                 // 10x but prev 0.5 <= 2s: jitter, not flagged
      "boundary" -> 6.0,                 // exactly 1.5x: NOT flagged (strictly greater)
      "down" -> 5.0,                     // improvement: not flagged
      "brand_new" -> 50.0,               // no prior: nothing to regress from
      "just_over_floor" -> 4.0)          // 1.6x, both > 2s: flagged
    val got = Bench.cpuRegressions(cur, prev)
    assert(got === Seq("big_up" -> 4.0, "just_over_floor" -> 1.6))
    assert(Bench.cpuRegressions(Map.empty, prev) === Seq.empty)
    assert(Bench.cpuRegressions(cur, Map.empty) === Seq.empty)
  }

  test("contention rule: >1.5x calibration CPU drift in EITHER direction") {
    // steady machine: not contended
    assert(!Bench.calibContended(10.0, 10.0))
    assert(!Bench.calibContended(10.0, 14.9))
    // load at run START that cleared by run end (round 12's artifact)
    assert(Bench.calibContended(18.17, 9.94))
    // load arriving MID-run: the other direction must trigger too
    assert(Bench.calibContended(9.94, 18.17))
    // exactly 1.5x: NOT contended (strictly greater)
    assert(!Bench.calibContended(15.0, 10.0))
    assert(!Bench.calibContended(10.0, 15.0))
    // unavailable CPU counters (0 on non-HotSpot JVMs) never trigger
    assert(!Bench.calibContended(0.0, 18.0))
    assert(!Bench.calibContended(18.0, 0.0))
    // drift stamp: symmetric ratio, 0 when counters unavailable
    assert(Bench.calibDrift(18.0, 9.0) === 2.0)
    assert(Bench.calibDrift(9.0, 18.0) === 2.0)
    assert(Bench.calibDrift(0.0, 9.0) === 0.0)
  }

  test("isolation set: spread-flagged UNION cpu-regressed, ordered, capped, tail named") {
    // regressed keys not already flagged append AFTER the spread list
    assert(Bench.isolationSet(Seq("a", "b"), Seq("b", "c"), 32) ===
      ((Seq("a", "b", "c"), Seq.empty)))
    // a consistent regression with a tight spread still gets isolated —
    // the round-12 gap (emb_margin_pairs et al. flagged-but-unmeasured)
    assert(Bench.isolationSet(Seq.empty, Seq("consistent_regression"), 32) ===
      ((Seq("consistent_regression"), Seq.empty)))
    // cap splits; the dropped tail is returned for naming, never lost
    assert(Bench.isolationSet(Seq("a", "b", "c"), Seq("d"), 2) ===
      ((Seq("a", "b"), Seq("c", "d"))))
    assert(Bench.isolationSet(Seq.empty, Seq.empty, 32) ===
      ((Seq.empty, Seq.empty)))
  }
}
