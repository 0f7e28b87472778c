package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Bench per-query regression gate (VERDICT r4 #7): a deliberately
  * slowed query must be flagged against its recorded baseline median; noise
  * on sub-100ms queries and environments without a baseline must not.
  * Pure-function tests — no SparkSession, the gate logic is exactly what
  * Bench.main wires to its JSON output and strict exit.
  */
class BenchGateSpec extends AnyFunSuite {

  test("a deliberately slowed query is flagged at >3x its baseline") {
    val baseline = Map("q125_winnow_overlap" -> 0.88, "q01_project" -> 0.10)
    // the r4 driver anomaly, replayed: 25.5 s against a 0.88 s baseline
    val medians = Map("q125_winnow_overlap" -> 25.5, "q01_project" -> 0.11)
    val slow = Bench.slowQueries(medians, baseline)
    assert(slow.keySet == Set("q125_winnow_overlap"))
    assert(slow("q125_winnow_overlap") == ((25.5, 0.88)))
  }

  test("below the 3x factor or the 0.5s absolute floor nothing is flagged") {
    val baseline = Map("qa" -> 2.0, "qb" -> 0.02, "qc" -> 1.0)
    val medians = Map(
      "qa" -> 5.9, // 2.95x < 3x
      "qb" -> 0.4, // 20x a 20ms baseline, but under the 0.5s noise floor
      "qc" -> -1.0) // failed marker, never compared
    assert(Bench.slowQueries(medians, baseline).isEmpty)
    // and just past both thresholds it IS flagged
    assert(Bench.slowQueries(Map("qa" -> 6.1), baseline).keySet == Set("qa"))
    assert(Bench.slowQueries(Map("qb" -> 0.6), baseline).keySet == Set("qb"))
  }

  test("queries without a baseline entry (new this round) are not flagged") {
    val slow = Bench.slowQueries(Map("q_new" -> 99.0), Map("q_old" -> 1.0))
    assert(slow.isEmpty)
  }

  test("loadBaseline parses the flat medians file and tolerates absence") {
    val f = java.io.File.createTempFile("bench_baseline", ".json")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath,
      """{"q01_project":0.0963,"q125_winnow_overlap":0.8045}""")
    val b = Bench.loadBaseline(f.getAbsolutePath)
    assert(b == Map("q01_project" -> 0.0963, "q125_winnow_overlap" -> 0.8045))
    assert(Bench.loadBaseline("/nonexistent/path.json").isEmpty)
  }

  test("loadBaseline scoped to the queries object when fed a full bench line") {
    // the review-found hazard: every query name recurs in "spread" with a
    // ratio ~1.0 — a whole-line scan would last-wins overwrite each median
    // with it and flag healthy heavy queries against garbage baselines
    val f = java.io.File.createTempFile("bench_line", ".json")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath,
      """{"metric":"total","value":86.3,"unit":"sec","queries":{"qa":2.5431,"qb":0.1049},""" +
        """"spread":{"qa":1.21,"qb":1.05},"reps":5,"failed":[],"sf":"/x"}""")
    val b = Bench.loadBaseline(f.getAbsolutePath)
    assert(b == Map("qa" -> 2.5431, "qb" -> 0.1049))
  }

  test("loadBaseline prefers the final total line over earlier partials") {
    // Bench now prints "metric":"partial" lines (warmup + per round)
    // BEFORE the final line; a baseline captured as `Bench > file` must
    // bind to the final medians, not the codegen-inflated warmup pass —
    // thresholds set from warmup times would never flag a regression
    val f = java.io.File.createTempFile("bench_stdout", ".json")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath,
      """{"metric":"partial","phase":"warmup","value":153.1,"queries":{"qa":50.1,"qb":9.7},"failed":[],"sf":"/x"}""" + "\n" +
        """{"metric":"partial","phase":"round1","value":12.0,"queries":{"qa":10.2,"qb":1.8},"failed":[],"sf":"/x"}""" + "\n" +
        """{"metric":"total","value":3.1,"unit":"sec","queries":{"qa":2.5,"qb":0.6},"spread":{"qa":1.2,"qb":1.1},"reps":5,"failed":[],"sf":"/x"}""")
    assert(Bench.loadBaseline(f.getAbsolutePath) == Map("qa" -> 2.5, "qb" -> 0.6))
    // a killed run with ONLY partials: the LAST partial wins (closest to
    // steady state), never the warmup line
    val g = java.io.File.createTempFile("bench_stdout_dnf", ".json")
    g.deleteOnExit()
    java.nio.file.Files.writeString(g.toPath,
      """{"metric":"partial","phase":"warmup","value":153.1,"queries":{"qa":50.1,"qb":9.7},"failed":[],"sf":"/x"}""" + "\n" +
        """{"metric":"partial","phase":"round1","value":12.0,"queries":{"qa":10.2,"qb":1.8},"failed":[],"sf":"/x"}""")
    assert(Bench.loadBaseline(g.getAbsolutePath) == Map("qa" -> 10.2, "qb" -> 1.8))
  }

  test("a -1.0 failed-marker baseline never flags a healthy successor") {
    val slow = Bench.slowQueries(Map("qa" -> 2.0), Map("qa" -> -1.0))
    assert(slow.isEmpty)
  }
}
