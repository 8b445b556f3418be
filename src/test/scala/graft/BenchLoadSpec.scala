package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact must be load-aware (round 8): BENCH.json carries a
  * `"load"` object with before/after OS load averages and a fixed-work CPU
  * calibration probe, so a loaded-host run (like the round-7 349.7 s driver
  * capture) is self-identifying instead of impersonating a regression.
  * These tests pin the emitted shape and the degraded-flag semantics
  * without a full bench run.
  */
class BenchLoadSpec extends AnyFunSuite {

  test("loadJson emits every contract field, rounded to millis") {
    val j = Bench.loadJson(avgStart = 0.16064, avgEnd = 1.23456,
      calStart = 0.1988, calEnd = 0.1871,
      calParStart = 0.2244, calParEnd = 0.3111)
    assert(j.startsWith("\"load\":{"))
    assert(j.contains("\"avg_start\":0.161"))
    assert(j.contains("\"avg_end\":1.235"))
    assert(j.contains("\"cal_start_sec\":0.199"))
    assert(j.contains("\"cal_end_sec\":0.187"))
    assert(j.contains("\"cal_par_start_sec\":0.224"))
    assert(j.contains("\"cal_par_end_sec\":0.311"))
    // the mechanical headroom stamp: mean(par) / mean(single) =
    // (0.2244 + 0.3111) / (0.1988 + 0.1871) = 1.388 — the field a
    // consumer divides shared-key totals by instead of eyeballing the
    // four probe values (the r11 drift diagnosis, mechanized)
    assert(j.contains("\"cal_par_ratio\":1.388"))
    assert(j.contains(s""""cal_bound_sec":${Bench.CalibrationBoundSec}"""))
    assert(j.contains("\"degraded\":false"))
  }

  test("calParRatio: mean-over-mean, -1 sentinel when the par probes were not measured") {
    assert(Bench.calParRatio(0.19, 0.19, 0.19, 0.19) === 1.0)
    assert(math.abs(Bench.calParRatio(0.19, 0.21, 0.33, 0.27) - 1.5) < 1e-9)
    assert(Bench.calParRatio(0.19, 0.19, -1.0, 0.3) === -1.0)
    assert(Bench.calParRatio(0.19, 0.19, 0.3, -1.0) === -1.0)
    // a zero/negative single probe cannot be divided through — sentinel
    assert(Bench.calParRatio(0.0, 0.0, 0.3, 0.3) === -1.0)
  }

  test("unmeasured par probes stamp the -1 sentinel and never vote on degraded") {
    val j = Bench.loadJson(0.1, 0.1, 0.19, 0.19)
    assert(j.contains("\"cal_par_start_sec\":-1"))
    assert(j.contains("\"cal_par_end_sec\":-1"))
    assert(j.contains("\"cal_par_ratio\":-1"))
    assert(j.contains("\"degraded\":false"))
  }

  test("the par-ratio VOTES on degraded past the committed idle baseline (round 14)") {
    // idle baseline committed: r13/r14 clean closing captures read
    // 1.137 / 1.155; the contended r14 captures 1.75-2.24 and the r11
    // window 1.5-2.2. The bound (1.6) sits between the regimes.
    val hot = Bench.loadJson(0.1, 0.1, 0.19, 0.19,
      calParStart = 9.9, calParEnd = 9.9) // ratio ~52
    assert(hot.contains("\"degraded\":true"))
    assert(hot.contains(s""""cal_par_ratio_bound":${Bench.CalParRatioBound}"""))
    // the r14 contended-capture shape (ratio 2.21) flips the flag...
    val contended = Bench.loadJson(1.5, 5.8, 0.209, 0.194,
      calParStart = 0.381, calParEnd = 0.512)
    assert(contended.contains("\"degraded\":true"))
    // ...the clean-capture shape (ratio ~1.15) does not
    val clean = Bench.loadJson(2.3, 5.5, 0.188, 0.186,
      calParStart = 0.21, calParEnd = 0.222)
    assert(clean.contains("\"degraded\":false"))
  }

  test("the parallel probe exists and scales: wall time within sane bounds of the single probe") {
    // only meaningful with real parallel headroom: on a small host (or
    // one deep inside the contention window the probe exists to
    // measure) 4 threads legitimately approach 4× the single time —
    // that is the probe's SIGNAL, not an implementation bug
    assume(Runtime.getRuntime.availableProcessors >= 8,
      "needs >= 8 cores to distinguish a serialized probe from contention")
    val single = Bench.calibrationSec()
    val par = Bench.calibrationParSec(4)
    assert(par < single * 3.0, s"par=$par single=$single — probe not parallel?")
    assert(par >= single * 0.5, s"par=$par single=$single — probe lost its work?")
  }

  test("a probe beyond the bound on either side marks the run degraded") {
    val slowStart = Bench.loadJson(0.0, 0.0, Bench.CalibrationBoundSec + 0.01, 0.19)
    val slowEnd = Bench.loadJson(0.0, 0.0, 0.19, Bench.CalibrationBoundSec + 0.01)
    assert(slowStart.contains("\"degraded\":true"))
    assert(slowEnd.contains("\"degraded\":true"))
  }

  test("the unavailable-loadavg sentinel (-1.0) passes through unmangled") {
    val j = Bench.loadJson(-1.0, -1.0, 0.2, 0.2)
    assert(j.contains("\"avg_start\":-1"))
  }

  test("load fragment embeds into a JSON object that strict parsers accept") {
    val line = s"""{"metric":"total","value":1.0,${Bench.loadJson(0.1, 0.2, 0.19, 0.21)},"queries":{}}"""
    // scala-side sanity: balanced braces and parseable by Spark's JSON reader path
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(line)
    assert(node.get("load").get("degraded").isBoolean)
    assert(node.get("load").get("cal_start_sec").asDouble() === 0.19)
  }

  test("e2e fragments carry their OWN load object and parse as strict JSON (round 14)") {
    // the r13 driver capture's e2e (43.8 s vs 8.9 s clean) was only
    // diagnosable via the sweep-level load block; the fragment now
    // stamps its own window
    val frag = Bench.e2eFragment("e2e",
      """"sec":8.903,"tables":8,"all_success":true""",
      Bench.loadJson(0.2, 3.4, 0.19, 0.21))
    val line = s"""{"metric":"total","value":1.0${frag}}"""
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(line)
    assert(node.get("e2e").get("sec").asDouble() === 8.903)
    assert(node.get("e2e").get("load").get("avg_end").asDouble() === 3.4)
    assert(node.get("e2e").get("load").get("degraded").isBoolean)
  }

  test("queryStatsJson carries median AND per-iteration min for every query") {
    val j = Bench.queryStatsJson(Seq(
      ("h1_hll_distinct", 5.0915, 0.9614), ("d1_exact_dedup", 0.2342, 0.2301)))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(s"{$j}")
    // the min is the per-query transient-load detector: identical work
    // per iteration means median >> min identifies outside interference
    assert(node.get("queries").get("h1_hll_distinct").asDouble() === 5.092)
    assert(node.get("queries_min").get("h1_hll_distinct").asDouble() === 0.961)
    assert(node.get("queries").get("d1_exact_dedup").asDouble() === 0.234)
    assert(node.get("queries_min").get("d1_exact_dedup").asDouble() === 0.23)
    assert(node.get("queries").size() === node.get("queries_min").size())
  }

  test("calibrationSec does fixed work and returns a positive wall time") {
    Bench.calibrationSec() // JIT warm
    val s = Bench.calibrationSec()
    assert(s > 0.0 && s < 60.0)
  }

  test("summaryLine fits a 2000-char tail and parses after its prefix (round 17)") {
    // the driver keeps a ~2000-char stdout tail; the ~8 KB 192-query
    // line has outrun it every round since r12 (parsed: null). The
    // summary must carry totals + per-family subtotals within the tail.
    val queries = (1 to 200).map(i => (f"q${i % 30}%d_name_$i", 1.234))
    val line = Bench.summaryLine(total = 223.411, n = 200, nErrors = 0,
      nRetry = 3, degraded = false, parRatio = 1.289,
      e2eSec = Some(10.603), trainSec = Some(14.45),
      queries = queries, cpus = 32, iters = 3, sf = "/root/testdata/sf0.1")
    assert(line.startsWith("BENCH-SUMMARY {"),
      "must NOT start with '{' — the contract-line scanner keeps matching the full line")
    assert(line.length < 2000, s"summary must fit the tail, got ${line.length}")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(line.stripPrefix("BENCH-SUMMARY "))
    assert(node.get("value").asDouble() === 223.411)
    assert(node.get("n").asInt() === 200)
    assert(node.get("e2e_sec").asDouble() === 10.603)
    assert(node.get("e2e_train_sec").asDouble() === 14.45)
    assert(node.get("degraded").isBoolean)
    assert(node.get("families").size() > 0)
  }

  test("familyOf strips the numbered prefix to its letters") {
    assert(Bench.familyOf("a10_grouping_sets") === "a")
    assert(Bench.familyOf("ivm9_composed_topk") === "ivm")
    assert(Bench.familyOf("tf1_tfidf_topk") === "tf")
    assert(Bench.familyOf("d4_ngram_jaccard") === "d")
    // degenerate names fall back to themselves rather than an empty key
    assert(Bench.familyOf("1weird") === "1weird")
  }

  test("probeRatioJson: med/p90/max/n_hot from per-query window samples") {
    val j = Bench.probeRatioJson(Seq(1.1, 1.2, 1.3, 2.9, -1.0))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(s"""{"x":0${j}}""")
    assert(node.get("probe_ratio").get("n").asInt() === 4) // -1 sentinel dropped
    assert(node.get("probe_ratio").get("med").asDouble() === 1.25)
    assert(node.get("probe_ratio").get("max").asDouble() === 2.9)
    assert(node.get("probe_ratio").get("n_hot").asInt() === 1) // only 2.9 > 1.6
    assert(Bench.probeRatioJson(Nil) === "")
  }

  test("retry suspects: median far above its own min AND past the absolute floor") {
    // the r9 pattern: cd1 median 2.31 s vs min ~0.5 s → suspect
    assert(Bench.retrySuspect(median = 2.31, min = 0.50))
    // sub-floor gaps are jitter, not load, even at 2×+
    assert(!Bench.retrySuspect(median = 0.30, min = 0.12))
    // big but sub-factor gap: heavy queries legitimately vary some
    assert(!Bench.retrySuspect(median = 3.0, min = 2.0))
    assert(!Bench.retrySuspect(median = 0.25, min = 0.24))
  }

  test("retry disagreement confirms load: quiet re-run lands a factor below the median") {
    assert(Bench.retryDisagrees(median = 2.31, retry = 0.52))
    // retry reproduces the median → genuine cost, not load
    assert(!Bench.retryDisagrees(median = 2.31, retry = 2.2))
    // tiny absolute gaps never upgrade the flag
    assert(!Bench.retryDisagrees(median = 0.3, retry = 0.1))
  }

  test("retry disagreement upgrades the degraded flag even with clean probes") {
    val clean = Bench.loadJson(0.1, 0.1, 0.19, 0.19, retryDegraded = false)
    assert(clean.contains("\"retry_degraded\":false") &&
      clean.contains("\"degraded\":false"))
    val upgraded = Bench.loadJson(0.1, 0.1, 0.19, 0.19, retryDegraded = true)
    assert(upgraded.contains("\"retry_degraded\":true") &&
      upgraded.contains("\"degraded\":true"))
  }

  test("retrySlow: the symmetric vote — retry a factor ABOVE the median is suspect too") {
    // the r13 driver-capture shape: d4 retry 76.288 s vs median 8.7 s
    assert(Bench.retrySlow(median = 8.7, retry = 76.288))
    // retry reproduces the median → no suspicion either way
    assert(!Bench.retrySlow(median = 8.7, retry = 9.1))
    // sub-floor gaps are jitter even at 2×+
    assert(!Bench.retrySlow(median = 0.05, retry = 0.12))
    // the FAST direction belongs to retryDisagrees, not retrySlow
    assert(!Bench.retrySlow(median = 8.7, retry = 3.7))
  }

  test("slowRetryVerdict: dirty probe → degraded without a re-run") {
    var reran = false
    val (sec, failed, vote) = Bench.slowRetryVerdict(
      median = 8.7, first = 76.288,
      probeSec = Bench.CalibrationBoundSec + 0.01,
      rerun = () => { reran = true; (3.7, false) })
    assert(!reran, "a dirty probe must not waste a re-run under the same load window")
    assert(sec === 76.288 && !failed && vote)
  }

  test("slowRetryVerdict: clean probe re-runs once; a fast re-run publishes and defers to retryDisagrees") {
    val (sec, failed, vote) = Bench.slowRetryVerdict(
      median = 8.7, first = 76.288, probeSec = 0.19,
      rerun = () => (3.7, false))
    assert(sec === 3.7 && !failed && !vote)
    // the published 3.7 then triggers the standard fast-side vote
    assert(Bench.retryDisagrees(median = 8.7, retry = 3.7))
  }

  test("slowRetryVerdict: clean probe but the re-run is STILL slow → degraded (irreconcilable samples)") {
    val (sec, failed, vote) = Bench.slowRetryVerdict(
      median = 8.7, first = 76.288, probeSec = 0.19,
      rerun = () => (62.0, false))
    assert(sec === 62.0 && !failed && vote)
  }

  test("slowRetryVerdict: a failed re-run publishes as failed and never votes") {
    val (_, failed, vote) = Bench.slowRetryVerdict(
      median = 8.7, first = 76.288, probeSec = 0.19,
      rerun = () => (0.05, true))
    assert(failed && !vote)
  }

  test("a FAILED retry publishes null and never votes on degraded") {
    // (name, median, retrySec, failed): q_err threw fast — its 0.05 s
    // time-to-failure would read as massive disagreement if it voted
    val (json, degraded) = Bench.retryJsonAndDegraded(Seq(
      ("q_err", 2.31, 0.05, true),
      ("q_real", 2.31, 2.2, false))) // retry reproduces the median
    assert(!degraded)
    assert(json.contains("\"q_err\":null"))
    assert(json.contains("\"q_real\":2.2"))
    // the same fast value from a SUCCESSFUL retry does vote
    assert(Bench.retryJsonAndDegraded(Seq(("q", 2.31, 0.05, false)))._2)
    // and no suspects → no fragment at all
    assert(Bench.retryJsonAndDegraded(Nil) == ("", false))
  }
}
