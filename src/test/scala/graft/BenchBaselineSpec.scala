package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench regression guard's baseline parse/selection path
  * (Bench.baselineQueries / baselineSf / selectBaselines). Driver-recorded
  * BENCH_r*.json files are bounded stdout excerpts and HAVE arrived
  * truncated (BASELINE.md round-13 note); which recording the guard
  * compares against silently changing under truncation cost two rounds of
  * flag adjudication — this spec makes every degradation case loud and
  * deterministic.
  */
class BenchBaselineSpec extends AnyFunSuite {

  private val rawLine =
    """{"metric":"total","value":12.3,"unit":"sec","queries":{"q1":1.250,""" +
      """"dd_x":0.375},"failed":[],"regressions":[],"sf":"/root/testdata/sf0.1"}"""

  // The driver envelope: bare-number sf at top level, the bench line
  // escaped inside "tail".
  private val envelope =
    s"""{"n": 7, "rc": 0, "sf": 0.1, "tail": "${rawLine.replace("\"", "\\\"")}"}"""

  test("baselineQueries parses both the raw bench line and the driver envelope") {
    val expected = Map("q1" -> 1.25, "dd_x" -> 0.375)
    assert(Bench.baselineQueries(rawLine) === expected)
    assert(Bench.baselineQueries(envelope) === expected)
  }

  test("a record truncated before the queries map parses EMPTY, not partial") {
    // Head-truncation eats the {"metric":... opening and the "queries":{
    // key — exactly the r13 shape (BENCH_r13.json's tail starts mid-map).
    val truncated = rawLine.drop(rawLine.indexOf("\"q1\""))
    assert(Bench.baselineQueries(truncated) === Map.empty)
  }

  test("baselineSf reads bare-number, quoted-number and directory-path forms") {
    assert(Bench.baselineSf("""{"sf": 0.1, "tail": "..."}""") === Some("0.1"))
    assert(Bench.baselineSf("""{"sf":"0.01"}""") === Some("0.01"))
    assert(Bench.baselineSf(rawLine) === Some("0.1"))
    assert(Bench.baselineSf(envelope) === Some("0.1"))
    assert(Bench.baselineSf("""{"metric":"total"}""") === None)
  }

  private val sfDir = "/root/testdata/sf0.1"
  private def cand(label: String, sf: String, qs: (String, Double)*)
      : (String, Option[String], Map[String, Double]) =
    (label, Some(sf), qs.toMap)

  test("blessed BASELINE_r* is the defended baseline; newer bench is latest") {
    val (chosen, warnings) = Bench.selectBaselines(Seq(
      cand("BENCH_r01", "0.1", "q1" -> 1.0),
      cand("BASELINE_r14", "0.1", "q1" -> 1.1),
      cand("BENCH_r15", "0.1", "q1" -> 1.2)), sfDir)
    assert(chosen.map(c => c._1 -> c._2)
      === Seq("BASELINE_r14" -> 1.5, "BENCH_r15" -> 1.5))
    // Envelope without a quiet-window median companion: drift leg disarmed
    // must be LOUD, never silent.
    assert(warnings.exists(_.contains("median companion")),
      warnings.mkString("; "))
  }

  test("median companion rides the envelope at x3, never as defended or latest") {
    val (chosen, warnings) = Bench.selectBaselines(Seq(
      cand("BASELINE_r14", "0.1", "q1" -> 4.0),
      cand("BASELINE_r15_median", "0.1", "q1" -> 1.0),
      cand("BENCH_r15", "0.1", "q1" -> 1.2)), sfDir)
    assert(chosen.map(c => c._1 -> c._2) === Seq(
      "BASELINE_r14" -> 1.5, "BASELINE_r15_median" -> 3.0,
      "BENCH_r15" -> 1.5))
    assert(warnings.isEmpty)
    // The newest median wins when several are committed.
    val (chosen2, _) = Bench.selectBaselines(Seq(
      cand("BASELINE_r14_median", "0.1", "q1" -> 2.0),
      cand("BASELINE_r15_median", "0.1", "q1" -> 1.0),
      cand("BASELINE_r14", "0.1", "q1" -> 4.0)), sfDir)
    assert(chosen2.collect { case (l, 3.0, _, _) => l }
      === Seq("BASELINE_r15_median"))
  }

  test("a median companion older than the blessed envelope warns (stale drift leg)") {
    // After an envelope re-bless WITHOUT a refreshed median companion the
    // ×3 drift leg silently kept comparing against the previous round's
    // medians — the 'disarmed' warning only fired when no median existed
    // at all. Staleness must be as loud as absence.
    val (chosen, warnings) = Bench.selectBaselines(Seq(
      cand("BASELINE_r15_median", "0.1", "q1" -> 1.0),
      cand("BASELINE_r16", "0.1", "q1" -> 4.0)), sfDir)
    assert(chosen.map(_._1) === Seq("BASELINE_r16", "BASELINE_r15_median"))
    assert(warnings.exists(w => w.contains("OLDER") &&
      w.contains("BASELINE_r15_median") && w.contains("BASELINE_r16")),
      warnings.mkString("; "))
    // Same-round (or newer) companion: no staleness warning.
    val (_, quiet) = Bench.selectBaselines(Seq(
      cand("BASELINE_r16_median", "0.1", "q1" -> 1.0),
      cand("BASELINE_r16", "0.1", "q1" -> 4.0)), sfDir)
    assert(!quiet.exists(_.contains("OLDER")), quiet.mkString("; "))
  }

  test("roles: envelope/median/latest are labeled for the flag report") {
    val (chosen, _) = Bench.selectBaselines(Seq(
      cand("BASELINE_r15", "0.1", "q1" -> 4.0),
      cand("BASELINE_r15_median", "0.1", "q1" -> 1.0),
      cand("BENCH_LOCAL_r16", "0.1", "q1" -> 1.2)), sfDir)
    assert(chosen.map(c => c._1 -> c._4) === Seq(
      "BASELINE_r15" -> "envelope", "BASELINE_r15_median" -> "median",
      "BENCH_LOCAL_r16" -> "latest"))
  }

  test("a flag tripping only the latest leg is labeled [latest_only]") {
    // Three armed legs; the gate cost sits above latest×1.5 but below
    // envelope×1.5 and median×3 — the r15 shape whose five bare flags
    // cost the judge an artifact cross-check to adjudicate.
    val legs = Seq(
      ("BASELINE_r15", 1.5, Map("g" -> 10.0, "h" -> 10.0), "envelope"),
      ("BASELINE_r15_median", 3.0, Map("g" -> 4.0, "h" -> 4.0), "median"),
      ("BENCH_LOCAL_r15", 1.5, Map("g" -> 4.0, "h" -> 4.0), "latest"))
    val entries = Bench.regressionEntries(
      Seq("g" -> 7.0, "h" -> 40.0), legs, noiseFloor = 1.0)
    // g: 7.0 trips only latest (x1.75); blessed legs clean → labeled.
    assert(entries.exists(e => e.contains("\"g x1.75 vs BENCH_LOCAL_r15") &&
      e.contains("[latest_only]")), entries.mkString("; "))
    // h: 40.0 trips every leg → cites the largest overshoot, no label.
    assert(entries.exists(e =>
      e.contains("\"h x10.00 vs") && !e.contains("latest_only")),
      entries.mkString("; "))
    // With NO blessed leg covering the gate, latest_only must not be
    // claimed — there is nothing clean to adjudicate against.
    val latestOnlyLegs = legs.filter(_._4 == "latest")
    val bare = Bench.regressionEntries(Seq("g" -> 7.0), latestOnlyLegs, 1.0)
    assert(bare.nonEmpty && !bare.head.contains("latest_only"), bare)
    // A FALLBACK defended leg (no usable blessing existed) is not a
    // blessed reference either: clean coverage by it must not mint the
    // label in exactly the degraded configuration where flags need
    // scrutiny.
    val fallbackLegs = Seq(
      ("BENCH_r01", 1.5, Map("g" -> 10.0), "fallback"),
      ("BENCH_LOCAL_r15", 1.5, Map("g" -> 4.0), "latest"))
    val fb = Bench.regressionEntries(Seq("g" -> 7.0), fallbackLegs, 1.0)
    assert(fb.nonEmpty && !fb.head.contains("latest_only"), fb)
    // And selectBaselines tags the fallback role itself.
    val (fbChosen, _) = Bench.selectBaselines(Seq(
      cand("BENCH_r01", "0.1", "q1" -> 1.0),
      cand("BENCH_r02", "0.1", "q1" -> 1.1)), sfDir)
    assert(fbChosen.map(c => c._1 -> c._4) ===
      Seq("BENCH_r01" -> "fallback", "BENCH_r02" -> "latest"))
    // Below every threshold: no entries at all.
    assert(Bench.regressionEntries(Seq("g" -> 4.2), legs, 1.0).isEmpty)
  }

  test("a truncated median companion warns and disarms only the drift leg") {
    val (chosen, warnings) = Bench.selectBaselines(Seq(
      cand("BASELINE_r14", "0.1", "q1" -> 4.0),
      (("BASELINE_r15_median", Some("0.1"), Map.empty[String, Double]))), sfDir)
    assert(chosen.map(_._1) === Seq("BASELINE_r14"))
    assert(warnings.exists(w =>
      w.contains("BASELINE_r15_median") && w.contains("truncated")))
    assert(warnings.exists(_.contains("median companion")))
  }

  test("bench rounds the blessing supersedes are history, not references") {
    // BENCH_r01/r02 carried RETIRED gate bodies and re-flagged redesigned
    // gates every round (dd_simhash ×2.x, three rounds running): once a
    // blessed recording exists, only a STRICTLY NEWER bench round may
    // serve as the fresh-regression reference.
    val (chosen, warnings) = Bench.selectBaselines(Seq(
      cand("BENCH_r01", "0.1", "q1" -> 1.0),
      cand("BENCH_r02", "0.1", "q1" -> 0.9),
      cand("BASELINE_r14", "0.1", "q1" -> 1.1)), sfDir)
    assert(chosen.map(_._1) === Seq("BASELINE_r14"))
    assert(!warnings.exists(_.contains("falls back")))
  }

  test("a committed BENCH_LOCAL record beats the driver excerpt of its round") {
    // The full target/bench.json record committed as BENCH_LOCAL_r15 is
    // complete; the driver's BENCH_r15 stdout excerpt is truncatable —
    // at equal round the LOCAL record is the latest leg.
    val (chosen, _) = Bench.selectBaselines(Seq(
      cand("BASELINE_r14", "0.1", "q1" -> 1.1),
      cand("BENCH_r15", "0.1", "q1" -> 1.2),
      cand("BENCH_LOCAL_r15", "0.1", "q1" -> 1.3)), sfDir)
    assert(chosen.filter(_._1.startsWith("BENCH")).map(_._1)
      === Seq("BENCH_LOCAL_r15"))
    // And when the driver record of the round is TRUNCATED (the r03–r14
    // shape), the committed local record alone keeps the leg alive.
    val (chosen2, _) = Bench.selectBaselines(Seq(
      cand("BASELINE_r14", "0.1", "q1" -> 1.1),
      (("BENCH_r15", Some("0.1"), Map.empty[String, Double])),
      cand("BENCH_LOCAL_r15", "0.1", "q1" -> 1.3)), sfDir)
    assert(chosen2.filter(_._1.startsWith("BENCH")).map(_._1)
      === Seq("BENCH_LOCAL_r15"))
  }

  test("truncated blessed recording warns and falls back to the oldest bench") {
    val (chosen, warnings) = Bench.selectBaselines(Seq(
      cand("BENCH_r01", "0.1", "q1" -> 1.0),
      cand("BENCH_r13", "0.1", "q1" -> 1.2),
      (("BASELINE_r14", Some("0.1"), Map.empty[String, Double]))), sfDir)
    assert(chosen.map(_._1) === Seq("BENCH_r01", "BENCH_r13"))
    assert(warnings.exists(_.contains("BASELINE_r14")), warnings.mkString("; "))
    assert(warnings.exists(_.contains("falls back to BENCH_r01")),
      warnings.mkString("; "))
  }

  test("truncated bench at matching sf warns; other-sf records skip silently") {
    val (chosen, warnings) = Bench.selectBaselines(Seq(
      cand("BENCH_r01", "0.1", "q1" -> 1.0),
      (("BENCH_r12", Some("0.1"), Map.empty[String, Double])),
      cand("BENCH_r09", "0.01", "q1" -> 0.2)), sfDir)
    assert(chosen.map(_._1) === Seq("BENCH_r01"))
    assert(warnings.exists(w =>
      w.contains("BENCH_r12") && w.contains("truncated")))
    assert(!warnings.exists(_.contains("BENCH_r09")),
      "a different-sf record is out of scope, not a degradation")
  }

  test("a single usable record serves as both defended and latest, once") {
    val (chosen, warnings) = Bench.selectBaselines(
      Seq(cand("BENCH_r01", "0.1", "q1" -> 1.0)), sfDir)
    assert(chosen.map(c => c._1 -> c._2) === Seq("BENCH_r01" -> 1.5))
    assert(warnings.isEmpty)
  }

  test("no usable record at all selects nothing (guard disarmed, not crashed)") {
    val (chosen, _) = Bench.selectBaselines(
      Seq(cand("BENCH_r09", "0.01", "q1" -> 0.2)), sfDir)
    assert(chosen.isEmpty)
  }
}
