package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the episode-detection math behind the bench's ambient canary
  * (r15 verdict lead item — the grading instrument mis-read r15 by
  * +16% and needed manual cross-run forensics). Pure functions, no
  * Spark: the measured behaviors these encode are documented at the
  * [[Bench]] call sites. */
class BenchCanarySpec extends AnyFunSuite {

  private val clean = Map("cpu" -> 0.38, "scan" -> 0.16, "shuffle" -> 0.30)

  test("warm-up slope (slow START) does not register as drift") {
    // measured shape of a clean run: start slowest (JIT/page cache),
    // mid/end settle lower — an undirected max/min would read 1.9x here
    val start = Map("cpu" -> 0.38, "scan" -> 0.30, "shuffle" -> 0.36)
    val mid = Map("cpu" -> 0.38, "scan" -> 0.17, "shuffle" -> 0.31)
    val end = Map("cpu" -> 0.38, "scan" -> 0.16, "shuffle" -> 0.30)
    val d = Bench.directionalDrift(start, mid, end)
    assert(d < 1.3, s"warm-up slope must stay under the stamp threshold, got $d")
  }

  test("mid/end inflation IS drift (episode arriving mid-run)") {
    val mid = clean.map { case (k, v) => k -> v * 1.6 }
    assert(Bench.directionalDrift(clean, mid, clean) >= 1.5)
    val end = clean.map { case (k, v) => k -> v * 2.0 }
    assert(Bench.directionalDrift(clean, clean, end) >= 1.9)
  }

  test("single-component end spike still registers (max over components)") {
    val end = clean.updated("shuffle", clean("shuffle") * 1.7)
    val d = Bench.directionalDrift(clean, clean, end)
    assert(d >= 1.6 && d < 1.8)
  }

  test("vs-committed: uniform sustained inflation is caught (the in-run blind spot)") {
    // the r15 episode shape: every phase inflated ~1.3x vs the same
    // box an hour earlier — in-run drift reads ~1.0, the committed
    // comparison must carry the signal
    val committed = Map("start" -> clean, "mid" -> clean, "end" -> clean)
    val inflated = Seq.fill(3)(clean.map { case (k, v) => k -> v * 1.35 })
    assert(Bench.directionalDrift(inflated(0), inflated(1), inflated(2)) < 1.05)
    val vs = Bench.canaryVsCommitted(inflated, committed)
    assert(vs.exists(v => v > 1.3 && v < 1.4), s"got $vs")
  }

  test("vs-committed: single-component blip does NOT stamp (median over components)") {
    val committed = Map("start" -> clean, "mid" -> clean, "end" -> clean)
    val cur = Seq.fill(3)(clean.updated("scan", clean("scan") * 3.0))
    val vs = Bench.canaryVsCommitted(cur, committed)
    assert(vs.exists(_ < 1.1), s"one slow component must not read broad, got $vs")
  }

  test("vs-committed: None on pre-r16 maps (no canary) or disjoint components") {
    assert(Bench.canaryVsCommitted(Seq(clean, clean, clean), Map.empty).isEmpty)
    val disjoint = Map("start" -> Map("io" -> 1.0))
    assert(Bench.canaryVsCommitted(Seq(clean, clean, clean), disjoint).isEmpty)
  }

  test("medOf: upper median at even sizes (the suite convention)") {
    assert(Bench.medOf(Seq(1.0, 2.0)) == 2.0)
    assert(Bench.medOf(Seq(3.0, 1.0, 2.0)) == 2.0)
  }
}
