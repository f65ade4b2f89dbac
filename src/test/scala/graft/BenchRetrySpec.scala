package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench.selectRetryNames — the targeted-extra-measurement trip wires
  * (spread between passes; baseline regression beyond the canary ratio),
  * staged-label mapping, and the cap. Pure function, no Spark session. */
class BenchRetrySpec extends AnyFunSuite {

  private def pass(entries: (String, Double)*): Seq[(String, (Double, String))] =
    entries.map { case (n, t) => n -> (t, null: String) }

  private val noPrior = Map.empty[String, Double]

  test("spread >30% between passes trips; tight spread does not") {
    val passes = Seq(
      pass("q_a" -> 1.0, "q_b" -> 5.0),
      pass("q_a" -> 1.5, "q_b" -> 5.2))
    val out = Bench.selectRetryNames(passes, noPrior, 0, 0, 3.0, 1.0,
      Set.empty, Set("q_a", "q_b"))
    assert(out == Seq("q_a")) // 1.5/1.0 = 1.5 > 1.3; 5.2/5.0 = 1.04 ≤ 1.3
  }

  test("baseline regression beyond the canary ratio trips; canary-explained drift does not") {
    // box is 1.5× slower than the baseline's canary — entries at ≤1.8×
    // their prior are environment; 2× is beyond 1.5·1.2 = 1.8 and trips
    val passes = Seq(
      pass("q_env" -> 4.4, "q_reg" -> 6.0),
      pass("q_env" -> 4.5, "q_reg" -> 6.1))
    val prior = Map("q_env" -> 3.0, "q_reg" -> 3.0)
    val out = Bench.selectRetryNames(passes, prior, 2.0, 1.0, 3.0, 1.0,
      Set.empty, Set("q_env", "q_reg"))
    assert(out == Seq("q_reg")) // 4.4/3.0 = 1.47 < 1.8; 6.0/3.0 = 2.0 > 1.8
  }

  test("sub-second priors never trip (noise floor), failed runs never trip") {
    val passes = Seq(
      pass("q_tiny" -> 0.9) :+ ("q_dead" -> (9.0, "boom")),
      pass("q_tiny" -> 0.9) :+ ("q_dead" -> (1.0, "boom")))
    val prior = Map("q_tiny" -> 0.3, "q_dead" -> 1.0)
    val out = Bench.selectRetryNames(passes, prior, 3.0, 1.0, 3.0, 1.0,
      Set.empty, Set("q_tiny", "q_dead"))
    assert(out.isEmpty)
  }

  test("staged _build labels map back to their query name; cap bounds the set") {
    val passes = Seq(
      pass("q_idx_build" -> 2.0, "q_idx" -> 1.0, "q_plain_build" -> 2.0),
      pass("q_idx_build" -> 3.0, "q_idx" -> 1.7, "q_plain_build" -> 3.0))
    val out = Bench.selectRetryNames(passes, noPrior, 0, 0, 3.0, 1.0,
      stagedNames = Set("q_idx"),
      selectedNames = Set("q_idx", "q_plain_build"))
    // q_idx_build → q_idx (deduped with the probe's own hit);
    // q_plain_build is NOT staged, stays its own name
    assert(out.sorted == Seq("q_idx", "q_plain_build"))
    val capped = Bench.selectRetryNames(passes, noPrior, 0, 0, 3.0, 1.0,
      Set("q_idx"), Set("q_idx", "q_plain_build"), cap = 1)
    assert(capped.size == 1)
  }

  test("retriedObservations records every successful pass per retried entry") {
    val base1 = pass("q_a" -> 5.0, "q_b" -> 1.0)
    val base2 = pass("q_a" -> 3.0, "q_b" -> 1.1)
    val retry = pass("q_a" -> 2.9) :+ ("q_a_build" -> (9.0, "boom"))
    val obs = Bench.retriedObservations(retry, Seq(base1, base2, retry))
    // q_a: all three observations; q_a_build: failed retry excluded and
    // absent from the base passes → empty observation list, label kept
    assert(obs == Seq("q_a" -> Seq(5.0, 3.0, 2.9), "q_a_build" -> Seq.empty))
  }

  test("a faster box never relaxes the regression bar below 1.2x") {
    // canary ratio 0.5 (box twice as fast) must floor at 1.0, so a query
    // 1.3x its prior still trips the 1.2 bar
    val passes = Seq(pass("q_r" -> 3.9), pass("q_r" -> 4.0))
    val out = Bench.selectRetryNames(passes, Map("q_r" -> 3.0), 4.0, 1.0,
      2.0, 0.5, Set.empty, Set("q_r"))
    assert(out == Seq("q_r"))
  }
}
