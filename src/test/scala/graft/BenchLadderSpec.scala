package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale-ladder growth contract over the COMMITTED rung artifacts
  * (BENCH_x{10,20,40,64,128}.json): for every query, doubling the data
  * must not more than ~double+slack the time at the top rung. This is
  * the regression tripwire the r5 verdict asked for after the x128
  * memory-pressure cluster (q_repetition 4.6→19.5 s etc. under an 8 GiB
  * bench heap): rungs are now run at the documented memory floor and
  * this spec pins that the whole surface stays flat-to-linear.
  *
  * Measurement honesty: single-run rung timings carry ambient drift
  * (the r5 verdict itself measured 6-8x one-off inflation on untouched
  * queries), so the bound has an absolute-slack arm — a query fails
  * only when it is BOTH super-linear by ratio AND materially slower in
  * absolute seconds. Documented exceptions are queries whose OUTPUT
  * grows super-linearly in the fixture (adjudicated in the r5 verdict):
  * runtime linear in output, output quadratic-ish in this fixture's
  * densifying key space — real distributions are sparse.
  */
class BenchLadderSpec extends AnyFunSuite {

  private val Timing = "\"(q_[a-zA-Z0-9_]+)\":([0-9.]+)".r

  private def rung(name: String): Option[Map[String, Double]] = {
    val f = new java.io.File(name)
    if (!f.exists()) None
    else {
      val src = scala.io.Source.fromFile(f)
      try {
        val body = src.mkString
        // the "queries" map only — strip the failed-list prefix rows
        Some(Timing.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap)
      } finally src.close()
    }
  }

  /** Super-linear in this fixture by adjudicated, measured design:
    * q_editdist_pairs/q_minhash_calibration output mass densifies in
    * the integer key space; q_simhash_pairs' matched-row mass is
    * quadratic in the short-doc fingerprint CORNER density (probe at
    * x64 -> x128: true survivors 3.88M -> 6.75M = 1.74x linear,
    * near-miss candidates 774M -> 3.2B = 4.15x; runtime linear in the
    * matched stream) — a length-distribution property with the remedy
    * documented in simHashPairs' scaladoc (route degenerate shorts
    * upstream), not a plan defect. */
  private val OutputBound =
    Set("q_editdist_pairs", "q_minhash_calibration", "q_simhash_pairs")

  private def checkPair(loName: String, hiName: String, dataRatio: Double,
                        ratioBound: Double): Unit = {
    (rung(loName), rung(hiName)) match {
      case (Some(lo), Some(hi)) =>
        val bad = for {
          (q, tHi) <- hi.toSeq.sortBy(_._1)
          tLo <- lo.get(q)
          // sub-second low-rung timings are scheduling noise, and an
          // absolute growth under 2 s is never a scale story
          if tLo >= 0.75 && tHi - tLo * dataRatio > 2.0
          if tHi / tLo > ratioBound && !OutputBound(q)
        } yield f"$q: $tLo%.2fs -> $tHi%.2fs (${tHi / tLo}%.2fx for ${dataRatio}x data)"
        assert(bad.isEmpty,
          s"super-linear growth $loName -> $hiName:\n${bad.mkString("\n")}")
      case _ => cancel(s"rungs $loName/$hiName not both present")
    }
  }

  test("x64 -> x128 (2x data): every query <= 2.2x, exceptions adjudicated") {
    checkPair("BENCH_x64.json", "BENCH_x128.json", 2.0, 2.2)
  }

  test("x40 -> x64 (1.6x data): every query <= 1.9x") {
    checkPair("BENCH_x40.json", "BENCH_x64.json", 1.6, 1.9)
  }

  test("x20 -> x40 (2x data): every query <= 2.2x") {
    checkPair("BENCH_x20.json", "BENCH_x40.json", 2.0, 2.2)
  }
}
