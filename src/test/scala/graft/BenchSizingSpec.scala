package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the bench's study-sizing kernel (Bench.sizeStudy): the function that
 * decides how big a scaling study the current host window can FINISH — the
 * r03/r04 driver bench runs were both killed mid-flight because nothing
 * made this decision (VERDICT r04 #1). Pure logic, so the contract is
 * spec-testable without spawning JVMs.
 */
class BenchSizingSpec extends AnyFunSuite {

  // cost model shaped like the real one: floors = min(2, rounds) * (lo+hi),
  // per-point lo/hi costs plus a fixed per-attempt charge
  private def cost(ppl: Double, pph: Double, fixed: Double)(p: Long, r: Int): Double =
    math.min(2, r) * (p * ppl + fixed + p * pph + fixed)

  private val pts = Seq(1000000000L, 500000000L, 250000000L)
  private val rounds = Seq(3, 2, 1)
  private val fallback = (250000000L, 1)

  test("ample budget takes the largest points at full rounds") {
    val c = cost(1.1e-9, 4.0e-10, 45.0) _ // healthy window, scaled 1000x down
    assert(Bench.sizeStudy(1e9, pts, rounds, c, fallback) === ((1000000000L, 3)))
  }

  test("points are preferred over rounds as the budget shrinks") {
    val c = cost(1.1e-6, 4.0e-7, 45.0) _ // real healthy-window constants
    // floors: (1B, >=2 rounds) = 2*(1100+45+400+45) = 3180; (1B,1) = 1590;
    // (500M,2) = 1680; (500M,1) = 840
    assert(Bench.sizeStudy(2000.0, pts, rounds, c, fallback) === ((1000000000L, 1)))
    assert(Bench.sizeStudy(1000.0, pts, rounds, c, fallback) === ((500000000L, 1)))
  }

  test("a budget too small for any candidate falls back rather than failing") {
    val c = cost(1.1e-6, 4.0e-7, 45.0) _
    assert(Bench.sizeStudy(10.0, pts, rounds, c, fallback) === fallback)
    assert(Bench.sizeStudy(0.0, pts, rounds, c, fallback) === fallback)
  }

  test("degraded window (2x slow) steps down where the same budget held 1B before") {
    val healthy = cost(1.1e-6, 4.0e-7, 45.0) _
    val slow2x = cost(2.2e-6, 8.0e-7, 45.0) _
    val budget = 1700.0
    assert(Bench.sizeStudy(budget, pts, rounds, healthy, fallback) === ((1000000000L, 1)))
    assert(Bench.sizeStudy(budget, pts, rounds, slow2x, fallback) === ((500000000L, 1)))
  }

  test("preference order is exactly points-major, rounds-minor") {
    // a cost function where everything fits: must take the FIRST candidate
    assert(Bench.sizeStudy(1.0, pts, rounds, (_, _) => 0.0, fallback)
      === ((1000000000L, 3)))
    // only (250M, 1) fits: must walk the whole order to reach it
    val onlySmallest = (p: Long, r: Int) =>
      if (p == 250000000L && r == 1) 0.0 else 1e18
    assert(Bench.sizeStudy(1.0, pts, rounds, onlySmallest, fallback)
      === ((250000000L, 1)))
  }
}
