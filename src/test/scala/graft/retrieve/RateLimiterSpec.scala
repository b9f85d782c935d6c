package graft.retrieve

import org.scalatest.funsuite.AnyFunSuite

class RateLimiterSpec extends AnyFunSuite {

  test("token bucket throttles beyond the per-second budget") {
    var now = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val rl = new RateLimiter(2.0, () => now, ms => { sleeps += ms; now += ms })
    rl.acquire(); rl.acquire() // initial burst within budget
    rl.acquire() // third call must wait for refill
    assert(sleeps.nonEmpty)
    assert(sleeps.sum >= 500) // ~1 token at 2/s
  }

  test("header feedback pauses until reset (A4)") {
    var now = 1000L
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val rl = new RateLimiter(100.0, () => now, ms => { sleeps += ms; now += ms })
    rl.onHeaders(remaining = Some(0), resetAtMs = Some(4000L))
    rl.acquire()
    assert(sleeps.headOption.contains(3000L)) // paused to the reset point
  }

  test("per-partition split divides the budget") {
    val rl = new RateLimiter(32.0)
    val local = rl.forPartitions(8)
    // 4/s local budget: initial burst of 4 proceeds without sleeping
    var slept = false
    val probe = new RateLimiter(4.0, () => 0L, _ => slept = true)
    (1 to 4).foreach(_ => probe.acquire())
    assert(!slept)
    assert(local != null)
  }
}
