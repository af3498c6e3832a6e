package graft

import org.scalatest.funsuite.AnyFunSuite

/** The sweep kill path (judge r11 #7): q57-uncapped at sf10 can OOM the
  * JVM racing its own 600 s cancel, and the r11 sweep recorded that as a
  * FATAL fail (losing the query's documented-timeout identity; the first
  * r11 sweep additionally lost 49 queued queries before the context
  * rebuild existed). The verdict rule is now explicit and pinned here:
  * once a query's budget has ELAPSED, however it dies — the budget path's
  * own TIMEOUT marker, an OOM mid-cancel, a SparkException from the
  * teardown — the sweep records `timeout`. Fatal errors INSIDE the budget
  * remain `fail` (a real sf10 crash at 30 s must not masquerade as a
  * budget exhaustion), and an un-budgeted run (timeoutSec = 0) never
  * fabricates timeouts.
  */
class SweepVerdictSpec extends AnyFunSuite {

  test("budget-elapsed deaths are timeouts regardless of the exception class") {
    // the canonical race: OOM at 600.4s while the cancel tears it down
    assert(RunQueries.failureVerdict(
      "java.lang.OutOfMemoryError: Java heap space", 600.4, 600) == "timeout")
    // SparkException from interrupted tasks during teardown
    assert(RunQueries.failureVerdict(
      "org.apache.spark.SparkException: Job 42 cancelled", 601.0, 600) == "timeout")
    // the budget path's own marker, thrown BEFORE the budget second ticks
    // fully over on the wall clock
    assert(RunQueries.failureVerdict(
      "java.lang.RuntimeException: TIMEOUT after 600s", 599.9, 600) == "timeout")
  }

  test("in-budget fatals stay failures; un-budgeted runs never time out") {
    assert(RunQueries.failureVerdict(
      "java.lang.OutOfMemoryError: Java heap space", 30.0, 600) == "fail")
    assert(RunQueries.failureVerdict(
      "org.apache.spark.SparkException: Task failed", 599.0, 600) == "fail")
    assert(RunQueries.failureVerdict(
      "java.lang.OutOfMemoryError: Java heap space", 10000.0, 0) == "fail")
  }
}
