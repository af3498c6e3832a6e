package graft

/** Manual cross-process probe for [[BoxLock]] (round 11): holds the lock
  * for `args(0)` seconds (default 20), printing acquire/release stamps.
  * Run two of these from two JVMs — the second must log the wait.
  */
object BoxLockProbe {
  def main(args: Array[String]): Unit = {
    val holdS = if (args.nonEmpty) args(0).toInt else 20
    val t0 = System.currentTimeMillis()
    val h = BoxLock.acquire(s"probe-pid${ProcessHandle.current().pid()}")
    println(s"[probe] pid=${ProcessHandle.current().pid()} acquired=${h.acquired} " +
      f"waited=${h.waitedSeconds}%.1f s at +${(System.currentTimeMillis() - t0) / 1000.0}%.1f s")
    Thread.sleep(holdS * 1000L)
    h.release()
    println(s"[probe] pid=${ProcessHandle.current().pid()} released")
  }
}
