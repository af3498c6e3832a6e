package graft

/** Cross-process box lock shared by every graft main that grinds the whole
  * machine (Bench, RunQueries sweeps, the scaled-corpus generators).
  *
  * Why (judge r9 #1 / next-round task 7): the round-9 OFFICIAL bench record
  * ran concurrently with a leftover ~12-core sf10 sweep and read 148.6 s vs
  * a 72.5 s quiet dev sample — a 2× distortion the single-thread canary
  * could not see, let alone repair. The cheap structural fix is to make the
  * two kinds of run mutually exclusive: both take this lock, so a bench can
  * never be timed against a sweep started from the same repo.
  *
  * Mechanics: a `java.nio.channels.FileLock` on a well-known /tmp file —
  * kernel-owned, so a crashed or kill -9'd holder releases it automatically
  * (no stale-lockfile cleanup, the failure mode of touch-file locking).
  * Deliberately JVM-side rather than `flock(1)` in the shell scripts: Java
  * file locks are POSIX fcntl locks on Linux while flock(1) uses flock(2),
  * and the two lock namespaces DO NOT interact — a shell flock would
  * silently not exclude the JVMs. Putting the acquire in the mains covers
  * every invocation path (scripts, bare sbt runMain, the driver).
  *
  * The wait is BOUNDED (default 600 s, env-overridable): the bench consumer
  * runs under a wall-clock budget, so blocking forever on a stuck sweep
  * would trade a contended record for NO record. On timeout the caller
  * proceeds — the parallel canary then measures whatever contention remains
  * — and the returned waitedSeconds lets it stamp the record.
  */
object BoxLock {
  final case class Held(waitedSeconds: Double, acquired: Boolean, release: () => Unit)

  // ONE channel per lock path for the JVM's lifetime, NEVER closed. POSIX
  // fcntl (what Java file locks are on Linux) drops ALL of a process's
  // record locks on a file when ANY descriptor on that file is closed —
  // so a second acquire() that opened its own probe channel and closed it
  // (on time-out, same-JVM overlap, or error) would silently RELEASE a
  // lock a different main in this JVM still holds, re-opening the exact
  // concurrent-run window the lock exists to close. A never-closed shared
  // channel makes that impossible; the cost is one fd per lock path per
  // JVM, reclaimed at process exit (which is also when the kernel releases
  // the lock of a crashed holder).
  private val channels =
    scala.collection.mutable.Map[java.nio.file.Path, java.nio.channels.FileChannel]()
  private def channelFor(path: java.nio.file.Path): java.nio.channels.FileChannel =
    channels.synchronized {
      import java.nio.file.{StandardOpenOption => O}
      channels.getOrElseUpdate(path,
        java.nio.channels.FileChannel.open(path, O.CREATE, O.WRITE))
    }

  /** Acquire the shared lock, waiting up to `maxWaitS` (env
    * SPARK_GRAFT_LOCK_WAIT_S overrides). Always returns; check `acquired`.
    */
  def acquire(owner: String): Held = {
    import java.nio.file.Paths
    val path = Paths.get(sys.env.getOrElse("SPARK_GRAFT_LOCK", "/tmp/graft-box.lock"))
    val maxWaitS = sys.env.getOrElse("SPARK_GRAFT_LOCK_WAIT_S", "600").toDouble
    val t0 = System.nanoTime()
    def waited = (System.nanoTime() - t0) / 1e9
    try {
      val ch = channelFor(path)
      var lock = ch.tryLock()
      if (lock == null)
        System.err.println(s"[$owner] waiting on box lock $path (another graft run holds it)")
      while (lock == null && waited < maxWaitS) {
        Thread.sleep(2000)
        lock = ch.tryLock()
      }
      if (lock == null) {
        System.err.println(f"[$owner] box lock NOT acquired after $waited%.0f s — proceeding contended")
        Held(waited, acquired = false, () => ())
      } else {
        if (waited > 1.0) System.err.println(f"[$owner] box lock acquired after $waited%.0f s")
        val l = lock
        // release the LOCK only — the shared channel stays open (see above)
        Held(waited, acquired = true, () => {
          try l.release() catch { case _: Throwable => () }
        })
      }
    } catch {
      // same-JVM re-acquire: tryLock throws (not null) when another graft
      // main IN THIS JVM already holds the lock — waiting can never
      // succeed (advisor r10). The box IS locked against other processes
      // by that holder, so proceed under its hold; acquired=false keeps
      // release() a no-op (never release the holder's lock).
      case _: java.nio.channels.OverlappingFileLockException =>
        System.err.println(s"[$owner] box lock already held by this JVM — proceeding under the existing hold")
        Held(waited, acquired = false, () => ())
      // instrumentation must never kill the run (e.g. read-only /tmp)
      case e: Throwable =>
        System.err.println(s"[$owner] box lock unavailable (${e.getMessage}) — proceeding")
        Held(waited, acquired = false, () => ())
    }
  }
}
