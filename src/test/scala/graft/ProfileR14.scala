package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** r14 measurement harness (guide §1): run one query repeatedly under the
  * noop sink with a job listener, printing per-job wall time and the gaps
  * BETWEEN jobs (driver-side planning/broadcast latency the stage metrics
  * never show). Run: `sbt "Test/runMain graft.ProfileR14 q63_ann_pq 3"`.
  */
object ProfileR14 {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("ERROR")
    val sfd = "/root/testdata/sf0.1"
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (j.time, Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach { case (t0, d) =>
          done.add((j.jobId, t0, j.time, d))
        }
      }
    })
    for (name <- names; r <- 1 to reps) {
      val fn = SparkEntry.queries(name)
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      done.clear()
      val t0 = System.nanoTime()
      fn(s, sfd).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val ds = done.toArray(Array.empty[(Int, Long, Long, String)]).sortBy(_._2)
      var prevEnd = 0L
      var jobSum = 0.0
      println(f"== $name rep $r wall $wall%.3f s, ${ds.length} jobs")
      ds.foreach { case (id, st, en, desc) =>
        val gap = if (prevEnd == 0) 0.0 else (st - prevEnd) / 1e3
        prevEnd = en
        jobSum += (en - st) / 1e3
        println(f"  job $id%3d ${(en - st) / 1e3}%7.3f s  gap ${gap}%6.3f s  ${desc.take(80)}")
      }
      println(f"  job sum $jobSum%.3f s (wall - jobs = driver/planning time)")
    }
    s.stop()
  }
}
