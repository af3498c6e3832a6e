package graft

/** One-off measurement harness for the q80 persist A/B at sf1 (judge r8
  * #5): the persist-wins call was measured at sf0.1, where the cached
  * shingle index is small; at 10× the cache is 10× bigger and the trade
  * could flip (memory pressure vs recompute). Interleaved reps of the
  * SAME q80 composition with `persistIndex` on/off, medians reported.
  * `Test/runMain graft.PersistAbR9 [sfDir [reps]]`.
  */
object PersistAbR9 {
  def main(args: Array[String]): Unit = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val reps = if (args.length > 1) args(1).toInt else 3
    def reset(): Unit = {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def once(persist: Boolean): Double = {
      reset()
      val t0 = System.nanoTime()
      SparkEntry.curationPipeline(s, dir, persistIndex = persist)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // untimed warmup of both variants (janino/JIT, file-listing caches)
    once(persist = true); once(persist = false)
    val samples = scala.collection.mutable.Map(
      true -> Vector.empty[Double], false -> Vector.empty[Double])
    for (_ <- 1 to reps; p <- Seq(true, false))
      samples(p) = samples(p) :+ once(p)
    def median(xs: Seq[Double]): Double = {
      val v = xs.sorted
      if (v.size % 2 == 1) v(v.size / 2) else (v(v.size / 2 - 1) + v(v.size / 2)) / 2
    }
    for (p <- Seq(true, false))
      println(f"[persist-ab] $dir persistIndex=$p median=${median(samples(p))}%.2f s " +
        s"samples=${samples(p).map(x => f"$x%.2f").mkString(",")}")
    s.stop()
  }
}
