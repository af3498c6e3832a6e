package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query → noop sink, per-query MEDIAN of
  * `SPARK_GRAFT_BENCH_REPS` runs (default 3 — this box shows ±40% noise with
  * occasional 4× single-query spikes, so a single reading is not a
  * measurement). Caches and lingering checkpoint blocks are cleared between
  * runs so no query is timed against another query's session state.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    // a typo'd query name must fail loudly, not silently bench nothing
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}\n" +
        s"known: ${SparkEntry.queries.keySet.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the generated-class cache defaults to 100 entries; 68 queries × many
      // codegen stages per pass evict every query's classes between its
      // interleaved reps, so each timed sample would re-pay janino
      // compilation + cold JIT — the exact cost the untimed warmup pass
      // exists to exclude. Static conf: must be set before session creation.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selectedEarly =
      if (args.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.view.filterKeys(args.toSet).toSeq.sortBy(_._1)
    // the metric line keys queries by their unique qNN prefix; a collision
    // must fail NOW, not after the full multi-minute benchmark has run
    val shortKey: String => String = { name =>
      val p = name.takeWhile(_ != '_')
      if (p.nonEmpty) p else name
    }
    require(selectedEarly.map(q => shortKey(q._1)).distinct.size == selectedEarly.size,
      "query name prefixes must be unique for the bench metric line")
    def resetSessionState(): Unit = {
      // drop caches AND checkpoint blocks left by eager operators, so the
      // next timed run starts from a cold, honest session
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val selected = selectedEarly
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      // noop sink: forces full evaluation of every output column (count()
      // would let Catalyst prune the computed projections being measured)
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    // pass 0 — one UNTIMED warmup per query: whole-stage codegen compiles
    // and the JIT warms here, so the timed reps measure the engine, not
    // first-run compilation (a large share of observed ±40% noise)
    selected.foreach { case (_, fn) =>
      try runOnce(fn)
      catch { case _: Throwable => () /* the timed passes report the failure */ }
    }
    // timed passes are INTERLEAVED (all queries once, then all again…), not
    // per-query back-to-back: this box shows multi-minute external noise
    // windows, and consecutive reps let one window poison every rep of the
    // same query (observed: a query's 3 back-to-back reps at ~40× its
    // quiet-box time). Spread ~minutes apart, a window inflates at most one
    // sample per query and the median survives.
    val failedSet = scala.collection.mutable.Set[String]()
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
    for (_ <- 0 until reps; (name, fn) <- selected if !failedSet(name)) {
      resetSessionState()
      val t0 = System.nanoTime()
      try {
        runOnce(fn)
        samples(name) = samples.getOrElse(name, Vector.empty) :+
          (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failedSet += name
      }
    }
    val results = selected.map { case (name, _) =>
      // -1 marks failure in the JSON — a broken query must not look like a
      // fast pass to anything consuming only the metric line
      val ts = samples.getOrElse(name, Vector.empty)
      if (failedSet(name) || ts.isEmpty) (name, -1.0, -1.0)
      else (name, median(ts), ts.min)
    }
    // locale-stable fixed-decimal rendering: the final stdout line must fit
    // the consumer's bounded tail capture (observed 2000 chars) — at 64+
    // queries the default 9-decimal Double rendering alone overflows it.
    // Round 3 lost its official record to exactly this.
    def fd(v: Double, scale: Int): String =
      BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString
    def f3(v: Double): String = fd(v, 3)
    // machine-read line uses the unique qNN prefix as the key ("q63" for
    // "q63_ann_pq") so the line stays ~1 KB at any query count — full names
    // at 66 queries leave <100 chars of tail headroom, one failed-query name
    // away from a lost round record. Prefixes were asserted unique up
    // front; the full-name 3-decimal detail lives on the stderr line.
    val qs = results.map { case (k, v, _) => s"\"" + shortKey(k) + "\":" + fd(v, 2) }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, _, m) => s"\"" + k + "\":" + f3(m) }
      .mkString("{", ",", "}")
    // total over SUCCEEDED queries only: summing the -1 sentinels would make
    // a broken query LOWER the total — a regression reading as a speedup.
    // Failures are surfaced both per-query (-1) and in an explicit list.
    val failedNames = results.collect { case (k, v, _) if v < 0 => "\"" + k + "\"" }
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    // min-of-reps is reported on STDERR alongside the median headline: on a
    // contended box the median absorbs external load while the min is the
    // best evidence of what the engine itself costs (they agree on a quiet
    // box). It lives on stderr so the machine-read stdout metric line stays
    // the LAST line and small enough for a bounded tail capture.
    val totalMin = results.collect { case (_, v, m) if v >= 0 => m }.sum
    System.err.println(s"""{"detail":"min_of_reps","total_min":${f3(totalMin)},"failed":${failedNames.mkString("[", ",", "]")},"queries_min":$qsMin}""")
    // stop BEFORE the metric line: Spark's shutdown hooks log warnings, and
    // anything printed after this line pushes it out of the bounded tail.
    // A failing stop() must not cost the run its record — the timings exist.
    try spark.stop()
    catch { case e: Throwable => System.err.println(s"[bench] stop failed: ${e.getMessage}") }
    val failedShort = results.collect { case (k, v, _) if v < 0 => "\"" + shortKey(k) + "\"" }
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","reps":$reps,"failed":${failedShort.mkString("[", ",", "]")},"queries":$qs,"sf":"$sfDir"}""")
  }
}
