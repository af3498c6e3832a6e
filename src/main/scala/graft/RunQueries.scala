package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: run a subset of SparkEntry.queries by name (or all, with
  * `all`) against a testdata dir and print row counts / schemas / timings.
  * Usage: runMain graft.RunQueries <sfDir> <q1,q2,...|all> [explain]
  */
object RunQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names =
      if (args.length < 2 || args(1) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").toSeq
    val explain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (explain) df.explain("formatted")
        val n = df.count()
        val secs = (System.nanoTime() - t0) / 1e9
        val schema = df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
        println(f"OK   $name rows=$n%-8d ${secs}%5.2fs  $schema")
      } catch { case e: Throwable =>
        println(s"FAIL $name ${e.toString.linesIterator.next().take(300)}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
