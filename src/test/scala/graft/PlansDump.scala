package graft

/** Regenerates PLANS.md: the formatted physical plan of every contract
  * query at sf0.001. Run: `sbt "Test/runMain graft.PlansDump"`.
  * (Test scope so it can reuse SparkTestBase's session config; not part
  * of the shipped library.)
  */
object PlansDump {
  def main(args: Array[String]): Unit = {
    val s = SparkTestBase.spark
    val sfd = SparkTestBase.Sf
    val names = SparkEntry.queries.keys.toSeq.sorted
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of ALL contract queries (auto-generated, sf0.001)\n\n")
    sb.append("Regenerate: `sbt \"Test/runMain graft.PlansDump\"` (see scripts/check.py header for the verify loop).\n")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(s, sfd)
      df.count()
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println("WROTE " + sb.length)
    s.stop()
  }
}
