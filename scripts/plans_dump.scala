val s = graft.SparkTestBase.spark
val sfd = "/root/testdata/sf0.001"
val names = graft.SparkEntry.queries.keys.toSeq.sorted
val sb = new StringBuilder
sb.append("# PLANS — formatted physical plans of ALL contract queries (auto-generated, sf0.001)\n\n")
sb.append("Regenerate: `sbt Test/console < scripts/plans_dump.scala` (see scripts/check.py header for the verify loop).\n")
names.foreach { name =>
  val df = graft.SparkEntry.queries(name)(s, sfd)
  df.count()
  sb.append(s"\n## $name\n\n```\n")
  sb.append(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
  sb.append("```\n")
}
java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE " + sb.length)
sys.exit(0)
