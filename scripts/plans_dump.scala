val s = graft.SparkTestBase.spark
val sfd = "/root/testdata/sf0.001"
val headline = Seq("q01_interval_agg","q04_interesting_keys","q09_nearby_selfjoin","q15_asof_join","q18_revenue_join","q37_vocab_topk","q41_chunk_documents","q22_dedup_ngram_jaccard","q23_dedup_minhash_lsh","q26_ann_bruteforce","q36_asof_native","q48_ann_ivf","q49_decontaminate","q50_mix_epochs","q51_pivot_hours","q52_dedup_jaccard_capped","q54_chunk_dedup","q55_token_budget","q56_decontaminate_bloom","q57_incremental_dedup","q58_repetition_profile","q59_weighted_sample")
val sb = new StringBuilder
sb.append("# PLANS — formatted physical plans of headline queries (auto-generated, sf0.001)\n\n")
sb.append("Regenerate: `sbt Test/console < scripts/plans_dump.scala` (see scripts/check.py header for the verify loop).\n")
headline.foreach { name =>
  val df = graft.SparkEntry.queries(name)(s, sfd)
  df.count()
  sb.append(s"\n## $name\n\n```\n")
  sb.append(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
  sb.append("```\n")
}
java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE " + sb.length)
sys.exit(0)
