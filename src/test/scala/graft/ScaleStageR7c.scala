package graft

import graft.operators.{Dedup, Relational, Scoring}
import org.apache.spark.sql.functions._

/** Staged 100× measurements for the round-7c operators (q89–q91), same
  * method as the earlier stages: id-shifted copies of sf0.1 documents to
  * 500k docs (100-wide exact-dup cliques — the adversarial case for any
  * pair generator), noop sink, wall-clock printed.
  * Run: `sbt "Test/runMain graft.ScaleStageR7c"`. Evidence in SURVEY §5.
  */
object ScaleStageR7c {
  def main(args: Array[String]): Unit = {
    val s = SparkTestBase.spark
    import s.implicits._
    s.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scaleR7c] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.sources.Readers.table(s, "/root/testdata/sf0.1", "documents")
      .select($"doc_id", $"text", $"lang", $"source")
    val docsStaged = (0 until 100).map(i => docs.select(
        ($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"text", $"lang", $"source"))
      .reduce(_ unionByName _).repartition(64).localCheckpoint()
    println(s"staged docs: ${docsStaged.count()}")

    // pure map pass: the blocklist rides inside the fused expression, so
    // cost is one linear walk — the number to beat is the corpus scan
    time("blocklistFilter (fused, 4 words) on 500k docs") {
      noop(Scoring.blocklistFilter(docsStaged, $"doc_id", $"text",
        Seq("slow", "dup", "bogus", "scan"), 25))
    }

    // the df cap is the direct guard against the 100-wide clique: every
    // clique shingle carries df >= 100 and is excluded from candidate
    // generation entirely (clique members are exact dups — Dedup.exact's
    // linear job handles them first, the q23 exact-first rule)
    time("editDistancePairs capped (maxDocFreq=50) on 500k clique docs") {
      noop(Dedup.editDistancePairs(docsStaged, $"doc_id", $"text", 6,
        maxDist = 6, minCommon = 2L, maxDocFreq = 50L))
    }

    // banded-DP throughput: 20 SUFFIX-PERTURBED copies (near-dups, not
    // exact dups — each copy appends its own marker token) of 5k docs =
    // 100k docs in 20-wide near-dup cliques; candidates ~ C(20,2) x 5k
    // ~ 1M pairs, every one confirmed by the O(len*maxDist) threshold DP
    val perturbed = (0 until 20).map(i => docs.select(
        ($"doc_id" + lit(i * 1000000L)).as("doc_id"),
        concat($"text", lit(s" copymark$i")).as("text")))
      .reduce(_ unionByName _).repartition(64).localCheckpoint()
    println(s"perturbed docs: ${perturbed.count()}")
    time("editDistancePairs (~1M banded DP confirms) on 100k near-dup docs") {
      noop(Dedup.editDistancePairs(perturbed, $"doc_id", $"text", 6,
        maxDist = 12, minCommon = 2L, maxDocFreq = 1000L))
    }

    // the production seam for WIDE near-dup families: candidates from
    // LSH (4 band keys per doc — fan-out bounded by bands, not by
    // per-shingle df) into the composable confirm stage; same ~1M
    // confirmed pairs, without the Θ(k²·shingles) inverted-index join
    time("minhashLshPairs -> editDistanceConfirm on 100k near-dup docs") {
      val cand = Dedup.minhashLshPairs(perturbed, $"doc_id", $"text",
        shingleN = 6, numPerms = 32, rowsPerBand = 8, minEstJaccard = 0.5)
      noop(Dedup.editDistanceConfirm(cand, perturbed, $"doc_id", $"text",
        maxDist = 12))
    }

    // the assembled four-filter gate on 500k docs: rules map pass + two
    // model trainings + two fused scoring walks + two doc_id joins — the
    // charLM train pass (9.1 s standalone, R7b) should dominate
    time("filterEnsemble (4 gates) on 500k docs") {
      noop(graft.operators.Scoring.filterEnsemble(docsStaged, $"doc_id",
        $"text", $"lang" === "en", minQuality = 0.5, clfMinPermille = 430,
        lmMinPermille = 250))
    }

    // categorical describe on 500k docs; text is the high-cardinality
    // column (5k distinct values, every one tied at cnt=100 — the
    // tied-at-max filter + min runs over ALL of them, no window)
    time("describeObjectProfile (lang/source/text) on 500k docs") {
      noop(Relational.describeObjectProfile(docsStaged, Seq(
        "lang" -> $"lang", "source" -> $"source", "text" -> $"text")))
    }

    s.stop()
  }
}
