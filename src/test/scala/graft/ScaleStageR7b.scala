package graft

import graft.operators.{Dedup, Relational, Scoring}
import org.apache.spark.sql.functions._

/** Staged 10×/100× measurements for the round-7b operators (q85–q88 +
  * bpeEncode), same method as the earlier scale stages: id-shifted copies
  * of sf0.1 to 6M rows / 500k docs / 500k vectors, noop sink, wall-clock
  * printed. Run: `sbt "Test/runMain graft.ScaleStageR7b"`. Evidence
  * recorded in SURVEY §5.
  */
object ScaleStageR7b {
  def main(args: Array[String]): Unit = {
    val s = SparkTestBase.spark
    import s.implicits._
    s.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scaleR7b] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- 6M-row fact table (10 copies of sf0.1 lineitem; the price shift
    // makes the melt's distinct-value surface grow with the copies too)
    val li = graft.sources.Readers.table(s, "/root/testdata/sf0.1", "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax")
    val liStaged = (0 until 10).map(i => li.select(
        ($"l_orderkey" + lit(i * 100000000L)).as("l_orderkey"), $"l_quantity",
        ($"l_extendedprice" + lit(i.toDouble)).as("l_extendedprice"),
        $"l_discount", $"l_tax"))
      .reduce(_ unionByName _).repartition(32).localCheckpoint()
    println(s"staged lineitem rows: ${liStaged.count()}")

    time("correlationMatrix over 6M rows x 4 cols (6 pairs, one HashAggregate pass)") {
      val out = Relational.correlationMatrix(liStaged, Seq(
        "l_quantity" -> $"l_quantity", "l_extendedprice" -> $"l_extendedprice",
        "l_discount" -> $"l_discount", "l_tax" -> $"l_tax"))
      println("[scaleR7b] " + out.orderBy("x_col", "y_col").collect()
        .map(r => s"${r.getString(0)}~${r.getString(1)}=${r.get(3)}").mkString(" "))
    }

    // ---- 500k docs (100 id-shifted copies => 100-wide exact-dup cliques)
    val docs = graft.sources.Readers.table(s, "/root/testdata/sf0.1", "documents")
      .select($"doc_id", $"text")
    val docsStaged = (0 until 100).map(i => docs.select(
        ($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"text"))
      .reduce(_ unionByName _).repartition(64).localCheckpoint()
    println(s"staged docs: ${docsStaged.count()}")

    // the df cap is the direct guard: clique shingles carry df >= 100 and
    // are excluded from candidate generation, so the capped operator is
    // immune to the adversarial clique BY CONSTRUCTION (clique pairs are
    // exact dups — Dedup.exact's linear job, the q23 exact-first rule)
    time("ngramContainmentPairs capped (maxDocFreq=50) on 500k docs") {
      noop(Dedup.ngramContainmentPairs(docsStaged, $"doc_id", $"text", 3, 0.8,
        maxDocFreq = 50L))
    }
    time("exact-first + capped containment (the composed q23-style path)") {
      val keepers = Dedup.exact(docsStaged, $"doc_id", $"text")
        .select($"keeper_id".as("doc_id"))
      val uniq = docsStaged.join(keepers, "doc_id")
      noop(Dedup.ngramContainmentPairs(uniq, $"doc_id", $"text", 3, 0.8,
        maxDocFreq = 50L))
    }

    // thresholdSweep at 500k docs: LM scores collapse map-side to <= ~1000
    // distinct per-mille values; the cumulative window sees only those.
    // The scored table is checkpointed first so the sweep's OWN cost is
    // visible (the upstream charLM train+score is the dominant, linear,
    // already-q74-measured part)
    var scoredStaged: org.apache.spark.sql.DataFrame = null
    time("charLM FUSED train + FUSED score 500k docs (native CharBigramCounts + CharLmScore; composed 195.6-227 s, fused-score-only 130.6 s)") {
      val model = Scoring.trainCharBigramLmFused(docsStaged, $"text")
      val scored = Scoring.scoreCharBigramLmFused(docsStaged, $"doc_id", $"text", model)
        .select($"_sid".as("doc_id"), $"avg_permille")
      scoredStaged = scored.join(docsStaged.select($"doc_id",
          size(graft.functions.TextFns.tokens($"text")).cast("long").as("n_toks")),
        "doc_id").localCheckpoint()
    }
    time("thresholdSweep alone on the 500k scored rows") {
      noop(Scoring.thresholdSweep(scoredStaged, $"avg_permille", $"n_toks"))
    }

    // hashed-linear (fastText-shape) filter at 500k docs: composed
    // explode+join vs the fused dense-weight walk — same train both times
    // (train is one explode + aggregate-sized groupBy, the q37 exchange)
    val labeled = docsStaged.withColumn("y", pmod($"doc_id", lit(2L)) === 0L)
    val hlModel = Scoring.trainHashedLinear(labeled, $"text", $"y", 4096)
      .localCheckpoint()
    time("hashed-linear COMPOSED score 500k docs") {
      noop(Scoring.scoreHashedLinear(docsStaged, $"doc_id", $"text", hlModel, 4096))
    }
    time("hashed-linear FUSED score 500k docs (native HashedLinearScore)") {
      noop(Scoring.scoreHashedLinearFused(docsStaged, $"doc_id", $"text", hlModel, 4096))
    }

    // bpeEncode at 500k docs: the encode itself is VOCAB-sized (distinct
    // words are identical across the 100 copies), so cost is the corpus
    // tokenize + join-back, not 100x the encode work
    time("bpeEncode (200 trained merges) on 500k docs") {
      val merges = operators.Bpe.bpeTrain(docs, $"text", 200)
      noop(operators.Bpe.bpeEncode(docsStaged, $"doc_id", $"text", merges))
    }

    // ---- 500k vectors (250 copies of sf0.1 embeddings), 5% held out
    val embs = graft.sources.Readers.table(s, "/root/testdata/sf0.1", "embeddings")
      .select($"vec_id", $"embedding")
    val embsStaged = (0 until 250).map(i => embs.select(
        ($"vec_id" + lit(i * 1000000L)).as("vec_id"), $"embedding"))
      .reduce(_ unionByName _).repartition(32).localCheckpoint()
    println(s"staged vectors: ${embsStaged.count()}")
    // held-out = COPY 0 of every 20th base vector (~100 rows); its 249
    // id-shifted copies stay in train as exact cross-split twins, so the
    // true drop set is ~24.9k and nonempty BY CONSTRUCTION (a mod-20
    // filter on the shifted ids would put every twin of a held vector
    // back in held — the i*1e6 shift preserves vec_id % 20)
    val isHeld = $"vec_id" < 1000000L && pmod($"vec_id", lit(20L)) === 0L
    val held = embsStaged.filter(isHeld)
    val train = embsStaged.filter(!isHeld)
    time("semanticDecontaminate ~500k train vs copy-0 held slice (256 cells, 1 Lloyd, minCos 0.999)") {
      val v = Dedup.semanticDecontaminate(train, held, "vec_id", "embedding",
        k = 256, iters = 1, minCos = 0.999)
      val total = v.count()
      val dropped = v.filter(!$"is_kept").count()
      println(s"[scaleR7b] decontaminate dropped $dropped of $total train vectors")
    }

    s.stop()
  }
}
