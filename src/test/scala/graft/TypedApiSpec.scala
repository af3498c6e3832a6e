package graft

import graft.api.Typed
import org.apache.spark.sql.functions._

class TypedApiSpec extends GraftSuite {
  import spark.implicits._

  test("typed events dataset round-trips the schema") {
    val ds = Typed.events(spark, sf)
    val one = ds.head()
    assert(one.event_id >= 0 && one.user_id >= 0)
    assert(ds.count() == graft.sources.Readers.table(spark, sf, "events").count())
  }

  test("typed userActivity agrees with the relational aggregation") {
    val ds = Typed.events(spark, sf)
    val typed = Typed.userActivity(ds)
      .select($"user_id", $"n_events", $"n_errors")
      .orderBy("user_id").collect().toSeq
    val relational = graft.sources.Readers.table(spark, sf, "events")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("n_errors"))
      .select($"user_id", $"n_events", $"n_errors")
      .orderBy("user_id").collect().toSeq
    assert(typed == relational)
  }

  test("typed userActivity survives NaN/Infinite event values (r8 ADVICE fix)") {
    import graft.api.Event
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ds = Seq(
      Event(1L, ts, 7L, "view", 1.5, "{}"),
      Event(2L, ts, 7L, "view", Double.NaN, "{}"),
      Event(3L, ts, 8L, "view", Double.PositiveInfinity, "{}"),
      Event(4L, ts, 8L, "view", 2.0, "{}"),
      Event(5L, ts, 9L, "view", 3.0, "{}")).toDS()
    val got = Typed.userActivity(ds).collect().map(u => u.user_id -> u.total_value).toMap
    // BigDecimal can't hold NaN/Inf — the fix accumulates finite values
    // exactly and lets non-finite ones poison the total IEEE-style
    assert(got(7L).isNaN, "NaN value must propagate, not crash the task")
    assert(got(8L).isPosInfinity)
    assert(got(9L) == 3.0)
  }

  test("typed document filter+map") {
    val got = Typed.longDocTokenCounts(Typed.documents(spark, sf), 300L).collect()
    assert(got.nonEmpty)
    assert(got.forall(_._2 >= 10))
  }

  test("typed embeddings expose Array[Float] vectors") {
    val e = Typed.embeddings(spark, sf).head()
    assert(e.embedding.length == 64)
  }

  test("typed facades survive null-text documents (null = empty doc contract, r8 review fix)") {
    import graft.api.Document
    val docs = Seq(
      Document(1L, "the quick brown fox jumps over it", "en", "a", 33L),
      Document(2L, null, "en", "a", 0L),
      Document(3L, null, "fr", "b", 0L),
      Document(4L, "", "en", "a", 0L)).toDS()
    // exactDedup: null and empty texts form ONE group (null = empty)
    val groups = Typed.exactDedup(docs).collect()
    val emptyGroup = groups.filter(_.n_copies == 3L)
    assert(emptyGroup.length == 1 && emptyGroup.head.keeper_id == 2L,
      s"null+empty docs must group together: ${groups.toSeq}")
    // jaccardPairs: null texts shingle nowhere — no crash, no pair rows
    assert(!Typed.jaccardPairs(docs, 3, 0.1, Long.MaxValue).collect()
      .exists(p => p.doc_a >= 2L && p.doc_a <= 4L))
    // blocklist: zero tokens/hits keep the doc, all fields defined
    val bl = Typed.blocklist(docs, Seq("fox"), 0).collect()
      .map(v => v.doc_id -> v).toMap
    assert(!bl(1L).keep && bl(2L).keep && bl(2L).n_hits == 0L)
    // qualityEnsemble: unscoreable docs fail the gates closed
    val q = Typed.qualityEnsemble(docs, "en", 0.1, 430, 250).collect()
      .map(v => v.doc_id -> v).toMap
    assert(!q(2L).keep && !q(3L).keep, "null-text docs must not pass the gate")
  }

  test("typed jaccardPairs with MaxValue routes to the true uncapped operator (r8 review fix)") {
    val ds = Typed.documents(spark, sf)
    val plan = Typed.jaccardPairs(ds, 3, 0.5, Long.MaxValue)
      .queryExecution.analyzed.toString
    // the capped form's signature is its per-bucket collect_list; the
    // uncapped delegate must not contain one
    assert(!plan.contains("collect_list"),
      "MaxValue must select the streaming self-join, not the capped collect_list path")
  }

  test("typed exactDedup equals the relational operator (r8)") {
    val ds = Typed.documents(spark, sf)
    val typed = Typed.exactDedup(ds)
      .collect().map(g => (g.content_hash, g.keeper_id, g.n_copies)).toSet
    val rel = graft.operators.Dedup.exact(ds.toDF(), $"doc_id", $"text")
      .as[(Long, Long, Long)].collect().toSet
    assert(typed == rel && typed.nonEmpty)
  }

  test("typed jaccardPairs returns NearDupPair rows (r8)") {
    // two near-dup docs + one unrelated: typed pairs carry the same
    // (doc_a, doc_b, jaccard) rows as the relational operator
    val docs = Seq(
      graft.api.Document(1L, "the quick brown fox jumps over the lazy dog", "en", "a", 43L),
      graft.api.Document(2L, "the quick brown fox jumps over the lazy cat", "en", "a", 43L),
      graft.api.Document(3L, "completely different words here entirely now", "en", "b", 45L)).toDS()
    val typed = Typed.jaccardPairs(docs, 3, 0.3, Long.MaxValue)
      .collect().map(p => (p.doc_a, p.doc_b, p.jaccard)).toSet
    val rel = graft.operators.Dedup.ngramJaccardPairsCapped(docs.toDF(),
        $"doc_id", $"text", 3, 0.3, Long.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    assert(typed == rel)
    assert(typed.exists { case (a, b, _) => a == 1L && b == 2L })
  }

  test("typed blocklist and qualityEnsemble verdicts line up with q89/q92 operators (r8)") {
    val ds = Typed.documents(spark, sf)
    val typedBl = Typed.blocklist(ds, Seq("the", "and"), 100)
      .collect().map(v => (v.doc_id, v.n_tokens, v.n_hits, v.n_terms, v.keep)).toSet
    val relBl = graft.operators.Scoring.blocklistFilter(ds.toDF(), $"doc_id",
        $"text", Seq("the", "and"), 100)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(typedBl == relBl && typedBl.nonEmpty)
    val typedQ = Typed.qualityEnsemble(ds, "en", 0.5, 430, 250)
      .collect().map(v =>
        (v.doc_id, v.heur_pass, v.gopher_pass, v.clf_pass, v.lm_pass, v.keep)).toSet
    val relQ = graft.operators.Scoring.filterEnsemble(ds.toDF(), $"doc_id",
        $"text", $"lang" === "en", 0.5, 430, 250)
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect().toSet
    assert(typedQ == relQ && typedQ.nonEmpty)
    // the verdict conjunction is internally consistent
    assert(typedQ.forall { case (_, h, g, c, l, k) => k == (h && g && c && l) })
  }

  test("typed annTopK equals the relational brute-force top-k (r9)") {
    val embs = Typed.embeddings(spark, sf)
    val queries = embs.filter(_.vec_id < 10L)
    val typed = Typed.annTopK(embs, queries, 5)
      .collect().map(n => (n.query_id, n.neighbor_id, n.cos, n.rnk)).toSet
    val rel = graft.operators.Similarity.bruteForceTopK(embs.toDF(),
        queries.toDF(), "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id", $"cos", $"rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(typed == rel && typed.nonEmpty)
    // k rows per query, ranks 1..k
    assert(typed.groupBy(_._1).forall { case (_, rows) =>
      rows.size == 5 && rows.map(_._4).toSeq.sorted == (1L to 5L) })
  }

  test("typed annTopKIvf equals the relational IVF top-k and, probe-all, the exact ranking (r9)") {
    val embs = Typed.embeddings(spark, sf)
    val queries = embs.filter(_.vec_id < 5L)
    val typed = Typed.annTopKIvf(embs, queries, 5, numCells = 4, nProbe = 4)
      .collect().map(n => (n.query_id, n.neighbor_id, n.cos, n.rnk)).toSet
    val rel = graft.operators.Similarity.ivfTopK(embs.toDF(), queries.toDF(),
        "vec_id", "embedding", 5, 4, 4)
      .select($"query_id", $"neighbor_id", $"cos", $"rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(typed == rel && typed.nonEmpty)
    // nProbe == numCells probes every cell, so the typed IVF result must
    // equal the typed exact result — recall via a typed join of the facades
    val exact = Typed.annTopK(embs, queries, 5)
      .collect().map(n => (n.query_id, n.neighbor_id, n.cos, n.rnk)).toSet
    assert(typed == exact)
  }

  test("typed describe equals the relational describeProfile (r9)") {
    val ev = Typed.events(spark, sf)
    val typed = Typed.describe(ev, Seq("value"))
      .collect().map(p => (p.column_name, p.n, p.mean, p.stddev,
        p.min_value, p.q25, p.median, p.q75, p.max_value)).toSet
    val rel = graft.operators.Relational.describeProfile(ev.toDF(),
        Seq("value" -> $"value"))
      .as[(String, Long, Double, Option[Double], Double, Double, Double, Double, Double)]
      .collect().toSet
    assert(typed == rel && typed.size == 1)
    val p = typed.head
    assert(p._5 <= p._6 && p._6 <= p._7 && p._7 <= p._8 && p._8 <= p._9,
      s"quartile ordering violated: $p")
  }

  test("typed correlation equals the relational correlationMatrix and is None on a constant column (r9)") {
    val ev = Typed.events(spark, sf).toDF()
      .withColumn("v2", $"value" * 2 + 1)
      .withColumn("konst", lit(5.0))
    val typed = Typed.correlation(ev.as[org.apache.spark.sql.Row](
        org.apache.spark.sql.Encoders.row(ev.schema)),
        Seq("value", "v2", "konst"))
      .collect().map(c => (c.x_col, c.y_col, c.n, c.corr)).toSet
    val rel = graft.operators.Relational.correlationMatrix(ev,
        Seq("value" -> $"value", "v2" -> $"v2", "konst" -> $"konst"))
      .as[(String, String, Long, Option[Double])].collect().toSet
    assert(typed == rel && typed.size == 3)
    val m = typed.map(c => (c._1, c._2) -> c._4).toMap
    // a perfect linear map correlates at exactly 1.0; a constant column has
    // no defined correlation (typed as None, pandas NaN)
    assert(m(("value", "v2")).contains(1.0))
    assert(m(("value", "konst")).isEmpty && m(("v2", "konst")).isEmpty)
  }

  test("typed bpeTokenize equals the relational bpeEncode and treats null text as empty (r9)") {
    import graft.api.Document
    import graft.operators.Bpe
    val docs = Seq(
      Document(1L, "low low newest", "en", "a", 14L),
      Document(2L, null, "en", "a", 0L),
      Document(3L, "lower widest", "en", "b", 12L)).toDS()
    val merges = Bpe.bpeTrain(docs.toDF(), coalesce($"text", lit("")), 6)
    val typed = Typed.bpeTokenize(docs, merges)
      .collect().map(p => (p.doc_id, p.n_words, p.n_tokens, p.fertility)).toSet
    val rel = Bpe.bpeEncode(docs.toDF(), $"doc_id", coalesce($"text", lit("")), merges)
      .as[(Long, Long, Long, Option[Double])].collect().toSet
    assert(typed == rel && typed.size == 3)
    val m = typed.map(p => p._1 -> p).toMap
    assert(m(2L) == ((2L, 0L, 0L, None)), "null text = empty doc: zero counts, no fertility")
    assert(m(1L)._2 == 3L && m(1L)._3 > 0L && m(1L)._4.nonEmpty)
  }

  test("typed sessionize equals the relational operator on the events table (r10)") {
    import graft.operators.TimeSeries
    val ds = Typed.events(spark, sf)
    val typed = Typed.sessionize(ds, gapMs = 30 * 60 * 1000L)
      .select($"event_id", $"session_id").as[(Long, Long)].collect().toSet
    val rel = TimeSeries.sessionize(
        graft.sources.Readers.table(spark, sf, "events"),
        $"user_id", $"ts", 30 * 60 * 1000L)
      .select($"event_id", $"session_id").as[(Long, Long)].collect().toSet
    assert(typed == rel && typed.nonEmpty)
  }

  test("typed asOfJoin pairs each event with its latest preceding reading, None on a miss (r10)") {
    import graft.api.{Event, RefReading}
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      Event(1L, t("2024-01-01 10:00:00"), 7L, "view", 1.0, "{}"),
      Event(2L, t("2024-01-01 12:00:00"), 7L, "view", 2.0, "{}"),
      Event(3L, t("2024-01-01 09:00:00"), 8L, "view", 3.0, "{}"), // before any ref
      Event(4L, t("2024-01-01 11:00:00"), 9L, "view", 4.0, "{}")  // user with no refs
    ).toDS()
    val refs = Seq(
      RefReading(7L, t("2024-01-01 09:30:00"), 10.0),
      RefReading(7L, t("2024-01-01 12:00:00"), 20.0), // ties are inclusive (<=)
      RefReading(8L, t("2024-01-01 10:30:00"), 30.0)
    ).toDS()
    val got = Typed.asOfJoin(events, refs)
      .collect().map { case (e, r) => e.event_id -> r }.toMap
    assert(got(1L).contains(RefReading(7L, t("2024-01-01 09:30:00"), 10.0)))
    assert(got(2L).contains(RefReading(7L, t("2024-01-01 12:00:00"), 20.0)),
      "an equal-timestamp reading must match (inclusive as-of)")
    assert(got(3L).isEmpty && got(4L).isEmpty,
      "events with no preceding reading must carry None, not a leaked value")
    // row-for-row parity with the relational union-and-carry operator
    val rel = graft.operators.TimeSeries.asofJoin(events.toDF(),
        refs.toDF().select($"user_id", $"ts", $"ref_value"),
        key = "user_id", tsCol = "ts", carry = Seq("ref_value"))
      .select($"event_id", $"ref_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(got.view.mapValues(_.map(_.ref_value)).toMap == rel)
  }

  test("typed chunk/pack equal the relational q41/q44 operators (r10)") {
    import graft.operators.Relational
    val docs = Typed.documents(spark, sf)
    val typedChunks = Typed.chunkDocuments(docs, 20, 10)
    val relChunks = Relational.chunkDocuments(docs.toDF(), $"doc_id", $"text", 20, 10)
    assert(typedChunks.collect().map(c => (c.doc_id, c.chunk_idx, c.chunk_text)).toSet ==
      relChunks.as[(Long, Long, String)].collect().toSet)
    val typedPacks = Typed.packChunks(typedChunks, 100, 8L)
      .collect().map(p => (p.doc_id, p.chunk_idx, p.n_tok, p.shard, p.pack_id)).toSet
    val relPacks = Relational.sequencePack(relChunks, $"doc_id", $"chunk_idx",
        $"chunk_text", 100, 8L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(typedPacks == relPacks && typedPacks.nonEmpty)
    // pack ids are shard-scoped: every pack's chunks share one shard
    assert(typedPacks.groupBy(_._5).forall(_._2.map(_._4).size == 1))
  }

  test("typed thresholdSweep equals the relational sweep (r10)") {
    import graft.api.ScoredWeight
    val ds = Seq(ScoredWeight(1L, 10L, 100L), ScoredWeight(2L, 20L, 50L),
      ScoredWeight(3L, 10L, 25L), ScoredWeight(4L, 30L, 10L)).toDS()
    val typed = Typed.thresholdSweep(ds)
      .collect().map(p => (p.score, p.n_docs_at, p.n_docs_kept, p.weight_kept)).toSet
    val rel = graft.operators.Scoring.thresholdSweep(ds.toDF(), $"score", $"weight")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(typed == rel)
    assert(typed == Set((30L, 1L, 1L, 10L), (20L, 1L, 2L, 60L), (10L, 2L, 4L, 185L)))
  }

  test("typed dupSpanCoverage/dedupNormalized/scriptProfile equal the relational operators (r11)") {
    val ds = Typed.documents(spark, sf)
    val cov = Typed.dupSpanCoverage(ds, 20)
      .collect().map(c => (c.doc_id, c.n_cp, c.covered_cp, c.dup_ratio)).toSet
    val covRel = graft.operators.Dedup.dupSpanCoverage(ds.toDF(), $"doc_id",
        $"text", 20)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(cov == covRel && cov.size == ds.count())
    val grp = Typed.dedupNormalized(ds)
      .collect().map(g => (g.keeper_id, g.n_copies, g.n_variants)).toSet
    val grpRel = graft.operators.Dedup.exactNormalized(ds.toDF(), $"doc_id",
        $"text")
      .select($"keeper_id", $"n_copies", $"n_variants")
      .as[(Long, Long, Long)].collect().toSet
    assert(grp == grpRel && grp.toSeq.map(_._2).sum == ds.count(),
      "groups must partition the corpus")
    val sp = Typed.scriptProfile(ds)
      .collect().map(p => (p.doc_id, p.latin, p.other, p.dominant_script)).toSet
    val spRel = graft.operators.Scoring.scriptProfile(ds.toDF(), $"doc_id",
        $"text")
      .select($"doc_id", $"latin", $"other", $"dominant_script")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(sp == spRel && sp.size == ds.count())
  }

  test("typed snapshotDiff/imageHashes/imageNearDups equal the relational operators (r11)") {
    import graft.api.MediaBlob
    val ds = Typed.documents(spark, sf)
    val m = org.apache.spark.sql.functions.pmod($"doc_id",
      org.apache.spark.sql.functions.lit(7L))
    val v1 = ds.filter(m =!= 2).toDF()
      .withColumn("text", org.apache.spark.sql.functions.concat($"text",
        org.apache.spark.sql.functions.lit(" x")))
      .withColumn("n_chars", $"n_chars" + 2L)
      .as[graft.api.Document]
    val typed = Typed.snapshotDiff(ds, v1)
      .collect().map(c => (c.doc_id, c.status)).toSet
    val rel = graft.operators.Relational.snapshotDiff(ds.toDF(), v1.toDF(),
        Seq("doc_id"), Seq("text", "lang", "source", "n_chars"))
      .as[(Long, String)].collect().toSet
    assert(typed == rel && typed.nonEmpty)
    assert(typed.forall(c => c._2 == "changed" || c._2 == "removed"))

    val media = graft.operators.Multimodal
      .synthImageTable(ds.toDF(), "doc_id", groups = 40).as[MediaBlob]
    val th = Typed.imageHashes(media)
      .collect().map(h => (h.doc_id, h.dhash, h.format)).toSet
    val rh = graft.operators.Multimodal.imageHashes(media.toDF())
      .as[(Long, Long, String)].collect().toSet
    assert(th == rh && th.size == ds.count())
    val tp = Typed.imageNearDups(media, maxHamming = 8)
      .collect().map(p => (p.doc_a, p.doc_b, p.hamming)).toSet
    val rp = graft.operators.Multimodal.imageNearDups(media.toDF(), 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(tp == rp && tp.nonEmpty)

    val audio = graft.operators.Multimodal
      .synthAudioTable(ds.toDF(), "doc_id").as[MediaBlob]
    val ta = Typed.audioHashes(audio)
      .collect().map(h => (h.doc_id, h.ahash, h.sample_rate, h.channels)).toSet
    val ra = graft.operators.Multimodal.audioHashes(audio.toDF())
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(ta == ra && ta.size == ds.count())
  }

  test("typed annTopKInt/nearDupAuto equal the relational operators (r12)") {
    val embs = Typed.embeddings(spark, sf)
    val queries = embs.filter(_.vec_id < 5L)
    val typed = Typed.annTopKInt(embs, queries, 5, planesPerTable = 4,
        numTables = 16, dims = 64)
      .collect().map(n => (n.query_id, n.neighbor_id, n.dot, n.cos, n.rnk)).toSet
    val rel = graft.operators.Similarity.intLshTopK(embs.toDF(), queries.toDF(),
        "vec_id", "embedding", 5, 4, 16, 64)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    assert(typed == rel && typed.nonEmpty)

    val ds = Typed.documents(spark, sf)
    val tr = Typed.nearDupAuto(ds)
      .collect().map(p => (p.doc_a, p.doc_b, p.method, p.score)).toSet
    val rr = graft.operators.Dedup.nearDupAuto(ds.toDF(),
        $"doc_id", coalesce($"text", lit("")))
      .as[(Long, Long, String, Double)].collect().toSet
    assert(tr == rr)
    // the sf0.001 documents corpus is long-tailed realistic text: the
    // router must measure it into the dfcap branch
    assert(tr.isEmpty || tr.forall(_._3 == "dfcap"))
  }

  test("typed videoContentHashes equals the relational operator (r13)") {
    val docs = Typed.documents(spark, sf)
    val media = graft.operators.Multimodal
      .synthVideoContentTable(docs.toDF(), "doc_id", groups = 40L)
      .as[graft.api.MediaBlob]
    val typed = Typed.videoContentHashes(media)
      .collect().map(v => (v.doc_id, v.n_frames, v.vhash)).toSet
    val rel = graft.operators.Multimodal.videoContentHashes(media.toDF())
      .as[(Long, Long, Long)].collect().toSet
    assert(typed == rel && typed.nonEmpty)
  }

  test("typed pmiPairs equals the relational operator and tolerates null text (r13)") {
    val docs = Typed.documents(spark, sf)
    val typed = Typed.pmiPairs(docs, n = 3, minDf = 2L, minSupport = 2L, topK = 50)
      .collect().map(p => (p.term_a, p.term_b, p.c_ab, p.c_a, p.c_b, p.lift)).toSet
    val rel = graft.operators.Scoring.pmiPairs(docs.toDF(),
        col("doc_id"), col("text"), n = 3, minDf = 2L, maxDf = 50L,
        minSupport = 2L, topK = 50)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(typed == rel && typed.nonEmpty)
    // null text routes through the empty-doc contract: a null-text doc
    // contributes exactly what an empty-text doc contributes (advisor r13:
    // the old `!= null` assert was vacuous — collect never returns null)
    val withNull = docs.map(d => if (d.doc_id == 1L) d.copy(text = null) else d)
    val withEmpty = docs.map(d => if (d.doc_id == 1L) d.copy(text = "") else d)
    val pairsOf = (ds: org.apache.spark.sql.Dataset[graft.api.Document]) =>
      Typed.pmiPairs(ds, minDf = 2L)
        .collect().map(p => (p.term_a, p.term_b, p.c_ab, p.c_a, p.c_b, p.lift)).toSet
    assert(pairsOf(withNull) == pairsOf(withEmpty))
  }
}
