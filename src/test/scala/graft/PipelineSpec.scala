package graft

import graft.operators.{Relational, TimeSeries}
import graft.sources.{Readers, Writers}
import org.apache.spark.sql.functions._

/** End-to-end composition: the reference's whole ETL arc — ingest → repair
  * missing measures → enrich per-day flags → sessionize → windowed rollup →
  * partitioned sink → pruned read-back — as one library pipeline.
  */
class PipelineSpec extends GraftSuite {

  test("full ETL pipeline composes and round-trips through a partitioned sink") {
    val ev = Readers.table(spark, sf, "events")

    // 1. repair: error rows get the hour's min observed value
    val facts = ev.select(col("event_id"), col("user_id"), col("event_type"),
      date_trunc("hour", col("ts")).as("hour_ts"), col("ts"), col("value"))
    val fix = ev.filter(col("event_type") =!= "error")
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(min(col("value")).as("fixed_value"))
    val repairedRaw = Relational.repairUnion(facts, col("event_type") === "error",
      fix, Seq("hour_ts"), "value", "fixed_value")
    // hours with zero clean observations can't be imputed from the fix table
    // (left-join null) — fall back to the global minimum, as a real repair would
    val globalMin = ev.filter(col("event_type") =!= "error")
      .agg(min(col("value"))).head().getDouble(0)
    val repaired = repairedRaw.withColumn("value", coalesce(col("value"), lit(globalMin)))
    assert(repaired.count() == ev.count())
    assert(repaired.filter(col("value").isNull).count() == 0)

    // 2. enrich: per-(user, day) high-activity flag joined back
    val enriched = Relational.flagRollupJoin(
      repaired.withColumn("d_date", to_date(col("ts"))),
      col("user_id"), col("d_date"), col("value") > 150, "high_day")

    // 3. sessionize
    val sessioned = TimeSeries.sessionize(enriched, col("user_id"), col("ts"), 1800000L)
    assert(sessioned.filter(col("session_id") < 1).count() == 0)

    // 4. windowed rollup per session flag
    val rollup = TimeSeries.windowedAgg(sessioned, col("ts"), "1 hour",
      Seq(col("high_day")),
      Seq(count(lit(1)).as("n"), graft.functions.NumFns.roundHalfUp(sum(col("value")), 2).as("total")))
    assert(rollup.count() > 0)

    // 5. partitioned sink + pruned read-back
    val out = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    Writers.writePartitioned(sessioned.withColumn("src2", col("src")), out, Seq("src2"))
    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())
    val fixedOnly = back.filter(col("src2") === "fixed")
    assert(fixedOnly.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(src2"))
    assert(fixedOnly.count() == ev.filter(col("event_type") === "error").count())
  }

  test("training-data pipeline composes: dedup -> collapse -> decontaminate -> filter -> pack") {
    import graft.operators.Dedup
    val docs = Readers.table(spark, sf, "documents").select(col("doc_id"), col("text"))
    val n0 = docs.count()

    // 1. exact dedup: keep the min-id copy of every distinct text
    val keepers = docs.join(
      Dedup.exact(docs, col("doc_id"), col("text")).select(col("keeper_id").as("doc_id")),
      "doc_id")
    val n1 = keepers.count()
    assert(n1 <= n0 && n1 > 0)

    // 2. near-dup collapse: exact-jaccard pairs -> connected components ->
    //    keep only each component's min-id member
    val pairs = Dedup.ngramJaccardPairs(keepers, col("doc_id"), col("text"), 3, 0.5)
    val comps = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val survivors = keepers.join(
      comps.filter(col("node") =!= col("component")).select(col("node").as("doc_id")),
      Seq("doc_id"), "left_anti")
    val n2 = survivors.count()
    assert(n2 <= n1 && n2 > 0)
    // the collapse invariant: no surviving pair still meets the threshold
    // (each >=0.5 pair was within one component, and one survivor remains
    // per component)
    assert(Dedup.ngramJaccardPairs(survivors, col("doc_id"), col("text"), 3, 0.5).isEmpty,
      "near-dup pairs must not survive the component collapse")

    // 3. decontaminate: drop train docs sharing any 3-gram with the
    //    held-out slice (q49's deterministic held-out rule)
    val held = pmod(pmod(col("doc_id"), lit(100003L)) * 2654435761L, lit(100L)) >= 95
    val hits = Dedup.contaminationHits(survivors, col("doc_id"), col("text"), held, 3)
    val clean = survivors.filter(!held)
      .join(hits.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val n3 = clean.count()
    assert(n3 <= n2 && n3 > 0)
    // decontamination invariant: re-probing the clean set against the same
    // held-out slice finds nothing
    val recheck = Dedup.contaminationHits(
      clean.unionByName(docs.filter(held)), col("doc_id"), col("text"), held, 3)
    assert(recheck.join(clean, "doc_id").isEmpty,
      "clean docs must share no n-gram with the held-out slice")

    // 4. quality filter: Gopher-ish repetition rule (distinct-token ratio)
    val toks = graft.functions.TextFns.tokens(col("text"))
    val quality = clean.filter(
      size(array_distinct(toks)).cast("double") >= size(toks).cast("double") * 0.3)
    val n4 = quality.count()
    assert(n4 <= n3 && n4 > 0)

    // 5. pack: non-overlapping 20-token chunks (q41's chunking shape with
    //    stride = chunk, so tokens are conserved), then fixed 100-token
    //    packs per doc-hash shard — every chunk lands in exactly one pack
    val nChunks = ceil(size(toks).cast("double") / 20.0).cast("long")
    val chunks = quality.select(col("doc_id"),
        explode(transform(sequence(lit(0L), nChunks - 1),
          i => struct(i.as("chunk_idx"),
            concat_ws(" ", slice(toks, (i * 20 + 1).cast("int"), lit(20)))
              .as("chunk_text")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk_text"))
      .withColumn("n_tok", size(split(col("chunk_text"), " ")).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("doc_id"), lit(8L)))
      .orderBy(col("doc_id"), col("chunk_idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val packed = chunks.withColumn("pack_id",
      (pmod(col("doc_id"), lit(8L)) * (1L << 40) +
        floor((sum(col("n_tok")).over(w) - col("n_tok")) / 100.0)).cast("long"))
    assert(packed.count() == chunks.count())
    assert(packed.filter(col("pack_id").isNull).count() == 0)
    val tokIn = chunks.agg(sum(col("n_tok"))).head().getLong(0)
    val tokOut = packed.groupBy(col("pack_id")).agg(sum(col("n_tok")).as("t"))
      .agg(sum(col("t"))).head().getLong(0)
    assert(tokIn == tokOut, "packing must conserve tokens")
  }

  test("local scan fan-out: multi-split leaf, no injected exchange, same rows") {
    val cores = spark.sparkContext.defaultParallelism
    val li = Readers.table(spark, sf, "lineitem")
    // leaf parallelism comes from the copy's file splits, not a shuffle:
    // the plan between scan and first aggregation must be exchange-free
    assert(li.rdd.getNumPartitions >= cores / 2,
      s"fan-out defeated: ${li.rdd.getNumPartitions} splits for $cores cores")
    assert(!li.queryExecution.executedPlan.toString.contains("Exchange"),
      "fan-out must widen the SCAN, not inject a repartition Exchange")
    // the copy is the same table: identical multiset of rows as the source
    val direct = spark.read.parquet(s"$sf/lineitem.parquet")
    assert(li.exceptAll(direct).isEmpty && direct.exceptAll(li).isEmpty)
    // second read reuses the cached copy (same scan location both times)
    val files1 = li.inputFiles.toSet
    val files2 = Readers.table(spark, sf, "lineitem").inputFiles.toSet
    assert(files1 == files2 && files1.size >= cores / 2)
  }

  test("materialized index point-lookup: the batch IN prefilter SKIPS row groups via parquet min/max") {
    import graft.operators.Dedup
    import spark.implicits._
    // standing corpus: 64 docs x 6 shingles = 384 index rows, range-sorted
    // on sh_h into 8 files (one row group each, ~48 rows per file)
    val corpus = (0 until 64).map { i =>
      (i.toLong, (0 until 8).map(j => s"tok${i}w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_prune_idx")
    val idxPath = root.resolve("index").toString
    val sizesPath = root.resolve("sizes").toString
    Writers.writeSorted(
      Dedup.shingleIndex(corpus, $"doc_id", $"text", 3, idName = "corpus_id"),
      idxPath, Seq("sh_h"), numFiles = 8)
    Dedup.indexSizes(spark.read.parquet(idxPath)).write.parquet(sizesPath)
    val idx = spark.read.parquet(idxPath)
    val totalRows = idx.count()
    assert(idx.inputFiles.length == 8 && totalRows == 384L)
    // the arriving "nightly" batch: ONE 3-token doc (a single shingle hash,
    // matching corpus doc 7's first shingle) — the point-lookup regime
    val batch = Seq((9001L, "tok7w0 tok7w1 tok7w2")).toDF("doc_id", "text")
    val sizes = spark.read.parquet(sizesPath)
    // AQE off for this query only, so the executed plan exposes the scan
    // node and its metrics directly
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pruned = Dedup.pruneIndexToBatch(idx, batch, $"doc_id", $"text", 3)
      val res = Dedup.ngramJaccardAgainstIndex(pruned, batch,
        $"doc_id", $"text", 3, 0.1, corpusSizes = Some(sizes))
        .as[(Long, Long, Double)]
      val rows = res.collect().toSet
      // jaccard vs corpus doc 7: 1 common of (1 + 6 - 1) shingles
      assert(rows == Set((9001L, 7L,
        math.floor(1.0 / 6.0 * 10000.0 + 0.5) / 10000.0)))
      // the IN predicate reached the parquet reader...
      val scans = res.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("index")) => s
      }
      assert(scans.nonEmpty, "no parquet scan of the index in the plan")
      // (a one-value IN folds to EqualTo; larger inline lists push as In)
      assert(scans.exists(_.metadata.get("PushedFilters").exists(f =>
          f.contains("In(sh_h") || f.contains("EqualTo(sh_h"))),
        s"batch hashes not pushed: ${scans.map(_.metadata.get("PushedFilters"))}")
      // ...and min/max stats actually skipped row groups: only the one file
      // whose [min, max] range covers the single hash emits rows (48 of
      // 384; assert with slack for range-boundary ties)
      val scanned = scans.map(_.metrics("numOutputRows").value).sum
      assert(scanned > 0 && scanned <= totalRows / 4,
        s"expected ~1 of 8 row groups read, scan emitted $scanned of $totalRows rows")
      // pruning is semantically free: identical result via the full index
      // with sizes derived inline
      val full = Dedup.ngramJaccardAgainstIndex(idx, batch,
        $"doc_id", $"text", 3, 0.1)
      assert(full.as[(Long, Long, Double)].collect().toSet == rows)
      // oversized batches pass through unpruned (the inline regime gate)
      val big = Dedup.pruneIndexToBatch(idx, corpus, $"doc_id", $"text", 3,
        maxHashes = 16)
      assert(big.queryExecution.analyzed.toString == idx.queryExecution.analyzed.toString,
        "a batch over maxHashes must return the index unchanged")

      // ABOVE the IN-pushdown threshold (default 10), with NO conf set by
      // the caller: a 3-doc batch = 18 distinct shingle hashes. The
      // isin-based revision collapsed this to a useless [min,max] range
      // filter unless the caller raised
      // spark.sql.parquet.pushdown.inFilterThreshold; the Or-of-equalities
      // tree must push point predicates and still skip row groups (r8)
      assert(spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold").toInt <= 10,
        "this spec must run under the DEFAULT IN threshold to pin the fix")
      // 64-file sorted copy (6 rows per row group): 18 uniform hashes can
      // touch at most 18 of the 64 groups, so group-level skipping is
      // visible in the scan metric — a [min,max] range filter over uniform
      // hashes would leave essentially all 384 rows flowing
      val idx64Path = root.resolve("index64").toString
      Writers.writeSorted(
        Dedup.shingleIndex(corpus, $"doc_id", $"text", 3, idName = "corpus_id"),
        idx64Path, Seq("sh_h"), numFiles = 64)
      val idx64 = spark.read.parquet(idx64Path)
      val batch16 = Seq(
        (9002L, "tok3w0 tok3w1 tok3w2 tok3w3 tok3w4 tok3w5 tok3w6 tok3w7"),
        (9003L, "tok11w0 tok11w1 tok11w2 tok11w3 tok11w4 tok11w5 tok11w6 tok11w7"),
        (9004L, "tok42w0 tok42w1 tok42w2 tok42w3 tok42w4 tok42w5 tok42w6 tok42w7"))
        .toDF("doc_id", "text")
      val pruned16 = Dedup.pruneIndexToBatch(idx64, batch16, $"doc_id", $"text", 3)
      val res16 = Dedup.ngramJaccardAgainstIndex(pruned16, batch16,
        $"doc_id", $"text", 3, 0.5, corpusSizes = Some(sizes))
        .as[(Long, Long, Double)]
      // each batch doc shares all 6 shingles with exactly one corpus doc
      assert(res16.collect().toSet ==
        Set((9002L, 3L, 1.0), (9003L, 11L, 1.0), (9004L, 42L, 1.0)))
      val scans16 = res16.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("index64")) => s
      }
      assert(scans16.exists(_.metadata.get("PushedFilters").exists(f =>
          f.contains("EqualTo(sh_h") || f.contains("In(sh_h"))),
        s"point predicates not pushed: ${scans16.map(_.metadata.get("PushedFilters"))}")
      val scanned16 = scans16.map(_.metrics("numOutputRows").value).sum
      assert(scanned16 > 0 && scanned16 <= 18L * 6L,
        s"expected <=18 of 64 row groups read, scan emitted $scanned16 of $totalRows rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
