package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE merge training vs an independent in-memory reference: same greedy
  * left-to-right merge, same (count desc, pair asc) tie-break — the merge
  * TABLE must match rule for rule, rank for rank.
  */
class BpeSpec extends GraftSuite {
  import spark.implicits._

  /** Plain-Scala reference BPE (Sennrich 2016): word-freq table → repeat
    * [count adjacent pairs weighted by freq; take max by (count, then
    * lexicographically smallest pair); merge greedily left-to-right].
    */
  private def refBpe(words: Map[String, Long], n: Int): Seq[(Int, String, String, String)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toVector :+ "</w>", f) }
    val out = Seq.newBuilder[(Int, String, String, String)]
    var rank = 0
    var done = false
    while (rank < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), _) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank, l, r, l + r))
        vocab = vocab.map { case (syms, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), f)
        }
        rank += 1
      }
    }
    out.result()
  }

  test("bpeTrain matches the reference merge table on a mixed-frequency corpus") {
    // the Sennrich walkthrough corpus, as documents with repetition
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = Bpe.bpeTrain(docs, $"text", 10)
      .orderBy("merge_rank")
      .as[(Int, String, String, String)].collect().toSeq
    val want = refBpe(Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 10)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got.size == 10)
  }

  test("bpeTrain stops when the vocabulary runs out of pairs") {
    // single words "ab" (3 symbols with </w>): only 2+1 merges possible
    val docs = Seq((0L, "ab"), (1L, "ab")).toDF("doc_id", "text")
    val got = Bpe.bpeTrain(docs, $"text", 50)
      .orderBy("merge_rank")
      .as[(Int, String, String, String)].collect().toSeq
    val want = refBpe(Map("ab" -> 2L), 50)
    assert(got == want)
    assert(got.size < 50, "must stop early, not loop to numMerges")
    assert(got.last._4 == "ab</w>", "final merge collapses the whole word")
  }

  test("bpeTrain on the documents corpus: deterministic, overlapping-pair-safe") {
    val docs = graft.sources.Readers.table(spark, sf, "documents")
    val a = Bpe.bpeTrain(docs, $"text", 5).as[(Int, String, String, String)]
      .collect().toSeq.sortBy(_._1)
    val b = Bpe.bpeTrain(docs.repartition(7), $"text", 5)
      .as[(Int, String, String, String)].collect().toSeq.sortBy(_._1)
    assert(a == b, "merge table must not depend on partitioning")
    assert(a.size == 5)
  }

  /** Reference encode: chars + </w>, then each merge in rank order with the
    * same greedy left-to-right non-overlapping scan training used.
    */
  private def refEncode(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ "</w>"
    for ((l, r) <- merges) {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      syms = b.result()
    }
    syms
  }

  test("encodeVocab matches the in-memory reference and reproduces training's final vocabulary") {
    val corpus = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val docs = corpus.toSeq.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.bpeTrain(docs, $"text", 8)
    val mergeRules = merges.orderBy("merge_rank")
      .as[(Int, String, String, String)].collect().toSeq.map(m => (m._2, m._3))
    val got = Bpe.encodeVocab(docs.select($"text".as("word")), merges)
      .as[(String, Seq[String])].collect().toMap
    assert(got.keySet == corpus.keySet)
    for (w <- corpus.keys)
      assert(got(w) == refEncode(w, mergeRules), s"word $w")
    // encode(word) must equal the final TRAINING vocabulary symbols for
    // every word the training corpus contained — the consistency invariant
    // that makes train-side counts and encode-side tokens the same model
    var vocabRef: Map[String, Vector[String]] =
      corpus.keys.map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
    for ((l, r) <- mergeRules)
      vocabRef = vocabRef.map { case (w, syms) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            b += (l + r); i += 2
          } else { b += syms(i); i += 1 }
        }
        w -> b.result()
      }
    for (w <- corpus.keys) assert(got(w) == vocabRef(w), s"vocab drift on $w")
  }

  test("encodeVocab splits by codepoint like training: non-BMP words round-trip") {
    // "😀😀" (U+1F600 twice): training's split(word, "") yields whole
    // codepoints, so the learned merges are (😀,😀) then (😀😀,</w>); a
    // UTF-16 code-unit split would start from lone surrogates and never
    // apply them
    val docs = Seq.tabulate(4)(i => (i.toLong, "😀😀"))
      .toDF("doc_id", "text")
    val merges = Bpe.bpeTrain(docs, $"text", 2)
    val got = Bpe.encodeVocab(docs.select($"text".as("word")), merges)
      .as[(String, Seq[String])].collect().toMap
    assert(got("😀😀") == Seq("😀😀</w>"),
      s"non-BMP word must fully merge, got ${got.values}")
  }

  test("bpeEncode: per-doc token counts, fertility, empty docs; vocab-grain encode equals per-doc encode") {
    val docs = Seq((0L, "low low newest"), (1L, "lower widest"), (2L, ""),
        (3L, "newest newest newest")).toDF("doc_id", "text")
    val merges = Bpe.bpeTrain(docs, $"text", 6)
    val mergeRules = merges.orderBy("merge_rank")
      .as[(Int, String, String, String)].collect().toSeq.map(m => (m._2, m._3))
    val got = Bpe.bpeEncode(docs, $"doc_id", $"text", merges)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def toks(s: String): Seq[String] =
      s.split(" ").filter(_.nonEmpty).toSeq
    for ((id, text) <- Seq(0L -> "low low newest", 1L -> "lower widest",
        3L -> "newest newest newest")) {
      val ws = toks(text)
      val nTok = ws.map(w => refEncode(w, mergeRules).size.toLong).sum
      val fert = math.floor(nTok.toDouble / ws.size * 10000.0 + 0.5) / 10000.0
      assert(got(id) == ((ws.size.toLong, nTok, Some(fert))), s"doc $id")
    }
    assert(got(2L) == ((0L, 0L, None)), "empty doc: zero counts, NULL fertility")
  }

  test("merge-table standing artifact: versioned round-trip, encode-against-stored equality, immutability (r9)") {
    import graft.sources.Writers
    val docs = Seq((0L, "low low newest"), (1L, "lower widest"),
        (2L, "newest newest low")).toDF("doc_id", "text")
    val merges = Bpe.bpeTrain(docs, $"text", 8)
    val path = java.nio.file.Files.createTempDirectory("graft-merges")
      .toString + "/bpe_merges"
    // empty artifact: latest is None, an unpinned read fails loudly
    assert(Writers.latestMergeTableVersion(spark, path).isEmpty)
    intercept[IllegalArgumentException] { Writers.readMergeTable(spark, path) }
    Writers.writeMergeTable(merges, path, "v0001")
    // round-trip: the stored table IS the trained table, rule for rule
    val back = Writers.readMergeTable(spark, path, Some("v0001"))
      .as[(Int, String, String, String)].collect().toSeq.sortBy(_._1)
    val orig = merges.as[(Int, String, String, String)].collect().toSeq.sortBy(_._1)
    assert(back == orig && back.nonEmpty)
    // THE artifact contract: encoding against the STORED table equals
    // encoding against the fresh in-session one — ingest can reuse the
    // pinned vocabulary instead of retraining
    val encFresh = Bpe.bpeEncode(docs, $"doc_id", $"text", merges)
      .as[(Long, Long, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    val encStored = Bpe.bpeEncode(docs, $"doc_id", $"text",
        Writers.readMergeTable(spark, path))
      .as[(Long, Long, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(encFresh == encStored)
    // versions are immutable: re-writing v0001 throws before touching disk
    intercept[IllegalArgumentException] {
      Writers.writeMergeTable(merges, path, "v0001")
    }
    // a retrain lands as the NEXT version: latest moves, the pin does not
    val merges2 = Bpe.bpeTrain(
      Seq((0L, "aa aa ab")).toDF("doc_id", "text"), $"text", 2)
    Writers.writeMergeTable(merges2, path, "v0002")
    assert(Writers.latestMergeTableVersion(spark, path).contains("v0002"))
    assert(Writers.readMergeTable(spark, path).count() == merges2.count())
    assert(Writers.readMergeTable(spark, path, Some("v0001"))
      .as[(Int, String, String, String)].collect().toSeq.sortBy(_._1) == orig)
    // a truncated/hand-edited table (non-contiguous ranks) fails the read
    val corrupt = Seq((0, "a", "b", "ab"), (2, "c", "d", "cd"))
      .toDF("merge_rank", "left", "right", "merged")
    Writers.writeMergeTable(corrupt, path, "v0003")
    intercept[IllegalArgumentException] {
      Writers.readMergeTable(spark, path, Some("v0003"))
    }
    // scheme-prefixed paths resolve like any Spark sink (Hadoop FS, not
    // java.nio): the SAME artifact is visible through "file:" + path, and
    // immutability still holds there
    assert(Writers.latestMergeTableVersion(spark, "file:" + path).contains("v0003"))
    assert(Writers.readMergeTable(spark, "file:" + path, Some("v0001"))
      .as[(Int, String, String, String)].collect().toSeq.sortBy(_._1) == orig)
    intercept[IllegalArgumentException] {
      Writers.writeMergeTable(merges, "file:" + path, "v0001")
    }
  }
}
