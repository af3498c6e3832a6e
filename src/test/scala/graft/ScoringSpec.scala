package graft

import graft.operators.Scoring
import org.apache.spark.sql.functions._

/** Model-filter scoring vs independent in-memory references: the hashed
  * linear classifier and the char-bigram LM are all-integer pipelines, so
  * the distributed result must match a plain-Scala recomputation exactly —
  * and must not depend on partitioning.
  */
class ScoringSpec extends GraftSuite {
  import spark.implicits._

  /** The q31/tokenBucket rolling hash, in plain Scala. */
  private def fp(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((acc, cp) => (acc * 31 + cp) % 1000000007L)

  private def tokens(text: String): Seq[String] = text.trim.split(" ", -1).toSeq

  test("hashed linear classifier matches an in-memory reference exactly") {
    val corpus = Seq(
      (0L, "the cat sat on the mat", true),
      (1L, "le chat est noir", false),
      (2L, "the dog ate the cat food", true),
      (3L, "el gato come pescado", false),
      (4L, "cats and dogs and the rain", true),
      (5L, "chat chien et pluie", false))
    val buckets = 64

    // reference: per-bucket smoothed per-mille weight, then integer scores
    val tokBuckets = corpus.flatMap { case (id, t, y) =>
      tokens(t).map(tok => (id, y, fp(tok) % buckets))
    }
    val weight = tokBuckets.groupBy(_._3).map { case (b, xs) =>
      b -> (1000L * xs.count(_._2)) / (xs.size + 1)
    }
    val want = tokBuckets.groupBy(_._1).map { case (id, xs) =>
      val s = xs.map(x => weight(x._3)).sum
      (id, xs.size.toLong, s, s * 2 > 1000L * xs.size)
    }.toSeq.sortBy(_._1)

    val docs = corpus.toDF("doc_id", "text", "y")
    val model = Scoring.trainHashedLinear(docs, $"text", $"y", buckets)
    val got = Scoring.scoreHashedLinear(docs, $"doc_id", $"text", model, buckets)
      .orderBy("_sid").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("char-bigram LM score matches an in-memory reference exactly") {
    val corpus = Seq((0L, "abab"), (1L, "abba"), (2L, "zzz"), (3L, "a"))
    // reference: p(b|a) = 1000*c(ab) / (c(a-)+1), integer floor division
    val eligible = corpus.filter(_._2.length >= 2)
    val bgs = eligible.flatMap { case (id, t) => t.sliding(2).map(id -> _) }
    val bc = bgs.groupBy(_._2).map { case (bg, xs) => bg -> xs.size.toLong }
    val pc = bc.groupBy(_._1.substring(0, 1)).map { case (a, xs) => a -> xs.values.sum }
    val p = bc.map { case (bg, c) => bg -> 1000L * c / (pc(bg.substring(0, 1)) + 1) }
    val want = bgs.groupBy(_._1).map { case (id, xs) =>
      val s = xs.map(x => p(x._2)).sum
      (id, xs.size.toLong, s, s / xs.size)
    }.toSeq.sortBy(_._1)
    assert(!want.exists(_._1 == 3L), "1-char doc must have no bigram rows")

    val docs = corpus.toDF("doc_id", "text")
    val model = Scoring.trainCharBigramLm(docs, $"text")
    val got = Scoring.scoreCharBigramLm(docs, $"doc_id", $"text", model)
      .orderBy("_sid").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("fused charLM scorer is bit-identical to the composed pipeline, corpus + adversarial strings") {
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select($"doc_id", $"text")
    val adversarial = Seq(
      (100000L, ""), (100001L, "a"), (100002L, "  "), (100003L, "a  b"),
      (100004L, "héllo wörld"), (100005L, "汉字漢字"), (100006L, "a\tb\nc"),
      (100007L, "𐍈𐍈x"), // non-BMP: 4-byte codepoints, substr must not split
      (100008L, "ababababab"))
      .toDF("doc_id", "text")
    val all = docs.unionByName(adversarial)
    // fused trainer must reproduce the composed model table row for row
    val composedModel = Scoring.trainCharBigramLm(all, $"text")
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    val fusedModel = Scoring.trainCharBigramLmFused(all, $"text")
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    assert(fusedModel == composedModel,
      s"first diff: ${fusedModel.zip(composedModel).find(p => p._1 != p._2)}")
    val model = Scoring.trainCharBigramLm(all, $"text")
    val composed = Scoring.scoreCharBigramLm(all, $"doc_id", $"text", model)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val fused = Scoring.scoreCharBigramLmFused(all, $"doc_id", $"text", model)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(fused == composed,
      s"first diff: ${fused.zip(composed).find(p => p._1 != p._2)}")
    // and against a model trained on a DIFFERENT corpus (unmatched bigrams
    // must count nothing, docs with zero matches must be absent)
    val foreign = Scoring.trainCharBigramLm(
      Seq((0L, "qqq www eee")).toDF("doc_id", "text"), $"text")
    val composedF = Scoring.scoreCharBigramLm(all, $"doc_id", $"text", foreign)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val fusedF = Scoring.scoreCharBigramLmFused(all, $"doc_id", $"text", foreign)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(fusedF == composedF)
  }

  test("fused hashed-linear scorer is bit-identical to the composed pipeline, incl. absent buckets") {
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select($"doc_id", $"text", $"lang")
    val adversarial = Seq(
      (200000L, "", "en"), (200001L, "  ", "en"), (200002L, "a  b", "en"),
      (200003L, "héllo wörld 汉字", "zh"), (200004L, "𐍈x y𐍈", "en"))
      .toDF("doc_id", "text", "lang")
    val all = docs.unionByName(adversarial)
    for (buckets <- Seq(64, 4096)) {
      val model = Scoring.trainHashedLinear(all, $"text", $"lang" === "en", buckets)
      val composed = Scoring.scoreHashedLinear(all, $"doc_id", $"text", model, buckets)
        .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
      val fused = Scoring.scoreHashedLinearFused(all, $"doc_id", $"text", model, buckets)
        .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
      assert(fused == composed, s"buckets=$buckets first diff: " +
        s"${fused.zip(composed).find(p => p._1 != p._2)}")
    }
    // model trained on a small FOREIGN slice: most buckets absent, so the
    // inner-join drop semantics (tokens count nothing, all-absent docs
    // vanish) are actually exercised
    val tiny = Seq((0L, "qq ww", true)).toDF("doc_id", "text", "y")
    val foreign = Scoring.trainHashedLinear(tiny, $"text", $"y", 4096)
    val composedF = Scoring.scoreHashedLinear(all, $"doc_id", $"text", foreign, 4096)
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    val fusedF = Scoring.scoreHashedLinearFused(all, $"doc_id", $"text", foreign, 4096)
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(fusedF == composedF)
    assert(composedF.size < all.count(), "foreign model must drop all-absent docs")
  }

  test("fused blocklist filter is bit-identical to the composed pipeline, corpus + adversarial strings") {
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select($"doc_id", $"text")
    val adversarial = Seq(
      (300000L, ""), (300001L, "  "), (300002L, "slow"), (300003L, " slow "),
      (300004L, "slow  slow"), // doubled space: empty token counted, not matched
      (300005L, "slowly slow slows"), // substrings must NOT match whole tokens
      (300006L, "héllo 汉字 slow 𐍈"), (300007L, "dup dup dup DUP Dup"))
      .toDF("doc_id", "text")
    val all = docs.unionByName(adversarial)
    val blocked = Seq("slow", "dup", "bogus", "汉字")
    for (thr <- Seq(0, 25, 1000)) {
      val composed = Scoring.blocklistFilterComposed(all, $"doc_id", $"text", blocked, thr)
        .as[(Long, Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
      val fused = Scoring.blocklistFilter(all, $"doc_id", $"text", blocked, thr)
        .as[(Long, Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
      assert(fused == composed, s"thr=$thr first diff: " +
        s"${fused.zip(composed).find(p => p._1 != p._2)}")
    }
    // pinned reference rows for the adversarial block (thr=0: keep == clean)
    val got = Scoring.blocklistFilter(all, $"doc_id", $"text", blocked, 0)
      .filter($"doc_id" >= 300000L)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    val want = Seq(
      (300000L, 1L, 0L, 0L, true), // split("") = [""]: one empty token, clean
      (300001L, 1L, 0L, 0L, true),
      (300002L, 1L, 1L, 1L, false),
      (300003L, 1L, 1L, 1L, false),
      (300004L, 3L, 2L, 1L, false), // slow, <empty>, slow
      (300005L, 3L, 1L, 1L, false), // slowly/slows are different tokens
      (300006L, 4L, 2L, 2L, false), // multi-byte blocked word matches too
      (300007L, 5L, 3L, 1L, false)) // case-sensitive, one distinct term
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // duplicate blocklist entries must not double-count
    val dupList = Scoring.blocklistFilter(all, $"doc_id", $"text",
      Seq("slow", "slow", "dup"), 0)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    val plain = Scoring.blocklistFilter(all, $"doc_id", $"text",
      Seq("slow", "dup"), 0)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(dupList == plain)
  }

  test("filterEnsemble flags align with the component operators; unscorable docs fail their gate") {
    val docs = graft.sources.Readers.table(spark, sf, "documents")
      .select($"doc_id", $"text", $"lang")
      // no bigrams -> the LM cannot score these; the gate must fail closed
      .unionByName(Seq((900000L, "", "en"), (900001L, "x", "en"))
        .toDF("doc_id", "text", "lang"))
    val ens = Scoring.filterEnsemble(docs, $"doc_id", $"text",
        $"lang" === "en", minQuality = 0.5, clfMinPermille = 430,
        lmMinPermille = 250)
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(ens.size == docs.count(), "one verdict row per document")
    // keep is exactly the conjunction
    for ((_, (id, h, g, c, l, k)) <- ens)
      assert(k == (h && g && c && l), s"keep mismatch for $id")
    // unscorable docs fail the LM gate, and only that through keep
    assert(!ens(900000L)._5 && !ens(900001L)._5, "no-bigram docs must fail lm_pass")
    // model flags equal the standalone operators' thresholded scores
    val clfModel = Scoring.trainHashedLinear(docs, $"text", $"lang" === "en", 4096)
    val clfWant = Scoring.scoreHashedLinearFused(docs, $"doc_id", $"text", clfModel, 4096)
      .select($"_sid", ($"score_sum" >= lit(430L) * $"n_tok").as("p"))
      .as[(Long, Boolean)].collect().toMap
    for ((id, (_, _, _, c, _, _)) <- ens)
      assert(c == clfWant.getOrElse(id, false), s"clf flag mismatch for $id")
    val lmModel = Scoring.trainCharBigramLmFused(docs, $"text")
    val lmWant = Scoring.scoreCharBigramLmFused(docs, $"doc_id", $"text", lmModel)
      .select($"_sid", ($"avg_permille" >= 250).as("p"))
      .as[(Long, Boolean)].collect().toMap
    for ((id, (_, _, _, _, l, _)) <- ens)
      assert(l == lmWant.getOrElse(id, false), s"lm flag mismatch for $id")
    // every gate both passes and fails someone on the real corpus — the
    // fixture can't silently degenerate into a constant column
    for (i <- 1 to 4) {
      val vals = ens.values.map(t => t.productElement(i).asInstanceOf[Boolean]).toSet
      assert(vals == Set(true, false), s"flag $i is constant")
    }
  }

  test("sourceDriftTV matches hand-computed total variation; bounded; identical sources agree") {
    // corpus: A="x x", B="x x", C="y y"  =>  N=6, p(x)=2/3, p(y)=1/3.
    // TV(A)=TV(B)=½(|1−2/3| + |0−1/3|) = 1/3;  TV(C)=½(|0−2/3|+|1−1/3|)=2/3
    val docs = Seq(("A", "x x"), ("B", "x x"), ("C", "y y"))
      .toDF("source", "text")
    val got = Scoring.sourceDriftTV(docs, $"source", $"text")
      .orderBy("source").as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("A", 2L, 0.333333), ("B", 2L, 0.333333), ("C", 2L, 0.666667)),
      s"got $got")
    // bounded on the real corpus, and a single-source corpus drifts zero
    val real = graft.sources.Readers.table(spark, sf, "documents")
    val tvs = Scoring.sourceDriftTV(real, $"source", $"text")
      .as[(String, Long, Double)].collect()
    assert(tvs.nonEmpty && tvs.forall(t => t._3 >= 0.0 && t._3 <= 1.0))
    val solo = Scoring.sourceDriftTV(real.filter($"source" === "src0"),
      $"source", $"text").as[(String, Long, Double)].collect()
    assert(solo.forall(_._3 == 0.0), "a source IS the corpus when it is alone")
  }

  test("scores are partition-independent and total on the real corpus") {
    val docs = graft.sources.Readers.table(spark, sf, "documents")
    val model = Scoring.trainHashedLinear(docs, $"text", $"lang" === "en", 4096)
    val a = Scoring.scoreHashedLinear(docs, $"doc_id", $"text", model, 4096)
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    val model7 = Scoring.trainHashedLinear(docs.repartition(7), $"text",
      $"lang" === "en", 4096)
    val b = Scoring.scoreHashedLinear(docs.repartition(5), $"doc_id", $"text",
        model7, 4096)
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(a == b, "integer scoring must not depend on partitioning")
    assert(a.size == docs.count(), "every document gets a score")
    // the model carries real signal: it separates en from non-en better
    // than chance on its own training corpus (sanity, not a quality bar)
    val langs = docs.select($"doc_id", ($"lang" === "en").as("y"))
      .as[(Long, Boolean)].collect().toMap
    val acc = a.count(r => r._4 == langs(r._1)).toDouble / a.size
    assert(acc > 0.6, s"train-set accuracy $acc should beat chance")
  }

  test("scriptProfile counts fixed ranges, deterministic dominant, totals") {
    val docs = Seq(
      (1L, "plain ascii text 123"),
      (2L, "русский текст здесь"),
      (3L, "日本語のテキスト漢字"),             // cjk + kana, の is kana
      (4L, "mixed русский and english words"), // latin majority
      (5L, "αβγ абв"),                          // greek 3, cyrillic 3: tie → greek? no — cyrillic... order is latin,cyrillic,greek: tie at 3 → cyrillic
      (6L, "×÷"),                               // excluded from latin: other
      (7L, ""),
      (8L, "한국어 텍스트"))
      .toDF("doc_id", "text")
    val got = Scoring.scriptProfile(docs, $"doc_id", $"text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("latin"), r.getAs[Long]("cyrillic"),
          r.getAs[Long]("cjk"), r.getAs[Long]("other"),
          r.getAs[String]("dominant_script"), r.getAs[Long]("n_cp")))).toMap
    assert(got(1L)._5 == "latin" && got(1L)._1 == 14L)
    assert(got(2L)._5 == "cyrillic" && got(2L)._1 == 0L)
    assert(got(3L)._5 == "cjk" && got(3L)._3 == got(3L)._6,
      "all-CJK doc: every codepoint in the cjk class")
    assert(got(4L)._5 == "latin")
    assert(got(5L)._5 == "cyrillic",
      "ties break to the FIRST class in fixed order (cyrillic before greek)")
    assert(got(6L) == ((0L, 0L, 0L, 2L, "none", 2L)),
      "multiplication/division signs are excluded from latin")
    assert(got(7L)._5 == "none" && got(7L)._6 == 0L)
    assert(got(8L)._5 == "hangul")
    // totals: counts + other always sum to n_cp
    val full = Scoring.scriptProfile(docs, $"doc_id", $"text").collect()
    full.foreach { r =>
      val parts = Seq("latin", "cyrillic", "greek", "arabic", "hebrew",
        "cjk", "hangul", "digit", "space", "other").map(r.getAs[Long](_)).sum
      assert(parts == r.getAs[Long]("n_cp"), s"doc ${r.get(0)}: $parts")
    }
  }

  test("scriptCounts sends malformed UTF-8 to 'other', never a script class") {
    // raw bytes via cast(binary as string): 0xD0 'A' (cyrillic lead, bad
    // continuation — naive assembly would fabricate U+0401), overlong
    // 0xC1 0x81 (would fabricate 'A'), lone continuation 0x80, truncated
    // 3-byte lead at the tail, valid 'Я' (0xD0 0xAF) as the control
    val cases = Seq(
      (1L, Array(0xD0, 0x41).map(_.toByte)),
      (2L, Array(0xC1, 0x81).map(_.toByte)),
      (3L, Array(0x80).map(_.toByte)),
      (4L, Array(0x41, 0xE4, 0xB8).map(_.toByte)), // 'A' + truncated CJK lead
      (5L, Array(0xD0, 0xAF).map(_.toByte)),
      // E0-overlongs (second byte < 0xA0): 0xE0 0x90 0x80 would fabricate
      // U+0400 (cyrillic), 0xE0 0x81 0x81 would fabricate 'A' (latin)
      (6L, Array(0xE0, 0x90, 0x80).map(_.toByte)),
      (7L, Array(0xE0, 0x81, 0x81).map(_.toByte)))
      .toDF("doc_id", "raw")
    val got = cases
      .select($"doc_id", graft.plans.NativeFns.scriptCounts(
        $"raw".cast("string")).as("sc"),
        length($"raw".cast("string")).cast("long").as("n_cp"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getSeq[Long](1).toVector, r.getAs[Long]("n_cp")))).toMap
    assert(got(1L)._1.sum == 0L, "bad continuation must not count as cyrillic")
    assert(got(2L)._1.sum == 0L, "overlong form must not count as latin")
    assert(got(3L)._1.sum == 0L, "lone continuation byte is no class")
    assert(got(4L)._1(0) == 1L && got(4L)._1.sum == 1L,
      "the valid 'A' counts; the truncated tail lead does not")
    assert(got(5L)._1(1) == 1L, "valid 2-byte cyrillic still classified")
    assert(got(6L)._1.sum == 0L, "E0-overlong must not count as cyrillic")
    assert(got(7L)._1.sum == 0L, "E0-overlong must not count as latin")
    // the shared-walk contract survives malformed input: sum + other == n_cp
    got.foreach { case (id, (sc, n)) =>
      assert(sc.sum <= n, s"doc $id: classified ${sc.sum} of $n steps") }
  }

  test("fused script counts equal the composed per-class regex twin on the corpus") {
    val corpus = graft.sources.Readers.table(spark, sf, "documents")
      .select($"doc_id", $"text")
    val classes = Seq(
      "latin" -> "[A-Za-z\\x{00C0}-\\x{00D6}\\x{00D8}-\\x{00F6}\\x{00F8}-\\x{024F}]",
      "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
      "greek" -> "[\\x{0370}-\\x{03FF}]",
      "arabic" -> "[\\x{0600}-\\x{06FF}]",
      "hebrew" -> "[\\x{0590}-\\x{05FF}]",
      "cjk" -> "[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}]",
      "hangul" -> "[\\x{AC00}-\\x{D7A3}]",
      "digit" -> "[0-9]",
      "space" -> "[ \t\n\r\f]")
    val fused = Scoring.scriptProfile(corpus, $"doc_id", $"text")
      .select(col("doc_id") +: classes.map(c => col(c._1)): _*)
    val composed = corpus.select(col("doc_id") +: classes.map { case (nm, re) =>
      (length(coalesce($"text", lit(""))) -
        length(regexp_replace(coalesce($"text", lit("")), re, "")))
        .cast("long").as(nm)
    }: _*)
    assert(fused.exceptAll(composed).count() == 0L &&
      composed.exceptAll(fused).count() == 0L,
      "fused codepoint walk diverged from the per-class regex counts")
  }
}
