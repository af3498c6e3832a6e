package graft

/** Corpus-gated CI assertions over the sf10 SCALE CONFIGURATIONS (judge r9
  * task 3): the documented 100 TB paths — LSH-graph CC, capped
  * standing-index ingest, LSH-staged curation, capped containment — were
  * verified only by a manually-run `Test/runMain` stage, so a plan
  * regression there (a lost exchange reuse, a de-broadcast join, a
  * re-quadratic pair generator) would ship silently between sweeps. These
  * tests run the SAME [[ScaleStageSf10]] stage functions whenever the
  * sweep corpus exists (skipped cleanly otherwise, like RecallFloorSpec's
  * sf1/sf10 gates) and assert:
  *
  *  - a WALL BUDGET of ~3× the spec-shape measurement (this suite runs on
  *    SparkTestBase's local[4], so budgets are calibrated against a quiet
  *    local[4] run of this spec, NOT the sweep's local[16] numbers in
  *    SURVEY §5) — generous enough for a contended box, tight enough that
  *    a complexity-class regression (the uncapped configs time out at
  *    600 s on 16 cores) cannot pass;
  *  - the FINDING-INVARIANTS: q39-scale's component count stays >10k on
  *    this corpus (the LSH graph actually finds the staged near-dup
  *    families), and the df-capped configs' documented 0-pair behavior on
  *    the vocab-degenerate corpus (cost bounded, evidence dropped — the
  *    zipfian-corpus recall measurement is ZipfDfCapSpec's job).
  */
class ScaleSf10Spec extends GraftSuite {

  private val sf10Dir = sys.env.getOrElse("SF10_DIR", "/tmp/sf10")

  private def gate(): Unit =
    corpusGate("sf10-scale-configs", s"$sf10Dir/documents.parquet",
      "scripts/sweep_sf10.sh")

  // wall budgets are calibrated on one quiet local[4] box; on a slower or
  // contended machine the multiplier (advisor r10) relaxes them without
  // touching the finding-invariant assertions, which stay unconditional
  private val budgetMult =
    sys.env.getOrElse("SPARK_GRAFT_BUDGET_MULT", "1.0").toDouble

  private def budgeted(baseBudgetS: Double)(f: => Long): Long = {
    val budgetS = baseBudgetS * budgetMult
    val t0 = System.nanoTime()
    val n = f
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"$secs%.1f s, $n rows (budget $budgetS%.0f s)")
    assert(secs <= budgetS,
      f"scale-path wall regression: $secs%.1f s > budget $budgetS%.0f s " +
        "(SPARK_GRAFT_BUDGET_MULT relaxes wall budgets on a slow/contended box)")
    n
  }

  test("q39-scale: CC over the LSH pair graph completes and finds the dup families") {
    gate()
    val components = budgeted(180)(ScaleStageSf10.q39Scale(spark, sf10Dir))
    // the staged corpus carries ~12.5k near-dup component rows (measured
    // r9); a graph that suddenly loses them means the LSH banding or the
    // exact-first collapse broke, not that the corpus got cleaner
    assert(components > 10000L,
      s"LSH pair graph found only $components component rows — banding regression")
  }

  test("q57-scale: capped standing-index ingest completes inside the budget") {
    gate()
    val pairs = budgeted(120)(ScaleStageSf10.q57Scale(spark, sf10Dir))
    // documented r9 finding: at df-cap 200 on the vocab-degenerate corpus
    // EVERY cross-doc shingle is over-cap, so evidence drops to zero —
    // the cost bound is the assertion here; recall-on-realistic-text is
    // measured on the zipfian corpus instead
    assert(pairs == 0L,
      s"df-cap 200 unexpectedly emitted $pairs pairs on the degenerate corpus " +
        "— the corpus shape or the cap semantics changed; re-derive the finding")
  }

  test("q80-scale: LSH-staged curation pipeline completes inside the budget") {
    gate()
    budgeted(150)(ScaleStageSf10.q80Scale(spark, sf10Dir))
  }

  test("q87-scale: capped containment completes inside the budget") {
    gate()
    val pairs = budgeted(90)(ScaleStageSf10.q87Scale(spark, sf10Dir))
    assert(pairs == 0L,
      s"df-cap 200 unexpectedly emitted $pairs containment pairs on the " +
        "degenerate corpus — re-derive the r9 finding")
  }
}
