package graft.streaming

import graft.functions.TextFns
import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twins of the document-pipeline operators — the production
  * ingest shape: documents arrive as a stream and are filtered/scored
  * map-side against batch-built artifacts, with no per-batch joins and no
  * state store.
  */
object DocsStream {

  /** Decontamination at ingest: drop streaming documents that share any
    * word n-gram with a held-out evaluation set (the streaming twin of
    * `Dedup.contaminationHitsBloom`, reference decontamination semantics
    * per SURVEY §2b q49/q56).
    *
    * The held-out grams are sketched ONCE, batch-side, into a Bloom filter
    * (`Dedup.bloomSketch` — distributed build, only the ~numBits/8-byte
    * sketch reaches the driver) and inlined as a literal, so the stream
    * side is STATELESS: no stream-batch join, no state store, each
    * micro-batch pays one scan. The per-doc probe is an `exists()` over
    * the gram hashes — a higher-order function, so it evaluates interpreted
    * (one `might_contain` call per gram until the first hit); fine at
    * ingest rates, and the price of having no join — a native expression
    * is the upgrade path if ingest ever becomes probe-bound.
    *
    * Bloom false positives drop ~fpp of CLEAN documents — the conservative
    * direction for decontamination (never passes a contaminated doc);
    * size `numBits` for the expected distinct held-out grams
    * (~10 bits/item ⇒ ~1% fpp). An EMPTY held-out gram set means nothing
    * is contaminated: every document passes (the sketch is NULL then, and
    * filtering on the three-valued !might_contain would silently drop
    * EVERYTHING instead). EAGER: building the sketch runs a job on the
    * held-out (batch) side before the query starts.
    */
  def decontaminateStream(docs: DataFrame, text: Column,
                          heldOut: DataFrame, heldText: Column, n: Int,
                          expectedItems: Long, numBits: Long): DataFrame = {
    val heldGrams = heldOut
      .select(explode(TextFns.shingles(heldText, n)).as("g"))
      .select(xxhash64(col("g")).as("gh"))
      .distinct()
    val bf = Dedup.bloomSketch(heldGrams, "gh", expectedItems, numBits)
    if (bf == null) docs
    else
      // a doc is contaminated when ANY of its gram hashes might be held
      // out; exists() short-circuits on the first hit
      docs.filter(!exists(TextFns.shingles(text, n),
        s => Dedup.bloomMightContain(bf, xxhash64(s))))
  }
}
