package graft.streaming

import graft.functions.TextFns
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
    * (Catalyst `BloomFilterAggregate` — distributed build, only the
    * ~numBits/8-byte sketch reaches the driver) and inlined as a literal,
    * so the stream side is a STATELESS codegen-friendly filter: no
    * stream-batch join, no state store, each micro-batch costs one scan.
    *
    * Bloom false positives drop ~fpp of CLEAN documents — the conservative
    * direction for decontamination (never passes a contaminated doc);
    * size `numBits` for the expected distinct held-out grams
    * (~10 bits/item ⇒ ~1% fpp). EAGER: building the sketch runs a job on
    * the held-out (batch) side before the query starts.
    */
  def decontaminateStream(docs: DataFrame, text: Column,
                          heldOut: DataFrame, heldText: Column, n: Int,
                          expectedItems: Long, numBits: Long): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftshim.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    val heldGrams = heldOut
      .select(explode(TextFns.shingles(heldText, n)).as("g"))
      .select(xxhash64(col("g")).as("gh"))
      .distinct()
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(col("gh")),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val bf = heldGrams.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    def mightContain(h: Column): Column = ColumnBridge.column(
      BloomFilterMightContain(Literal(bf, BinaryType),
        ColumnBridge.expression(h)))
    // a doc is contaminated when ANY of its gram hashes might be held out;
    // exists() short-circuits on the first hit
    docs.filter(!exists(TextFns.shingles(text, n),
      s => mightContain(xxhash64(s))))
  }
}
