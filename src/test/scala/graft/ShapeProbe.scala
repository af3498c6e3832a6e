package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r12 — not part of any suite; run manually like
  * Q97Profile): print [[graft.operators.Dedup.corpusShape]]'s measured
  * statistics and dispatch for the documents table of each given sfDir —
  * the router's verdict on the REAL corpora, at any scale the shape probe
  * is a bounded-sample cost.
  * Run: `java -cp <test classpath> graft.ShapeProbe /root/testdata/sf0.1 /tmp/sf1 /tmp/sf10`
  */
object ShapeProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[16]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val d = graft.sources.Readers.table(s, dir, "documents")
      val sh = graft.operators.Dedup.corpusShape(d, col("doc_id"), col("text"))
      println(f"SHAPE $dir sample=${sh.sampleDocs} cloneRate=${sh.cloneRate}%.3f " +
        f"dfHeadShare=${sh.dfHeadShare}%.3f -> ${sh.method}")
    }
    s.stop()
  }
}
