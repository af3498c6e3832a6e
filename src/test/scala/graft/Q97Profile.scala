package graft

import graft.sources.AnnIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q97 lifecycle stages (round 11 — not part of
  * any suite; run manually when retuning the contract query's cost).
  */
object Q97Profile {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q97prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val embs = graft.sources.Readers.table(s, dir, "embeddings")
      val root = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_q97_prof")
      graft.sources.Writers.deleteRecursively(root)
      val path = root.resolve("ann_index").toString
      val third = pmod(col("vec_id"), lit(3))
      val numCells = sys.env.getOrElse("Q97_CELLS", "16").toInt
      val model = t("build")(AnnIndex.build(embs.filter(third === 0),
        "vec_id", "embedding", numCells = numCells, kmeansIters = 1))
      t("write")(AnnIndex.write(model, path, "0001"))
      t("append1")(AnnIndex.append(s, path, "0001", embs.filter(third === 1)))
      t("append2")(AnnIndex.append(s, path, "0001", embs.filter(third === 2)))
      t("compact")(AnnIndex.compact(s, path, "0001"))
      val m = t("read")(AnnIndex.read(s, path, Some("0001")))
      t("search")(AnnIndex.searchIvf(m, embs.filter(col("vec_id") < 10), 5,
          nProbe = numCells)
        .write.mode("overwrite").format("noop").save())
    }
    s.stop()
  }
}
