// 10×-scale describe() staged measurement (run: sbt Test/console < scripts/scale_stage_describe.scala)
// Stages 6M lineitem rows (10 id-shifted copies of sf0.1) and times the
// single-pass describeProfile over its four measure columns. The melt is
// 4× row amplification collapsing map-side into the (column, value)
// histogram; the histogram is persisted once and feeds moments + the
// two-level bucketed quantile chain. Evidence recorded in SURVEY §5.
import org.apache.spark.sql.functions._

val s = graft.SparkTestBase.spark
import s.implicits._
s.sparkContext.setLogLevel("ERROR")

val base = graft.sources.Readers.table(s, "/root/testdata/sf0.1", "lineitem").select($"l_orderkey", $"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax")
val staged = (0 until 10).map(i => base.select(($"l_orderkey" + lit(i * 100000000L)).as("l_orderkey"), $"l_quantity", ($"l_extendedprice" + lit(i.toDouble)).as("l_extendedprice"), $"l_discount", $"l_tax")).reduce(_ unionByName _).repartition(32).localCheckpoint()
println(s"staged rows: ${staged.count()}")

def time(name: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime()
  f
  println(f"[scaleDESC] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
}

// the price shift per copy multiplies the distinct-value count 10x too
// (~6M distinct doubles in the histogram) -- the shape that single-tasked
// the pre-round-7 window
time("describeProfile over 6M rows x 4 columns (~6M distinct prices)") {
  val out = graft.operators.Relational.describeProfile(staged, Seq(
    "l_quantity" -> $"l_quantity", "l_extendedprice" -> $"l_extendedprice",
    "l_discount" -> $"l_discount", "l_tax" -> $"l_tax"))
  println(out.orderBy("column_name").collect().map(r => r.getString(0) + " n=" + r.getLong(1)).mkString(" "))
}

sys.exit(0)
