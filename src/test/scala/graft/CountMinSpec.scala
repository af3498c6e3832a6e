package graft

import graft.functions.TextFns
import graft.plans.CountMin
import org.apache.spark.sql.functions._

class CountMinSpec extends GraftSuite {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  /** Reference grid built single-threaded in plain Scala. */
  private def refGrid(tokens: Seq[String]): Array[Long] = {
    val g = new Array[Long](depth * width)
    tokens.foreach { t =>
      (0 until depth).foreach(r => g(r * width + CountMin.md5Bucket(t, r, width)) += 1L)
    }
    g
  }

  test("md5Bucket agrees with the Catalyst conv/substring/md5 formulation") {
    val toks = Seq("a", "tok42", "naïve", "日本語", "x y", "", ":", "0:1")
    val rows = toks.toDF("tok").select(col("tok") +:
        (0 until depth).map(r =>
          (conv(substring(md5(col("tok")), 1 + 8 * r, 8), 16, 10)
            .cast("long") % width).as(s"b$r")): _*)
      .collect()
    rows.foreach { row =>
      val t = row.getString(0)
      (0 until depth).foreach { r =>
        assert(row.getLong(r + 1) == CountMin.md5Bucket(t, r, width),
          s"bucket mismatch for '$t' row $r")
      }
    }
  }

  test("sketch is partitioning-independent and equals the sequential build") {
    val tokens = (0 until 3000).map(i => s"t${i % 97}")
    val expected = refGrid(tokens)
    Seq(1, 13).foreach { parts =>
      val got = tokens.toDF("tok").repartition(parts)
        .agg(CountMin.countMin(col("tok"), depth, width))
        .as[Seq[Long]].head()
      assert(got == expected.toSeq, s"grid diverged at $parts partitions")
    }
  }

  test("nulls are skipped; empty input yields the zero grid") {
    val got = Seq[(java.lang.Long, String)]((1L, null), (2L, null))
      .toDF("id", "tok")
      .agg(CountMin.countMin(col("tok"), depth, width))
      .as[Seq[Long]].head()
    assert(got.forall(_ == 0L) && got.length == depth * width)
  }

  test("point estimates never underestimate, and are exact sans collision") {
    val tokens = (0 until 500).flatMap(i => Seq.fill(i % 5 + 1)(s"w$i"))
    val truth = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val grid = refGrid(tokens)
    truth.foreach { case (t, cnt) =>
      val est = (0 until depth)
        .map(r => grid(r * width + CountMin.md5Bucket(t, r, width))).min
      assert(est >= cnt, s"CMS underestimated '$t'")
    }
    // a singleton corpus cannot collide with itself: est == true everywhere
    val solo = refGrid(Seq("only"))
    val est = (0 until depth)
      .map(r => solo(r * width + CountMin.md5Bucket("only", r, width))).min
    assert(est == 1L)
  }

  test("graft_count_min and graft_misra_gries are callable from SQL") {
    Seq("a a a b b c", "a c c d").toDF("text").createOrReplaceTempView("cms_in")
    val grid = spark.sql(
        s"SELECT graft_count_min(tok, $depth, $width) FROM " +
          "(SELECT explode(split(text, ' ')) AS tok FROM cms_in)")
      .as[Seq[Long]].head()
    assert(grid.sum == depth.toLong * 10) // 10 tokens, one hit per row each
    val heavy = spark.sql(
        "SELECT graft_misra_gries(tok, 2) FROM " +
          "(SELECT explode(split(text, ' ')) AS tok FROM cms_in)")
      .as[Seq[String]].head()
    assert(heavy.contains("a")) // freq 4 > 10/(2+1): guaranteed present
  }

  test("q101 contract: est_df >= true_df on every probed shingle") {
    val out = SparkEntry.queries("q101_cms_df")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(r.fieldIndex("est_df")) >=
      r.getLong(r.fieldIndex("true_df"))))
    assert(rows.forall(r => r.getLong(r.fieldIndex("overcount")) ==
      r.getLong(r.fieldIndex("est_df")) - r.getLong(r.fieldIndex("true_df"))))
  }
}
