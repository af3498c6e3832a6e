package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites run in
  * the forked test JVM).
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val Sf = "/root/testdata/sf0.001"
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  def sf: String = SparkTestBase.Sf

  /** Shared assertion for first-occurrence dedup results: exactly one
    * `is_first` row per distinct content, and it is the min-id row.
    * (Used by ScaleOpsSpec and PropertySpec — one contract, one place.)
    */
  def assertOneKeeperPerContent(flagged: org.apache.spark.sql.DataFrame,
                                contentCol: String, idCol: String): Unit = {
    import org.apache.spark.sql.functions._
    val perContent = flagged.groupBy(col(contentCol))
      .agg(sum(col("is_first").cast("long")).as("n_first"),
        min(col(idCol)).as("min_id"),
        min(when(col("is_first"), col(idCol))).as("first_id"))
    assert(perContent.filter(col("n_first") =!= 1L).count() == 0,
      "content with zero or several keepers")
    assert(perContent.filter(col("min_id") =!= col("first_id")).count() == 0,
      "keeper is not the min-id occurrence")
  }
}
