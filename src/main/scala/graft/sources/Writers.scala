package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sink surfaces. At 100 TB the write layout IS the read plan of every
  * downstream query: hive-style partition columns give partition pruning;
  * bucketing gives shuffle-free joins/aggregations on the bucket key.
  */
object Writers {

  /** Hive-style partitioned parquet: downstream filters on the partition
    * columns prune whole directories before any IO.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table: co-locates rows by key so joins and
    * aggregations on `bucketCol` need no Exchange. The 100 TB pattern for a
    * fact table joined repeatedly on the same key.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Single-directory CSV/JSON exports (the reference's to_csv / json.dumps
    * outputs — README.md:660, notebooks/CitiBike-1.ipynb nearby_stations).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Per-key JSON documents (the reference's nearby_stations.json shape:
    * `{key: [{...}, ...]}` — notebooks/CitiBike-1.ipynb closest_stations).
    * `sort_array` makes the list order deterministic; the aggregation is
    * distributed, only the final JSON strings are row values.
    */
  def groupedJson(df: DataFrame, key: Column, entry: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(to_json(sort_array(collect_list(entry))).as("entries_json"))
}
