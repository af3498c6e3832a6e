package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest surfaces mirroring the reference's extract layer:
  * - schema-explicit CSV with date parsing and zip-as-string semantics
  *   (reference README.md "Fixing the zip data_type issue":
  *   `pd.read_csv(..., parse_dates=date_cols, dtype={'zip': str})`)
  * - stations.json-shaped nested JSON → flat table
  *   (reference "Stations-Flat", citibike-tracker Kernel.php flatten)
  * - parquet table loading for the testdata star schema.
  */
object Readers {

  /** Load a testdata table. Parquet TIMESTAMP(NANOS) (the events feed) is not
    * directly readable by Spark; read nanos as long and truncate to
    * microseconds (integer division — same truncation DuckDB applies), so
    * both engines see identical timestamp values.
    *
    * NOTE: sets `spark.sql.legacy.parquet.nanosAsLong` on the session as a
    * side effect — after the first call, plain `spark.read.parquet` on other
    * nanos-timestamp files returns LongType instead of erroring. Scoped
    * per-read isn't possible (the conf is consulted at scan planning time).
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val df = raw.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => raw
    }
    fanOutLocal(spark, df)
  }

  /** Local-mode-only leaf fan-out. The local testdata tables are one parquet
    * file with ONE row group each, so every scan stage planned from them is a
    * single task: parquet cannot split below a row group, and on local[32]
    * that serializes all map-side work above the scan (shingling, minhash,
    * tokenization — observed as one task grinding 31 idle cores). A real
    * cluster never sees this — 100 TB arrives as thousands of row groups and
    * leaf parallelism comes from file splits — so the fan-out is gated to
    * local masters and is a no-op whenever the scan already has at least half
    * the session's cores in partitions. The explicit partition count makes
    * this a REPARTITION_BY_NUM shuffle, which AQE is contracted not to
    * coalesce back down; Catalyst still pushes filters below Repartition and
    * prunes scan columns through it, so pushdown is unaffected.
    */
  private def fanOutLocal(spark: SparkSession, df: DataFrame): DataFrame = {
    if (!spark.sparkContext.isLocal) df
    else {
      val cores = spark.sparkContext.defaultParallelism
      // getNumPartitions counts FILE SPLITS, which over-reports effective
      // parallelism for single-row-group files (empty splits), so the gate
      // errs toward fanning out: only a scan already split >= cores/2 ways
      // is left alone.
      if (df.rdd.getNumPartitions * 2 >= cores) df
      else df.repartition(cores)
    }
  }

  /** CSV with an explicit schema — never inferSchema at scale (a full extra
    * pass over 100 TB). Keeps zip-like codes as strings so leading zeros
    * survive, parses timestamp columns on read.
    */
  def csvWithSchema(spark: SparkSession, path: String, schema: StructType,
                    timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("timestampFormat", timestampFormat)
      .csv(path)

  /** The reference's availability CSV schema, zip as string by construction. */
  val availabilitySchema: StructType = StructType(Seq(
    StructField("station_id", LongType),
    StructField("station_name", StringType),
    StructField("station_status", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("zip", StringType),
    StructField("borough", StringType),
    StructField("hood", StringType),
    StructField("available_bikes", LongType),
    StructField("available_docks", LongType),
    StructField("time_interval", TimestampType),
    StructField("created_at", TimestampType),
    StructField("weather_summary", StringType),
    StructField("precip_intensity", DoubleType),
    StructField("temperature", DoubleType),
    StructField("humidity", DoubleType),
    StructField("wind_speed", DoubleType),
    StructField("wind_gust", DoubleType),
    StructField("cloud_cover", DoubleType),
    StructField("weather_status", StringType),
    StructField("updated_at", TimestampType)))

  /** Flatten a stations-feed-shaped document: one JSON string column holding
    * `{"executionTime": ..., "stationBeanList": [...]}` → one row per
    * station per poll (reference "Stations-Raw" → "Stations-Flat").
    */
  def flattenStationsJson(raw: DataFrame, jsonCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("executionTime", StringType),
      StructField("stationBeanList", ArrayType(StructType(Seq(
        StructField("id", LongType),
        StructField("stationName", StringType),
        StructField("availableDocks", LongType),
        StructField("totalDocks", LongType),
        StructField("latitude", DoubleType),
        StructField("longitude", DoubleType),
        StructField("statusValue", StringType),
        StructField("availableBikes", LongType),
        StructField("lastCommunicationTime", StringType)))))))
    raw
      .withColumn("doc", from_json(col(jsonCol), schema))
      .select(col("doc.executionTime").as("execution_time"),
        explode(col("doc.stationBeanList")).as("s"))
      .select(
        to_timestamp(col("execution_time"), "yyyy-MM-dd hh:mm:ss a").as("poll_time"),
        col("s.id").as("station_id"),
        col("s.stationName").as("station_name"),
        col("s.availableBikes").as("available_bikes"),
        col("s.availableDocks").as("available_docks"),
        col("s.totalDocks").as("total_docks"),
        col("s.latitude").as("latitude"),
        col("s.longitude").as("longitude"),
        col("s.statusValue").as("station_status"),
        to_timestamp(col("s.lastCommunicationTime"), "yyyy-MM-dd hh:mm:ss a")
          .as("last_communication_time"))
  }
}
