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
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
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
