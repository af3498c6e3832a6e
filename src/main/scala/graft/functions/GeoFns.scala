package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Great-circle distance (reference: notebooks/CitiBike-1.ipynb
  * `getDistance` via geopy → output/nearby_stations.json). Haversine on the
  * mean-Earth radius; pure Column math so Catalyst codegens it and DuckDB can
  * reproduce it verbatim for the oracle.
  *
  * DOCUMENTED SUBSTITUTION for users porting from the reference: geopy's
  * default is the geodesic (ellipsoidal WGS-84) distance, which differs from
  * haversine by up to ~0.5% (~0.3% at NYC latitudes) — a few metres at the
  * 0.5 km nearby-stations threshold, so borderline pairs within ±0.5% of a
  * cutoff may classify differently than the reference's output.
  */
object GeoFns {
  private val EarthRadiusKm = 6371.0088

  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    // clamp to 1: float error on near-antipodal points can push `a` a few
    // ULP past 1, and asin(sqrt(>1)) = NaN, which sorts ABOVE every real
    // distance in Spark orderings (the q09 oracle applies the same least())
    lit(2 * EarthRadiusKm) * asin(sqrt(least(lit(1.0), a)))
  }

  /** Deterministic synthetic station coordinates derived from an integer key
    * (testdata has no lat/long; the oracle reproduces the same arithmetic).
    */
  def synthLat(key: Column): Column = lit(40.0) + (key % 1000).cast("double") * 0.001
  def synthLon(key: Column): Column = lit(-74.0) + ((key * 7) % 1000).cast("double") * 0.001

  /** Grid cell for blocking distance self-joins: at 100 TB a pairwise
    * cross-join is impossible; neighbors within r km can only live in the
    * same or adjacent cells of an r-sized grid (~0.009 deg lat per km).
    */
  def latCell(lat: Column, cellDeg: Double): Column = floor(lat / cellDeg).cast("long")
  def lonCell(lon: Column, cellDeg: Double): Column = floor(lon / cellDeg).cast("long")
}
