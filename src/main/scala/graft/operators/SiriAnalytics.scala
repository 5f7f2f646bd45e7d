package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.SiriSnapshotEtl.EtlResult

/** The analytical query surface a consumer of the reference's stride DB
  * runs over the star schema (rides, routes, stops, vehicle
  * locations). All inputs are the EtlResult tables; dims broadcast,
  * facts scan once per query.
  */
object SiriAnalytics {

  /** Ride summaries: observed duration, distance progression, top
    * speed — the per-ride rollup behind "ride history" views. */
  def rideSummaries(r: EtlResult): DataFrame =
    r.vehicleLocations
      .join(broadcast(r.rideStops.select("siri_ride_stop_id", "siri_ride_id")),
        Seq("siri_ride_stop_id"))
      .groupBy(col("siri_ride_id"))
      .agg(
        count(lit(1)).as("n_locations"),
        min(col("recorded_at_time")).as("first_seen"),
        max(col("recorded_at_time")).as("last_seen"),
        max(col("distance_from_journey_start")).as("max_distance"),
        max(col("velocity")).as("max_velocity"))
      .withColumn("observed_secs",
        unix_timestamp(col("last_seen")) - unix_timestamp(col("first_seen")))

  /** Vehicles actively reporting per route per minute — the live
    * operations dashboard aggregate. */
  def activeVehiclesPerRoute(r: EtlResult): DataFrame = {
    val rideToRoute = r.rides.select("siri_ride_id", "siri_route_id", "vehicle_ref")
    r.vehicleLocations
      .join(broadcast(r.rideStops.select("siri_ride_stop_id", "siri_ride_id")),
        Seq("siri_ride_stop_id"))
      .join(broadcast(rideToRoute), Seq("siri_ride_id"))
      .groupBy(date_trunc("minute", col("recorded_at_time")).as("minute"),
        col("siri_route_id"))
      .agg(countDistinct(col("vehicle_ref")).as("n_vehicles"),
        count(lit(1)).as("n_reports"))
  }

  /** Headways: per (route, stop), the gap between consecutive rides'
    * last report at that stop — the service-regularity metric transit
    * agencies actually publish (and the bunching detector: a headway
    * far below route median means two vehicles bunched). Window
    * partitions by (route, stop) — the natural key — so at 100 TB the
    * sort is per-stop-sized, never global. */
  def stopHeadways(r: EtlResult): DataFrame = {
    val rideToRoute = r.rides.select("siri_ride_id", "siri_route_id")
    val arrivals = r.vehicleLocations
      .join(broadcast(r.rideStops.select("siri_ride_stop_id", "siri_ride_id",
        "siri_stop_id")), Seq("siri_ride_stop_id"))
      .join(broadcast(rideToRoute), Seq("siri_ride_id"))
      .groupBy(col("siri_route_id"), col("siri_stop_id"), col("siri_ride_id"))
      .agg(max(col("recorded_at_time")).as("arrived_at"))
    val w = Window.partitionBy(col("siri_route_id"), col("siri_stop_id"))
      .orderBy(col("arrived_at"))
    arrivals
      .withColumn("headway_secs",
        unix_timestamp(col("arrived_at")) -
          lag(unix_timestamp(col("arrived_at")), 1).over(w))
      .withColumn("route_median_headway",
        expr("percentile(headway_secs, 0.5)").over(
          Window.partitionBy(col("siri_route_id"))))
      .withColumn("bunched",
        col("headway_secs").isNotNull &&
          col("headway_secs") < col("route_median_headway") * 0.25)
  }

  /** Stop-visit progression per ride: the ordered (order, stop) chain
    * with arrival-ish timestamps — input to headway/dwell analyses. */
  def stopProgression(r: EtlResult): DataFrame = {
    val w = Window.partitionBy(col("siri_ride_id")).orderBy(col("order"))
    r.vehicleLocations
      .join(broadcast(r.rideStops.select("siri_ride_stop_id", "siri_ride_id",
        "siri_stop_id", "order")), Seq("siri_ride_stop_id"))
      .groupBy(col("siri_ride_id"), col("siri_stop_id"), col("order"))
      .agg(max(col("recorded_at_time")).as("last_report_at_stop"))
      .withColumn("prev_order", lag(col("order"), 1).over(w))
      .withColumn("secs_since_prev_stop",
        unix_timestamp(col("last_report_at_stop")) -
          lag(unix_timestamp(col("last_report_at_stop")), 1).over(w))
  }
}
