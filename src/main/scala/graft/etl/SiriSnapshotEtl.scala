package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference pipeline (open_bus_siri_etl.process_snapshot) as a
  * declarative Spark job over batches of raw SIRI-SM JSON snapshots.
  *
  * Reference semantics preserved:
  *  - parse_monitored_stop_visit (process_snapshot.py:214): typed
  *    coercion, journey_ref = DataFrameRef||'-'||DatedVehicleJourneyRef,
  *    defaults (vehicle_ref '', bearing/velocity/distance -1), any
  *    missing required field ⇒ the visit is diverted to a parse-errors
  *    output (save_monitored_stop_visit_parse_error,
  *    process_snapshot.py:46) and counted per snapshot.
  *  - ObjectsMaker get-or-create (process_snapshot.py:51): four
  *    dimensions keyed by natural keys; first sighting creates the row,
  *    later sightings reuse it. Here: distinct + left_anti against the
  *    existing dim, surrogate = xxhash64(natural key) so ids need no
  *    global coordination at 100 TB (SURVEY.md §5).
  *  - snapshot lifecycle stats (update_siri_snapshot_loaded,
  *    process_snapshot.py:302): per-snapshot success/fail counts and
  *    per-dimension added counts.
  *  - idempotent reload (process_snapshot.py:269): facts of a reloaded
  *    snapshot are replaced, dims only ever grow.
  *
  * Scale design: one scan parses everything (from_json + two explodes,
  * all map-side); each dimension is one distinct (partial-agg) pass;
  * fact keying joins against broadcast dims. Facts partition by
  * snapshot date for single-partition reload.
  */
object SiriSnapshotEtl {

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ssXXX"

  /** Raw snapshots (snapshot_id, json) → one row per MonitoredStopVisit
    * with typed fields + `parse_ok`. Pure projection. */
  def parseVisits(raw: DataFrame): DataFrame = {
    val mvj = col("visit.MonitoredVehicleJourney")
    raw
      .select(col("snapshot_id"), from_json(col("json"), SiriSchema.root).as("doc"))
      // explode_outer + the filter below: a malformed document (doc or
      // delivery null after from_json) must surface as ONE failed visit
      // so the snapshot gets an error-status row (the reference marks
      // the whole snapshot failed, process_snapshot.py:289) — a plain
      // explode would silently drop it. A well-formed delivery with an
      // empty visit list stays invisible (zero visits, zero failures).
      .select(col("snapshot_id"), col("doc"),
        explode_outer(col("doc.Siri.ServiceDelivery.StopMonitoringDelivery")).as("smd"))
      .select(col("snapshot_id"), col("doc"), col("smd"),
        explode_outer(col("smd.MonitoredStopVisit")).as("visit"))
      .filter(col("visit").isNotNull || col("doc.Siri.ServiceDelivery").isNull ||
        col("smd").isNull)
      .select(
        col("snapshot_id"),
        to_timestamp(col("visit.RecordedAtTime"), TsFmt).as("recorded_at_time"),
        mvj.getField("LineRef").cast("long").as("line_ref"),
        mvj.getField("OperatorRef").cast("long").as("operator_ref"),
        // null-propagating concat (NOT concat_ws, which skips nulls): the
        // reference's '+' concatenation raises when either ref is missing
        // and the visit goes to parse errors (process_snapshot.py:220) —
        // a half-keyed journey_ref must never load.
        concat(
          mvj.getField("FramedVehicleJourneyRef").getField("DataFrameRef"),
          lit("-"),
          mvj.getField("FramedVehicleJourneyRef").getField("DatedVehicleJourneyRef"))
          .as("journey_ref"),
        to_timestamp(mvj.getField("OriginAimedDepartureTime"), TsFmt).as("scheduled_start_time"),
        coalesce(mvj.getField("VehicleRef"), lit("")).as("vehicle_ref"),
        mvj.getField("MonitoredCall").getField("Order").cast("int").as("order"),
        mvj.getField("MonitoredCall").getField("StopPointRef").cast("long").as("stop_point_ref"),
        mvj.getField("VehicleLocation").getField("Longitude").cast("double").as("lon"),
        mvj.getField("VehicleLocation").getField("Latitude").cast("double").as("lat"),
        coalesce(mvj.getField("Bearing").cast("int"), lit(-1)).as("bearing"),
        coalesce(mvj.getField("Velocity").cast("int"), lit(-1)).as("velocity"),
        coalesce(mvj.getField("MonitoredCall").getField("DistanceFromStop").cast("int"), lit(-1))
          .as("distance_from_journey_start"))
      .withColumn("parse_ok",
        col("recorded_at_time").isNotNull && col("line_ref").isNotNull &&
          col("operator_ref").isNotNull && col("journey_ref").isNotNull &&
          col("scheduled_start_time").isNotNull && col("order").isNotNull &&
          col("stop_point_ref").isNotNull && col("lon").isNotNull && col("lat").isNotNull)
  }

  /** The parse-errors sink: visits that failed coercion, kept with their
    * snapshot for the backup-cleanup task (reference keeps jsonlines per
    * snapshot_id). */
  def parseErrors(visits: DataFrame): DataFrame =
    visits.filter(!col("parse_ok"))

  private def okVisits(visits: DataFrame): DataFrame =
    visits.filter(col("parse_ok"))

  // ---- dimension builders (get-or-create against an optional existing dim) ----

  private def newKeys(batch: DataFrame, existing: Option[DataFrame], keys: Seq[String]): DataFrame =
    existing match {
      case Some(e) => batch.join(e.select(keys.map(col): _*), keys, "left_anti")
      case None => batch
    }

  /** siri_route(operator_ref, line_ref) — id = xxhash64 of the key. */
  def routes(visits: DataFrame, existing: Option[DataFrame] = None): DataFrame = {
    val batch = okVisits(visits).select(col("operator_ref"), col("line_ref")).distinct()
    newKeys(batch, existing, Seq("operator_ref", "line_ref"))
      .withColumn("siri_route_id", xxhash64(lit("route"), col("operator_ref"), col("line_ref")))
  }

  /** siri_stop(code). */
  def stops(visits: DataFrame, existing: Option[DataFrame] = None): DataFrame = {
    val batch = okVisits(visits).select(col("stop_point_ref").as("code")).distinct()
    newKeys(batch, existing, Seq("code"))
      .withColumn("siri_stop_id", xxhash64(lit("stop"), col("code")))
  }

  /** siri_ride(route, journey_ref, vehicle_ref) + scheduled_start_time
    * of the FIRST sighting (reference creates once and never updates —
    * ObjectsMaker caches the created row). */
  def rides(visits: DataFrame, existing: Option[DataFrame] = None): DataFrame = {
    val w = Window.partitionBy(col("operator_ref"), col("line_ref"), col("journey_ref"), col("vehicle_ref"))
      .orderBy(col("recorded_at_time"), col("scheduled_start_time"))
    val batch = okVisits(visits)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("operator_ref"), col("line_ref"), col("journey_ref"),
        col("vehicle_ref"), col("scheduled_start_time"))
    newKeys(batch, existing, Seq("operator_ref", "line_ref", "journey_ref", "vehicle_ref"))
      .withColumn("siri_route_id", xxhash64(lit("route"), col("operator_ref"), col("line_ref")))
      .withColumn("siri_ride_id",
        xxhash64(lit("ride"), col("siri_route_id"), col("journey_ref"), col("vehicle_ref")))
  }

  /** siri_ride_stop(ride, stop, order). */
  def rideStops(visits: DataFrame, existing: Option[DataFrame] = None): DataFrame = {
    val batch = okVisits(visits)
      .select(col("operator_ref"), col("line_ref"), col("journey_ref"), col("vehicle_ref"),
        col("stop_point_ref"), col("order")).distinct()
    newKeys(batch, existing,
      Seq("operator_ref", "line_ref", "journey_ref", "vehicle_ref", "stop_point_ref", "order"))
      .withColumn("siri_route_id", xxhash64(lit("route"), col("operator_ref"), col("line_ref")))
      .withColumn("siri_ride_id",
        xxhash64(lit("ride"), col("siri_route_id"), col("journey_ref"), col("vehicle_ref")))
      .withColumn("siri_stop_id", xxhash64(lit("stop"), col("stop_point_ref")))
      .withColumn("siri_ride_stop_id",
        xxhash64(lit("ride_stop"), col("siri_ride_id"), col("siri_stop_id"), col("order")))
  }

  /** siri_vehicle_location facts: every successfully parsed visit, keyed
    * by its ride-stop surrogate. Pure projection — the surrogate is a
    * hash of natural keys already on the row, so NO join is needed to
    * key facts (the reference needs four DB round-trips here). */
  def vehicleLocations(visits: DataFrame): DataFrame =
    okVisits(visits)
      .withColumn("siri_route_id", xxhash64(lit("route"), col("operator_ref"), col("line_ref")))
      .withColumn("siri_ride_id",
        xxhash64(lit("ride"), col("siri_route_id"), col("journey_ref"), col("vehicle_ref")))
      .withColumn("siri_stop_id", xxhash64(lit("stop"), col("stop_point_ref")))
      .withColumn("siri_ride_stop_id",
        xxhash64(lit("ride_stop"), col("siri_ride_id"), col("siri_stop_id"), col("order")))
      .select(col("snapshot_id"), col("siri_ride_stop_id"), col("recorded_at_time"),
        col("lon"), col("lat"), col("bearing"), col("velocity"),
        col("distance_from_journey_start"))

  /** Per-snapshot lifecycle stats (the siri_snapshot row the reference
    * maintains: loaded status, parse counts, added-per-dim counts). */
  def snapshotStats(visits: DataFrame): DataFrame = {
    val perSnapshot = visits.groupBy(col("snapshot_id")).agg(
      sum(when(col("parse_ok"), 1L).otherwise(0L)).as("num_successful_parse_vehicle_locations"),
      sum(when(col("parse_ok"), 0L).otherwise(1L)).as("num_failed_parse_vehicle_locations"))
    val ok = okVisits(visits)
    def firstSnapshotCount(keyed: DataFrame, alias: String): DataFrame = {
      // a dim row is "added by" the first snapshot that saw its key
      val w = Window.partitionBy(keyed.columns.filter(_ != "snapshot_id").map(col): _*)
        .orderBy(col("snapshot_id"))
      keyed.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("snapshot_id")).agg(count(lit(1)).as(alias))
    }
    perSnapshot
      .join(firstSnapshotCount(ok.select(col("snapshot_id"), col("operator_ref"), col("line_ref")).distinct(),
        "num_added_siri_routes"), Seq("snapshot_id"), "left")
      .join(firstSnapshotCount(ok.select(col("snapshot_id"), col("stop_point_ref")).distinct(),
        "num_added_siri_stops"), Seq("snapshot_id"), "left")
      .join(firstSnapshotCount(ok.select(col("snapshot_id"), col("operator_ref"), col("line_ref"),
        col("journey_ref"), col("vehicle_ref")).distinct(),
        "num_added_siri_rides"), Seq("snapshot_id"), "left")
      .join(firstSnapshotCount(ok.select(col("snapshot_id"), col("operator_ref"), col("line_ref"),
        col("journey_ref"), col("vehicle_ref"), col("stop_point_ref"), col("order")).distinct(),
        "num_added_siri_ride_stops"), Seq("snapshot_id"), "left")
      .na.fill(0L)
      // reference status semantics (process_snapshot.py:289,302): a
      // snapshot that produced nothing but failures (e.g. an unparseable
      // document) is `error` with a reason, and re-enters the backlog
      // (Backfill.processBacklog picks error-status ids up); a loaded
      // snapshot carries error='' even when some visits failed to parse.
      .withColumn("etl_status",
        when(col("num_successful_parse_vehicle_locations") > 0 ||
          col("num_failed_parse_vehicle_locations") === 0, lit("loaded"))
          .otherwise(lit("error")))
      .withColumn("error",
        when(col("etl_status") === "error", lit("no parseable visits")).otherwise(lit("")))
  }

  /** Reconciliation (validate_snapshots.py): join the star back together
    * and compare field-by-field against a fresh parse. Returns mismatch
    * rows; empty ⇒ valid. */
  def validate(visits: DataFrame, facts: DataFrame, rideStopDim: DataFrame,
      rideDim: DataFrame, stopDim: DataFrame): DataFrame = {
    val reassembled = facts
      .join(broadcast(rideStopDim.select(col("siri_ride_stop_id"), col("siri_ride_id"),
        col("siri_stop_id"), col("order"))), Seq("siri_ride_stop_id"))
      .join(broadcast(rideDim.select(col("siri_ride_id"), col("journey_ref"),
        col("vehicle_ref"), col("scheduled_start_time"))), Seq("siri_ride_id"))
      .join(broadcast(stopDim.select(col("siri_stop_id"), col("code"))), Seq("siri_stop_id"))
      .select(col("snapshot_id"), col("recorded_at_time"), col("lon"), col("lat"),
        col("bearing"), col("velocity"), col("distance_from_journey_start"),
        col("journey_ref"), col("vehicle_ref"), col("scheduled_start_time"),
        col("code"), col("order"))
    val expected = visits.filter(col("parse_ok"))
      .select(col("snapshot_id"), col("recorded_at_time"), col("lon"), col("lat"),
        col("bearing"), col("velocity"), col("distance_from_journey_start"),
        col("journey_ref"), col("vehicle_ref"), col("scheduled_start_time"),
        col("stop_point_ref").as("code"), col("order"))
    reassembled.exceptAll(expected).withColumn("side", lit("db_only"))
      .unionAll(expected.exceptAll(reassembled).withColumn("side", lit("parse_only")))
  }

  /** Field-level reconciliation report (validate_snapshots.py:100 emits
    * one row per mismatching FIELD, keyed by the vehicle-location
    * natural key, with expected vs actual): both derivations join on
    * the location key, then each compared field contributes its own
    * mismatch row. Rows present on only one side report field
    * 'presence'. Empty result ⇒ valid. */
  def validateFields(visits: DataFrame, facts: DataFrame, rideStopDim: DataFrame,
      rideDim: DataFrame, stopDim: DataFrame): DataFrame = {
    val locKey = Seq("snapshot_id", "recorded_at_time", "lon", "lat",
      "bearing", "velocity", "distance_from_journey_start")
    val fields = Seq("journey_ref", "vehicle_ref", "scheduled_start_time", "code", "order")
    def sided(df: DataFrame, side: String): DataFrame =
      fields.foldLeft(df)((d, f) => d.withColumnRenamed(f, s"${side}_$f"))
        .withColumn(s"${side}_present", lit(true))
    val reassembled = sided(facts
      .join(broadcast(rideStopDim.select(col("siri_ride_stop_id"), col("siri_ride_id"),
        col("siri_stop_id"), col("order"))), Seq("siri_ride_stop_id"))
      .join(broadcast(rideDim.select(col("siri_ride_id"), col("journey_ref"),
        col("vehicle_ref"), col("scheduled_start_time"))), Seq("siri_ride_id"))
      .join(broadcast(stopDim.select(col("siri_stop_id"), col("code"))), Seq("siri_stop_id"))
      .select((locKey ++ fields).map(col): _*), "db")
    val expected = sided(visits.filter(col("parse_ok"))
      .withColumnRenamed("stop_point_ref", "code")
      .select((locKey ++ fields).map(col): _*), "parse")
    val joined = expected.join(reassembled, locKey, "full_outer")
    val presence = joined
      .filter(col("parse_present").isNull || col("db_present").isNull)
      .select(locKey.map(col) :+ lit("presence").as("field") :+
        when(col("parse_present").isNotNull, lit("parsed row")).otherwise(lit("")).as("expected") :+
        when(col("db_present").isNotNull, lit("db row")).otherwise(lit("")).as("actual"): _*)
    val fieldMismatches = fields.map { f =>
      joined
        .filter(col("parse_present").isNotNull && col("db_present").isNotNull &&
          !(col(s"parse_$f") <=> col(s"db_$f")))
        .select(locKey.map(col) :+ lit(f).as("field") :+
          col(s"parse_$f").cast("string").as("expected") :+
          col(s"db_$f").cast("string").as("actual"): _*)
    }
    fieldMismatches.foldLeft(presence)(_ unionByName _)
  }

  /** Whole-batch ETL result. */
  case class EtlResult(visits: DataFrame, routes: DataFrame, stops: DataFrame,
      rides: DataFrame, rideStops: DataFrame, vehicleLocations: DataFrame,
      snapshotStats: DataFrame, parseErrors: DataFrame)

  /** Run the full pipeline over raw (snapshot_id, json) rows. */
  def run(raw: DataFrame): EtlResult = {
    val visits = parseVisits(raw)
    EtlResult(visits, routes(visits), stops(visits), rides(visits), rideStops(visits),
      vehicleLocations(visits), snapshotStats(visits), parseErrors(visits))
  }
}
