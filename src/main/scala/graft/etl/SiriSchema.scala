package graft.etl

import org.apache.spark.sql.types._

/** Nested schema of a SIRI-SM (stop monitoring) snapshot document, as
  * consumed by the reference (process_snapshot.py:31-34 walks
  * Siri.ServiceDelivery.StopMonitoringDelivery[].MonitoredStopVisit[]).
  *
  * Everything is read as STRING and coerced later — the reference's
  * parser does exactly that (int()/float()/strptime with failure
  * diversion, process_snapshot.py:214), and real-world SIRI feeds mix
  * numeric and string encodings freely.
  */
object SiriSchema {

  val monitoredCall: StructType = StructType(Seq(
    StructField("StopPointRef", StringType),
    StructField("Order", StringType),
    StructField("DistanceFromStop", StringType)))

  val vehicleLocation: StructType = StructType(Seq(
    StructField("Longitude", StringType),
    StructField("Latitude", StringType)))

  val framedVehicleJourneyRef: StructType = StructType(Seq(
    StructField("DataFrameRef", StringType),
    StructField("DatedVehicleJourneyRef", StringType)))

  val monitoredVehicleJourney: StructType = StructType(Seq(
    StructField("LineRef", StringType),
    StructField("OperatorRef", StringType),
    StructField("FramedVehicleJourneyRef", framedVehicleJourneyRef),
    StructField("OriginAimedDepartureTime", StringType),
    StructField("VehicleRef", StringType),
    StructField("Bearing", StringType),
    StructField("Velocity", StringType),
    StructField("VehicleLocation", vehicleLocation),
    StructField("MonitoredCall", monitoredCall)))

  val monitoredStopVisit: StructType = StructType(Seq(
    StructField("RecordedAtTime", StringType),
    StructField("MonitoredVehicleJourney", monitoredVehicleJourney)))

  val stopMonitoringDelivery: StructType = StructType(Seq(
    StructField("ResponseTimestamp", StringType),
    StructField("Status", StringType),
    StructField("MonitoredStopVisit", ArrayType(monitoredStopVisit))))

  val serviceDelivery: StructType = StructType(Seq(
    StructField("ResponseTimestamp", StringType),
    StructField("ProducerRef", StringType),
    StructField("StopMonitoringDelivery", ArrayType(stopMonitoringDelivery))))

  val root: StructType = StructType(Seq(
    StructField("Siri", StructType(Seq(
      StructField("ServiceDelivery", serviceDelivery))))))
}
