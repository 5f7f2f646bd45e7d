package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-ride live tracking — the stateful piece of the reference's
  * daemon. The reference keeps an in-process ObjectsMaker cache of the
  * rides it has seen and their latest state (process_snapshot.py:51);
  * in Structured Streaming that state belongs in the engine's state
  * store: keyed by ride, updated per micro-batch, checkpointed,
  * expired on event-time timeout — survives restarts, scales across
  * executors, no driver-resident cache.
  */
object RideState {

  case class VisitEvent(rideKey: String, recordedAtMs: Long, lon: Double,
      lat: Double, velocity: Int, distanceFromJourneyStart: Int)

  case class RideProgress(rideKey: String, nVisits: Long, firstMs: Long,
      lastMs: Long, lastLon: Double, lastLat: Double,
      maxDistance: Int, maxVelocity: Int, closed: Boolean)

  /** Fold one micro-batch of visits into the ride's running state;
    * emit the updated progress row. A ride silent past the timeout is
    * emitted once more as closed and dropped from the store. */
  def updateRide(key: String, events: Iterator[VisitEvent],
      state: GroupState[RideProgress]): Iterator[RideProgress] = {
    if (state.hasTimedOut) {
      val last = state.get.copy(closed = true)
      state.remove()
      Iterator.single(last)
    } else {
      val sorted = events.toSeq.sortBy(_.recordedAtMs)
      if (sorted.isEmpty) Iterator.empty
      else {
        val prev = state.getOption.getOrElse(
          RideProgress(key, 0L, sorted.head.recordedAtMs, Long.MinValue,
            0.0, 0.0, -1, -1, closed = false))
        val last = sorted.last
        val next = RideProgress(
          rideKey = key,
          nVisits = prev.nVisits + sorted.size,
          firstMs = math.min(prev.firstMs, sorted.head.recordedAtMs),
          lastMs = math.max(prev.lastMs, last.recordedAtMs),
          lastLon = last.lon, lastLat = last.lat,
          maxDistance = math.max(prev.maxDistance, sorted.map(_.distanceFromJourneyStart).max),
          maxVelocity = math.max(prev.maxVelocity, sorted.map(_.velocity).max),
          closed = false)
        state.update(next)
        state.setTimeoutDuration("30 minutes")
        Iterator.single(next)
      }
    }
  }

  /** Wire the stateful fold over a (streaming or batch) visit dataset. */
  def track(visits: Dataset[VisitEvent]): Dataset[RideProgress] = {
    implicit val enc = Encoders.product[RideProgress]
    visits
      .groupByKey(_.rideKey)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(updateRide)
  }
}
