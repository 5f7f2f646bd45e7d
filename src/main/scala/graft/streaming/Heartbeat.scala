package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener

/** The reference's load heartbeat (process_snapshot.py keeps
  * siri_snapshot.last_heartbeat fresh while a snapshot loads, so the
  * monitor can tell a live worker from a dead one) as a
  * StreamingQueryListener: every micro-batch progress event appends a
  * heartbeat record — query id, batch, rows, wall time — that a
  * monitor reads. The listener is push-based (no polling thread) and
  * survives across queries on the session. */
class Heartbeat extends StreamingQueryListener {

  /** One progress event; `durationMs` is the batch's wall time
    * (triggerExecution) — the number the trigger-overrun check reads. */
  case class Beat(queryId: String, batchId: Long, numInputRows: Long,
      at: String, durationMs: Long = 0L)

  private val queue = new ConcurrentLinkedQueue[Beat]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    queue.add(Beat(e.progress.id.toString, e.progress.batchId,
      e.progress.numInputRows, e.progress.timestamp, e.progress.batchDuration))

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** Snapshot of beats so far (oldest first). */
  def beats: Seq[Beat] = {
    val it = queue.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Beat]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }

  /** True if any beat arrived in the last `staleAfterMs` — the
    * monitor's is-the-worker-alive check. */
  def alive(nowMs: Long, staleAfterMs: Long): Boolean =
    beats.lastOption.exists(b =>
      nowMs - java.time.Instant.parse(b.at).toEpochMilli <= staleAfterMs)
}
