package graft

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import scala.collection.mutable

/** Structured per-stage timing, mirroring the reference's logs module
  * (open_bus_siri_etl/logs.py:11–33 `debug_time`, :36–52
  * `debug_time_stats`): timestamped start/end lines gated on the DEBUG
  * config, and per-section duration/call accumulation with an optional
  * slow-call report. Sections wrap Spark ACTIONS (writes, counts) —
  * timing lazy plan construction would measure nothing.
  */
object Logs {
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private def now(): String =
    fmt.format(Instant.now().atOffset(ZoneOffset.UTC))

  private def kwargs(kv: Seq[(String, String)]): String =
    if (kv.isEmpty) ""
    else kv.map { case (k, v) => s""""$k": "$v"""" }.mkString(" ({", ", ", "})")

  /** Timed section, printed only under GRAFT_DEBUG=yes — zero overhead
    * otherwise (reference debug_time). */
  def debugTime[T](title: String, kv: (String, String)*)(body: => T): T =
    if (!Config.debug) body
    else {
      println(s"${now()} start $title${kwargs(kv)}")
      val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"${now()} ($dt%.3fs) end $title")
      r
    }

  /** Accumulator for per-section totals across a run (reference passes
    * a defaultdict; stats land in snapshot monitoring). */
  final class Stats {
    private val m = mutable.LinkedHashMap.empty[String, Double]
    def add(key: String, v: Double): Unit =
      synchronized { m(key) = m.getOrElse(key, 0.0) + v }
    def get(key: String): Double = synchronized(m.getOrElse(key, 0.0))
    def snapshot(): Map[String, Double] = synchronized(m.toMap)
  }

  /** Always-accumulating timed section; prints only when the call ran
    * longer than `logIfMoreThanSeconds` (reference debug_time_stats). */
  def debugTimeStats[T](title: String, stats: Stats,
      logIfMoreThanSeconds: Option[Double] = None,
      kv: Seq[(String, String)] = Nil)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    val dt = (System.nanoTime() - t0) / 1e9
    if (logIfMoreThanSeconds.exists(dt > _))
      println(f"${now()} $title: took $dt%.3f seconds${kwargs(kv)}")
    stats.add(s"$title-total-seconds", dt)
    stats.add(s"$title-total-calls", 1.0)
    r
  }
}
