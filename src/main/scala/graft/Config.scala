package graft

/** Environment-driven configuration, mirroring the reference's config
  * module surface (open_bus_siri_etl/config.py:1–13: `DEBUG` gate, a
  * storage rootpath from the requester's env, the `etl` root derived
  * under it, and an optional remote snapshot source). Every path has an
  * env override and a sane default, so the daemon and CLI deploy
  * without code edits:
  *
  *   GRAFT_DEBUG=yes                 debug timing logs (reference DEBUG)
  *   GRAFT_STORAGE_ROOTPATH          storage root (default /var/graft/storage)
  *   GRAFT_RAW_ROOTPATH              raw snapshots   (default <root>/raw)
  *   GRAFT_ETL_ROOTPATH              star schema     (default <root>/etl)
  *   GRAFT_CHECKPOINT_ROOTPATH       stream checkpoints (default <root>/checkpoints)
  *   GRAFT_SNAPSHOT_SOURCE_ROOTPATH  copy-snapshots source (no default)
  *   SPARK_GRAFT_CPUS                local parallelism
  *
  * `overrides` exists for tests (env is immutable from the JVM).
  */
object Config {
  @volatile private[graft] var overrides: Map[String, String] = Map.empty

  private def get(k: String): Option[String] = overrides.get(k).orElse(sys.env.get(k))

  /** reference semantics: DEBUG is on only when the var is exactly "yes". */
  def debug: Boolean = get("GRAFT_DEBUG").contains("yes")

  def storageRoot: String = get("GRAFT_STORAGE_ROOTPATH").getOrElse("/var/graft/storage")
  def rawRoot: String = get("GRAFT_RAW_ROOTPATH").getOrElse(s"$storageRoot/raw")
  def etlRoot: String = get("GRAFT_ETL_ROOTPATH").getOrElse(s"$storageRoot/etl")
  def checkpointRoot: String =
    get("GRAFT_CHECKPOINT_ROOTPATH").getOrElse(s"$storageRoot/checkpoints")

  /** Source root for `copy-snapshots` (the reference's
    * SNAPSHOT_DOWNLOAD_REMOTE_URL / public-bucket settings, as a
    * Hadoop-FS URI). No default: copying needs an explicit source. */
  def snapshotSourceRoot: Option[String] = get("GRAFT_SNAPSHOT_SOURCE_ROOTPATH")

  def cpus: Int = get("SPARK_GRAFT_CPUS").map(_.trim.toInt)
    .getOrElse(math.max(4, Runtime.getRuntime.availableProcessors()))
}
