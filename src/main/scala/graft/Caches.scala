package graft

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Registry for persisted intermediates inside operators.
  *
  * Several operators persist a shared subtree (the LSH bucket relation,
  * a per-doc fingerprint set, an existing-dim snapshot) because the
  * returned plan consumes it from two or more branches. The operator
  * cannot unpersist before returning — the consumer has not executed
  * yet — so in a long-lived session those blocks would accumulate and
  * put every later query under GC/eviction pressure (measured: an
  * 18s wall-time on a ~1s query once the whole dedup family's caches
  * were resident, BENCH r2).
  *
  * The contract: operators persist through [[persistTracked]]; hosts
  * (Bench, Verify, the CLI, any long-lived session) call [[releaseAll]]
  * once the results of the previous operator have been materialized.
  * Unpersisting an already-unpersisted Dataset is a no-op, so iterative
  * operators may still unpersist superseded steps eagerly themselves.
  */
object Caches {
  private val tracked = mutable.ArrayBuffer.empty[Dataset[_]]
  private val releaseHooks = mutable.ArrayBuffer.empty[() => Unit]
  private val trackedReleaseHooks = mutable.ArrayBuffer.empty[() => Unit]

  /** Register a callback to run at every [[releaseAll]] — for operator
    * objects holding derived per-JVM memos (e.g. Dedup's doubled-corpus
    * shift) whose validity is tied to the same "results of the previous
    * operator are materialized" epoch as the tracked caches. Hooks are
    * permanent (registered once from an object initializer). */
  def onRelease(hook: () => Unit): Unit = synchronized { releaseHooks += hook }

  /** Like [[onRelease]], but ALSO fired by [[releaseTrackedOnly]] — for
    * memos that hold [[persistTracked]] HANDLES (e.g. Graph's shared
    * edge relation). Such a memo's validity is tied to the blocks, not
    * the epoch: once the handle is unpersisted by EITHER release path,
    * returning it would silently hand out a relation the caller
    * believes is materialized but is not (it would re-derive from
    * scratch on every consumer — exactly what a MemoAB measurement
    * must not conflate with the memo-rebuild tax). Scalar memos
    * (Dedup's doubled-corpus shift) stay on [[onRelease]]: they wrap
    * no storage and are what releaseTrackedOnly exists to preserve. */
  def onTrackedRelease(hook: () => Unit): Unit =
    synchronized { trackedReleaseHooks += hook }

  /** Persist MEMORY_AND_DISK and remember the handle for [[releaseAll]]. */
  def persistTracked[T](ds: Dataset[T]): Dataset[T] = synchronized {
    ds.persist(StorageLevel.MEMORY_AND_DISK)
    tracked += ds
    ds
  }

  /** Remember an already-persisted handle for [[releaseAll]]. */
  def register(ds: Dataset[_]): Unit = synchronized { tracked += ds }

  /** Unpersist every tracked handle and forget them. Non-blocking by
    * default (a long-lived session doesn't want to stall on block
    * removal); benchmark hosts pass `blocking = true` so each timed
    * entry starts from a deterministic storage state — lingering
    * async-freed blocks otherwise make an entry's memory pressure
    * depend on which query ran before it (the order-dependence the
    * fwd/fwd/rev protocol exists to detect). */
  def releaseAll(blocking: Boolean = false): Unit = synchronized {
    tracked.foreach { ds =>
      try ds.unpersist(blocking) catch { case _: Throwable => () }
    }
    tracked.clear()
    (releaseHooks ++ trackedReleaseHooks).foreach { h =>
      try h() catch { case _: Throwable => () }
    }
  }

  /** Unpersist tracked handles WITHOUT firing the epoch hooks — i.e.
    * derived per-JVM SCALAR memos (Dedup's doubled-corpus shift)
    * survive. Memos registered via [[onTrackedRelease]] (those holding
    * persistTracked handles, e.g. Graph's shared edges) ARE cleared:
    * their cached blocks die here, so keeping the handle would return
    * an unpersisted relation that silently re-derives per consumer.
    * MEASUREMENT-ONLY (tools/MemoAB's A/B isolating the memo-rebuild
    * tax from a flagged query's wall time); every production host
    * keeps calling [[releaseAll]], whose hook firing is the
    * correctness-of-caching epoch discipline. */
  private[graft] def releaseTrackedOnly(blocking: Boolean = false): Unit =
    synchronized {
      tracked.foreach { ds =>
        try ds.unpersist(blocking) catch { case _: Throwable => () }
      }
      tracked.clear()
      trackedReleaseHooks.foreach { h =>
        try h() catch { case _: Throwable => () }
      }
    }
}
