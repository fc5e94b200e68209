package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/**
 * Registry for intermediate relations an operator persists because they fan
 * out into several downstream branches (LSH band tables, block summaries,
 * propagation labels). The persist must outlive the operator call — the
 * returned plan still references it lazily — so the operator itself can
 * never unpersist safely. Instead it `track`s the relation here and the
 * HARNESS (Verify/Bench per query, or any library caller) calls
 * [[releaseAll]] once the plans built from it have been materialized.
 * Without a release, a long shared session accumulates MEMORY_AND_DISK
 * entries bounded only by plan-identity dedupe.
 */
object CacheScope {

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Persist `ds` at `level` and register it for the next [[releaseAll]]. */
  def track[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] =
    synchronized {
      val p = ds.persist(level)
      tracked += p
      p
    }

  /** Unpersist every tracked relation (non-blocking) and clear the registry.
   * Safe to call while nothing is tracked; double-unpersist is a no-op. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }

  /** Number of currently tracked relations (test introspection). */
  def size: Int = synchronized(tracked.size)
}
