package graft.core

import org.apache.spark.sql.Dataset

/**
 * Tracked persist() for library operators that need a cost barrier
 * (e.g. [[graft.ext.Dedup]] shingle/signature/simhash frames feed several
 * downstream joins — without a barrier the expensive scan recomputes per
 * consumer).
 *
 * A bare `persist()` inside a library function leaks: the caller gets the
 * cached frame but no release handle, so long-lived sessions composing
 * these operators accrete cached partitions. Operators persist through
 * [[persistTracked]] instead, and callers release everything graft cached
 * with one [[releaseAll]] once results are materialized (the Verify/Bench
 * harnesses use the broader `spark.catalog.clearCache()` since they own
 * the whole session).
 */
object CacheRegistry {

  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()
  private val broadcasts =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.broadcast.Broadcast[_]]()

  /** Persist `ds` and register it for a later [[releaseAll]]. */
  def persistTracked[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    frames.add(ds)
    ds
  }

  /** Register a driver-created broadcast (e.g. a Bloom filter sketch)
    * for a later [[releaseAll]] — the broadcast twin of
    * [[persistTracked]]: a bare `sc.broadcast` inside a library
    * operator has no release handle either. */
  def broadcastTracked[T](b: org.apache.spark.broadcast.Broadcast[T])
      : org.apache.spark.broadcast.Broadcast[T] = {
    broadcasts.add(b)
    b
  }

  /** Unpersist every frame persisted through [[persistTracked]] and
    * destroy every broadcast registered through [[broadcastTracked]].
    * Call only once results are fully materialized — a destroyed
    * broadcast cannot serve a late task. */
  def releaseAll(): Unit = {
    var d = frames.poll()
    while (d != null) {
      d.unpersist(blocking = false)
      d = frames.poll()
    }
    var b = broadcasts.poll()
    while (b != null) {
      b.destroy()
      b = broadcasts.poll()
    }
  }

  /** Number of currently-tracked cached frames (for tests/diagnostics). */
  def trackedCount: Int = frames.size()

  /**
   * Run `body` and release ONLY the frames/broadcasts it registered —
   * entries tracked before the call survive untouched. This is what a
   * library function that fully materializes its own work (e.g. a
   * streaming trigger) must use: a bare [[releaseAll]] inside a library
   * call would destroy caller-owned broadcasts mid-plan, which
   * hard-fails late tasks (caches merely recompute; destroyed
   * broadcasts throw).
   */
  def scoped[T](body: => T): T = {
    val priorFrames = new java.util.IdentityHashMap[Dataset[_], Unit]()
    frames.forEach(d => priorFrames.put(d, ()))
    val priorBc =
      new java.util.IdentityHashMap[org.apache.spark.broadcast.Broadcast[_], Unit]()
    broadcasts.forEach(b => priorBc.put(b, ()))
    try body
    finally {
      val fIt = frames.iterator()
      while (fIt.hasNext) {
        val d = fIt.next()
        if (!priorFrames.containsKey(d)) { d.unpersist(blocking = false); fIt.remove() }
      }
      val bIt = broadcasts.iterator()
      while (bIt.hasNext) {
        val b = bIt.next()
        if (!priorBc.containsKey(b)) { b.destroy(); bIt.remove() }
      }
    }
  }
}
