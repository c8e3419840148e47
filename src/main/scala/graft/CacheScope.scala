package graft

import org.apache.spark.sql.Dataset

/** Registry for persisted frames a query builder leaves alive for its
  * consumer (the returned DataFrame still references them lazily, so the
  * builder cannot unpersist before the caller materializes).
  *
  * Without a release point, every invocation of a persisting query
  * (qDedupJaccard, qDedupMinhash, qDedupComponents) pins a fresh
  * MEMORY_AND_DISK frame for the session lifetime — harmless in a
  * one-shot driver run, a genuine leak in bench loops and notebooks
  * (ADVICE r7). Harnesses call [[release]] after materializing a query's
  * result; the persisted data is dropped and any later re-collection of
  * the same frame just recomputes.
  */
object CacheScope {
  private val live = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Register a frame the builder persisted; returns it unchanged. */
  def track[T <: Dataset[_]](df: T): T = synchronized { live += df; df }

  /** Unpersist (non-blocking) everything tracked since the last release. */
  def release(): Unit = synchronized {
    live.foreach(_.unpersist())
    live.clear()
  }
}
