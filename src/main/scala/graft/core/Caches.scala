package graft.core

import org.apache.spark.sql.Dataset
import java.util.concurrent.ConcurrentLinkedQueue

/** Registry for persisted relations created inside lazily-composed
  * operators (minhash signatures, capped shingle tables, sectioned
  * pipeline inputs).
  *
  * Those operators return unmaterialized DataFrames, so they cannot
  * unpersist eagerly themselves — the cache must outlive the function and
  * die after the caller's terminal action. Every internal `persist()`
  * goes through [[track]]; the harness (Verify / Bench / specs) calls
  * [[releaseAll]] once per query so cached partitions never accumulate
  * across a multi-query run. On a real cluster this is the difference
  * between a bounded storage-memory footprint and executors slowly
  * evicting each other's working set.
  */
object Caches {
  private val live = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` and register it for later release. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    val cached = ds.persist()
    live.add(cached)
    cached
  }

  /** Unpersist every tracked relation; returns how many were released. */
  def releaseAll(): Int = {
    var n = 0
    var d = live.poll()
    while (d != null) {
      try d.unpersist(blocking = false) catch { case _: Throwable => () }
      n += 1
      d = live.poll()
    }
    n
  }
}
