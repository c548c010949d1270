package graft

import org.apache.spark.sql.SparkSession

/** Scoped execution-tuning helpers. */
object Tuning {

  /** Run `f` with `spark.sql.shuffle.partitions` set to n, restoring the
    * previous value after. For bounded drains and small iterative steps
    * whose per-partition fixed costs (state-store commits, task
    * dispatch) dominate at the session default. Results of the shapes
    * used here are partition-count invariant (associative aggregates,
    * keyed state, deterministic ORDER BY), so a concurrently planned
    * query sees only a different parallelism, never different values. */
  /** Scopes are serialized under a REENTRANT lock: session conf is
    * shared mutable state, so without it two concurrent scopes could
    * restore a stale value or leak the override to unrelated queries.
    * Reentrancy keeps nested scopes (e.g. Dedup.components inside a
    * scoped drain) correct — inner save/restore is LIFO on one thread.
    * The cost is that concurrent scoped sections run one at a time;
    * every scope here is a bounded drain or a small iterative round, so
    * serializing them is cheaper than cloning sessions per scope. */
  private val scopeLock = new java.util.concurrent.locks.ReentrantLock()

  def withShufflePartitions[A](s: SparkSession, n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    scopeLock.lock()
    try {
      val prev = s.conf.get(key)
      s.conf.set(key, n.toString)
      try f finally s.conf.set(key, prev)
    } finally scopeLock.unlock()
  }
}
