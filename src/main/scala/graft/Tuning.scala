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
  def withShufflePartitions[A](s: SparkSession, n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try f finally s.conf.set(key, prev)
  }
}
