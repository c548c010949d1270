package graft

import org.apache.spark.sql.SparkSession

/** Scoped execution-tuning helpers. */
object Tuning {

  /** Root for EPHEMERAL per-run scratch (streaming checkpoints, staged
    * replay sources, bounded-drain sinks): tmpfs when the host offers it,
    * else the JVM temp dir. The per-micro-batch floor decomposition
    * (SCALING.md stream addendum; `LatExp decompose`) shows every
    * checkpoint-log phase and the per-batch sink append paying the
    * backing filesystem — RAM-backed dirs cut the measured solo-drain
    * floor ~30% end to end. Durability is NOT lost where it matters:
    * these dirs are created fresh per run and never survive the process
    * by design (bounded AvailableNow drains over staged replays); the
    * production constructors (Kafka/JDBC, caller-provided
    * checkpointLocation) are untouched — a real deployment points its
    * checkpoints at durable cluster storage and its state at
    * local-SSD-backed RocksDB, which is exactly this trade expressed
    * with cluster primitives. */
  val fastTmpRoot: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) shm
    else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
  }

  /** Dirs created here are deleted by a JVM shutdown hook, making the
    * "never survive the process" contract above literal — without it a
    * long-lived host accumulates per-run scratch under /dev/shm (739
    * stale dirs observed after a day of bench runs). Deletion is
    * best-effort: a dir busy at exit is skipped, never an error. */
  private val createdTmpDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      createdTmpDirs.forEach { root =>
        try {
          import java.nio.file._
          Files.walk(root).sorted(java.util.Comparator.reverseOrder[Path]())
            .forEach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
        } catch { case _: Throwable => () }
      }
    }, "graft-tmp-cleanup"))
  }

  def fastTmpDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(fastTmpRoot, prefix)
    createdTmpDirs.add(p)
    p
  }

  /** Like [[fastTmpDir]] but on the DISK-backed JVM temp dir — for
    * staged table copies (jsonl/partitioned/evolved events) too large
    * for tmpfs. Registered with the same exit cleanup: at gen1000x one
    * JSONL events copy is ~10 GB, and without the hook every bench JVM
    * leaks its copies until the host disk fills (observed at 95%). */
  def diskTmpDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    createdTmpDirs.add(p)
    p
  }

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

  def withShufflePartitions[A](s: SparkSession, n: Int)(f: => A): A =
    withConf(s, "spark.sql.shuffle.partitions", n.toString)(f)

  /** Run `f` with one session conf key overridden, restoring (or
    * unsetting) the previous value after, under the same scope lock.
    * The query consuming the override must EXECUTE inside the scope
    * (eager actions like localCheckpoint), not merely be planned there:
    * execution-time confs (e.g. the ObjectHashAggregate fallback
    * threshold) are read when the stage runs. */
  def withConf[A](s: SparkSession, key: String, value: String)(f: => A): A = {
    scopeLock.lock()
    try {
      val prev = s.conf.getOption(key)
      s.conf.set(key, value)
      try f finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    } finally scopeLock.unlock()
  }
}
