package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** One micro-batch's driver-side metrics, captured off the progress
  * event: rows ingested and trigger latency — the analog of the
  * reference's per-batch latency prints and running stats dict
  * (`stream_consumer.py:48,77-78,108-111`, `batch_processor.py:37-43`).
  * Also carries Spark's own per-phase trigger breakdown (durationMs),
  * so the micro-batch FLOOR decomposition (SCALING.md) is a measured
  * artifact per batch, not a one-off experiment: `latest_offset_ms` +
  * `get_batch_ms` (source), `plan_ms` (incremental planning),
  * `wal_commit_ms` + `commit_offsets_ms` (offset/commit logs),
  * `add_batch_ms` (the actual work — sink + any user foreachBatch). */
case class BatchMetric(run_id: String, batch_id: Long, input_rows: Long,
    duration_ms: Long, latest_offset_ms: Long = 0L, get_batch_ms: Long = 0L,
    plan_ms: Long = 0L, wal_commit_ms: Long = 0L, commit_offsets_ms: Long = 0L,
    add_batch_ms: Long = 0L)

/** T7 — cross-batch driver metrics via [[StreamingQueryListener]]
  * (SURVEY §2.9): the listener rides the session's listener bus, so it
  * observes EVERY micro-batch of every query it is attached to with zero
  * cost inside the streaming plan itself. Thread-safe buffer; events for
  * one run arrive in order, and the terminated event arrives after the
  * last progress event, so [[awaitTerminated]] doubles as a completeness
  * barrier for that run's metrics. */
final class GraftQueryListener(echo: Boolean = false,
    echoSink: String => Unit = Console.println) extends StreamingQueryListener {
  private val buf = new ConcurrentLinkedQueue[BatchMetric]()
  private val done = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    def ph(k: String): Long =
      Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)
    val m = BatchMetric(p.runId.toString, p.batchId, p.numInputRows,
      ph("triggerExecution"), ph("latestOffset"), ph("getBatch"),
      ph("queryPlanning"), ph("walCommit"), ph("commitOffsets"),
      ph("addBatch"))
    buf.add(m)
    // S6 — the reference's stdout metrics sink: one latency line per
    // micro-batch (stream_consumer.py:79,108-111)
    if (echo)
      echoSink(s"[graft-metrics] batch=${m.batch_id} rows=${m.input_rows} " +
        s"latency_ms=${m.duration_ms}")
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    done.add(e.runId.toString)
    ()
  }

  /** Block until the terminated event for `runId` has been dispatched —
    * listener events are async relative to `query.awaitTermination()`. */
  def awaitTerminated(runId: String, timeoutMs: Long = 30000): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!done.contains(runId) && System.nanoTime() < deadline) Thread.sleep(10)
    done.contains(runId)
  }

  def collected: Seq[BatchMetric] = {
    val it = buf.iterator()
    val out = Seq.newBuilder[BatchMetric]
    while (it.hasNext) out += it.next()
    out.result()
  }

  def metricsDf(s: SparkSession, runId: String): DataFrame = {
    import s.implicits._
    collected.filter(_.run_id == runId).toDS().toDF()
      .select(col("batch_id"), col("input_rows"), col("duration_ms"),
        col("latest_offset_ms"), col("get_batch_ms"), col("plan_ms"),
        col("wal_commit_ms"), col("commit_offsets_ms"), col("add_batch_ms"))
      .orderBy(col("batch_id"))
  }
}

object Metrics {
  /** A6-style summary over per-batch metrics — the reference's end-of-run
    * stats dict shape (`batch_processor.py:141-145`). */
  def summarize(metrics: DataFrame): DataFrame =
    metrics.agg(
      count(lit(1)).as("n_batches"),
      sum(col("input_rows")).as("total_rows"),
      min(col("duration_ms")).as("min_ms"),
      max(col("duration_ms")).as("max_ms"),
      (sum(col("duration_ms")) / count(lit(1))).as("avg_ms"))

  /** Mean milliseconds per phase across batches — the floor
    * decomposition as one row: where a trigger's wall time goes when
    * the batch is small (offset WAL + commit log + planning are the
    * machinery; add_batch is the work). */
  def phaseMeans(metrics: DataFrame): DataFrame =
    metrics.agg(
      count(lit(1)).as("n_batches"),
      (sum(col("duration_ms")) / count(lit(1))).as("trigger_ms"),
      (sum(col("latest_offset_ms")) / count(lit(1))).as("latest_offset_ms"),
      (sum(col("get_batch_ms")) / count(lit(1))).as("get_batch_ms"),
      (sum(col("plan_ms")) / count(lit(1))).as("plan_ms"),
      (sum(col("wal_commit_ms")) / count(lit(1))).as("wal_commit_ms"),
      (sum(col("commit_offsets_ms")) / count(lit(1))).as("commit_offsets_ms"),
      (sum(col("add_batch_ms")) / count(lit(1))).as("add_batch_ms"))
}
