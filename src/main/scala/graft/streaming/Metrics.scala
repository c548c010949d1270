package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** One micro-batch's driver-side metrics, captured off the progress
  * event: rows ingested and trigger latency — the analog of the
  * reference's per-batch latency prints and running stats dict
  * (`stream_consumer.py:48,77-78,108-111`, `batch_processor.py:37-43`). */
case class BatchMetric(run_id: String, batch_id: Long, input_rows: Long,
    duration_ms: Long)

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
    val m = BatchMetric(p.runId.toString, p.batchId, p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
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
      .select(col("batch_id"), col("input_rows"), col("duration_ms"))
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
}
