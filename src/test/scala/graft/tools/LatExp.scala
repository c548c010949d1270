package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Reproduces SCALING.md's round-5 stream-panel attribution
  * ("Per-micro-batch latency vs BASELINE's stream panel"):
  *
  *   1. an ISOLATION sweep — the same solo drain with a no-op batch
  *      body, predict only, append only, and both — attributing the
  *      per-micro-batch floor to machinery vs per-batch work;
  *   2. a ROWS-PER-BATCH sweep over `Pipeline.streamLatencyProbe`
  *      (20 → 5 000 rows/trigger) showing per-batch latency is flat
  *      in batch size, i.e. the floor is a per-trigger constant and
  *      throughput comes from rows-per-trigger.
  *
  * A `main` in test scope: run with
  * `sbt "Test/runMain graft.tools.LatExp"`. Not part of `sbt test` —
  * it is a measurement harness, not an assertion.
  */
object LatExp {
  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("latexp")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def summarize(tag: String, df: DataFrame): Unit = {
      val rows = df.select("duration_ms").collect().map(_.getLong(0)).sorted
      val n = rows.length
      println(f"$tag%-22s n=$n min=${rows.head} p50=${rows(n / 2)} mean=${rows.sum.toDouble / n}%.1f max=${rows.last}")
    }

    // ---- 1. isolation sweep (30 batches of ~20 rows, AQE off so the
    //         tiny per-batch jobs don't pay re-optimization) ----
    val nBatches = 30
    val src = tmp("graft_latexp_src_")
    graft.Tables.events(s, d)
      .orderBy(col("ts")).limit(20 * nBatches)
      .repartition(nBatches)
      .write.mode("overwrite").parquet(src)

    def probe(tag: String)(body: DataFrame => Unit): Unit = {
      val lst = new graft.streaming.GraftQueryListener()
      s.streams.addListener(lst)
      try {
        val runId = {
          val q = s.readStream.schema(graft.Tables.eventsSchema)
            .option("maxFilesPerTrigger", "1").parquet(src)
            .select(col("event_id"), col("ts"), col("event_type"), col("value"))
            .writeStream.outputMode("append")
            .option("checkpointLocation", tmp("graft_latexp_ckpt_"))
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (batch: DataFrame, _: Long) => body(batch) }
            .start()
          q.awaitTermination()
          q.runId.toString
        }
        require(lst.awaitTerminated(runId), "no terminated event")
        summarize(tag, lst.metricsDf(s, runId))
      } finally s.streams.removeListener(lst)
    }

    def predictStep(b: DataFrame): Unit = {
      val last5 = b.orderBy(col("ts").desc).limit(5)
        .collect().map(_.getAs[Double]("value")).reverse
      if (last5.length == 5) { graft.ops.Predict.LinearPredictor.predict(last5.toSeq); () }
    }

    s.conf.set("spark.sql.adaptive.enabled", "false")
    probe("noop")(_ => ())
    probe("collect-only")(predictStep)
    val sink1 = tmp("graft_latexp_sink_")
    probe("append-only")(b => graft.sources.Sinks.parquetAppend(b, sink1))
    val sink2 = tmp("graft_latexp_sink_")
    probe("append+collect") { b =>
      graft.sources.Sinks.parquetAppend(b, sink2); predictStep(b)
    }
    s.conf.set("spark.sql.adaptive.enabled", "true")

    // ---- 2. rows-per-batch sweep over the shipped probe ----
    summarize("rows=20", graft.streaming.Pipeline.streamLatencyProbe(s, d, 20, 30))
    summarize("rows=200", graft.streaming.Pipeline.streamLatencyProbe(s, d, 200, 30))
    summarize("rows=2000", graft.streaming.Pipeline.streamLatencyProbe(s, d, 2000, 30))
    summarize("rows=5000", graft.streaming.Pipeline.streamLatencyProbe(s, d, 5000, 20))

    s.stop()
  }
}
