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

  /** Phase decomposition of the per-micro-batch floor: capture the FULL
    * progress durationMs map (latestOffset / getBatch / queryPlanning /
    * walCommit / addBatch / commitOffsets / triggerExecution) per batch
    * and print per-phase means, under each candidate conf set. Run with
    * `sbt "Test/runMain graft.tools.LatExp decompose"`. */
  def decompose(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val nBatches = 30
    val src = tmp("graft_latdec_src_")
    graft.Tables.events(s, d)
      .orderBy(col("ts")).limit(20 * nBatches)
      .repartition(nBatches)
      .write.mode("overwrite").parquet(src)

    def tmpIn(root: String, p: String): String =
      Files.createTempDirectory(java.nio.file.Paths.get(root), p).toString

    def run(tag: String, confs: Map[String, String],
        dirRoot: String = "/tmp", srcDir: String = src): Unit = {
      val saved = confs.keys.map(k => k -> scala.util.Try(s.conf.get(k)).toOption).toMap
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      val phases = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, Long]]()
      val done = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val lst = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
          import scala.jdk.CollectionConverters._
          phases.add(e.progress.durationMs.asScala.map { case (k, v) => k -> v.longValue }.toMap)
        }
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
          done.add(e.runId.toString); ()
        }
      }
      s.streams.addListener(lst)
      try {
        val sink = tmpIn(dirRoot, "graft_latdec_sink_")
        val q = s.readStream.schema(graft.Tables.eventsSchema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", tmpIn(dirRoot, "graft_latdec_ckpt_"))
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            graft.sources.Sinks.parquetAppend(batch, sink)
            val last5 = batch.orderBy(col("ts").desc).limit(5)
              .collect().map(_.getAs[Double]("value")).reverse
            if (last5.length == 5) { graft.ops.Predict.LinearPredictor.predict(last5.toSeq); () }
          }
          .start()
        q.awaitTermination()
        val deadline = System.nanoTime() + 30000L * 1000000L
        while (!done.contains(q.runId.toString) && System.nanoTime() < deadline) Thread.sleep(10)
        import scala.jdk.CollectionConverters._
        val all = phases.asScala.toSeq
        val keys = all.flatMap(_.keys).distinct.sorted
        val means = keys.map(k => f"$k=${all.map(_.getOrElse(k, 0L)).sum.toDouble / all.size}%.0f")
        println(s"$tag n=${all.size} " + means.mkString(" "))
      } finally {
        s.streams.removeListener(lst)
        saved.foreach { case (k, vOpt) =>
          vOpt match { case Some(v) => s.conf.set(k, v); case None => s.conf.unset(k) } }
      }
    }

    // same staged source mirrored onto tmpfs for the shm variants
    val srcShm = tmpIn("/dev/shm", "graft_latdec_src_")
    graft.Tables.events(s, d)
      .orderBy(col("ts")).limit(20 * nBatches)
      .repartition(nBatches)
      .write.mode("overwrite").parquet(srcShm)

    run("baseline", Map.empty)
    run("aqe-off", Map("spark.sql.adaptive.enabled" -> "false"))
    run("shm-dirs", Map.empty, dirRoot = "/dev/shm", srcDir = srcShm)
    run("shm+aqe-off", Map("spark.sql.adaptive.enabled" -> "false"),
      dirRoot = "/dev/shm", srcDir = srcShm)
    run("shm+all", Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "1",
      "spark.sql.streaming.fileSource.log.compactInterval" -> "1000"),
      dirRoot = "/dev/shm", srcDir = srcShm)
    run("shm+all+sched", Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "1",
      "spark.sql.streaming.fileSource.log.compactInterval" -> "1000",
      "spark.locality.wait" -> "0ms",
      "spark.sql.parquet.compression.codec" -> "uncompressed",
      "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version" -> "2",
      "spark.hadoop.parquet.summary.metadata.level" -> "NONE"),
      dirRoot = "/dev/shm", srcDir = srcShm)
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("latexp")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.contains("decompose")) { decompose(s, d); s.stop(); return }

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
