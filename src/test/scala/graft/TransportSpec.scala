package graft

import graft.sources._

/** Transport-as-config contract (SURVEY §2.1 S1/S2): the streaming
  * pipeline names no concrete transport — [[TickTransport]] selects one
  * from session conf. The file/parquet defaults are exercised end-to-end
  * by the whole StreamingSpec suite (which passes UNCHANGED on top of
  * the trait — that is the point); here we pin the selection logic and
  * the production option shapes, which cannot be driven end-to-end in a
  * sandbox with no broker or database. */
class TransportSpec extends SparkSpec {

  test("defaults: file source and parquet sink, staging forced lazily") {
    var staged = 0
    val src = TickTransport.source(spark, { staged += 1; "/tmp/staged" }, 2)
    assert(src == FileTickSource("/tmp/staged", 2))
    assert(staged == 1, "file transport must force the staged dir")
    val sink = TickTransport.sink(spark, "/tmp/sink")
    assert(sink == ParquetTickSink("/tmp/sink"))
  }

  test("kafka source selected by conf, carrying the reference's shape") {
    spark.conf.set("graft.stream.source", "kafka")
    try {
      var staged = 0
      val src = TickTransport.source(spark, { staged += 1; "unused" })
      // the reference consumer's defaults: topic stock_ticks on
      // localhost:9092, startingOffsets latest (stream_consumer.py:89-93)
      assert(src == KafkaTickSource("localhost:9092", "stock_ticks", "latest"))
      assert(staged == 0, "kafka deployment must not pay fixture staging")
      spark.conf.set("graft.stream.kafka.bootstrap", "broker:9092")
      spark.conf.set("graft.stream.kafka.topic", "ticks")
      assert(TickTransport.source(spark, "unused") ==
        KafkaTickSource("broker:9092", "ticks", "latest"))
    } finally {
      spark.conf.unset("graft.stream.source")
      spark.conf.unset("graft.stream.kafka.bootstrap")
      spark.conf.unset("graft.stream.kafka.topic")
    }
  }

  test("jdbc sink selected by conf; unknown transports fail loudly") {
    spark.conf.set("graft.stream.sink", "jdbc")
    spark.conf.set("graft.stream.jdbc.url", "jdbc:mysql://db:3306/stock_prediction")
    spark.conf.set("graft.stream.jdbc.table", "stock_ticks_raw")
    spark.conf.set("graft.stream.jdbc.user", "u")
    spark.conf.set("graft.stream.jdbc.password", "p")
    try {
      assert(TickTransport.sink(spark, "unused") ==
        JdbcTickSink("jdbc:mysql://db:3306/stock_prediction",
          "stock_ticks_raw", "u", "p"))
      spark.conf.set("graft.stream.sink", "carrier-pigeon")
      intercept[IllegalArgumentException] {
        TickTransport.sink(spark, "unused")
      }
      spark.conf.set("graft.stream.source", "carrier-pigeon")
      intercept[IllegalArgumentException] {
        TickTransport.source(spark, "unused")
      }
    } finally {
      Seq("graft.stream.sink", "graft.stream.source", "graft.stream.jdbc.url",
        "graft.stream.jdbc.table", "graft.stream.jdbc.user",
        "graft.stream.jdbc.password").foreach(spark.conf.unset)
    }
  }

  test("file source reads the engine's event schema as a stream") {
    val staged = graft.streaming.Pipeline.prestage(spark, sf)
    val df = FileTickSource(staged).read(spark)
    assert(df.isStreaming)
    assert(df.schema == Tables.eventsSchema)
  }
}
