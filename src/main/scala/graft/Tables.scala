package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders over the driver corpus (TESTDATA.md).
  *
  * Stand-in for the reference's two sources: the Kafka tick stream
  * (reference `stream_consumer.py:89-93`) and the MySQL raw-tick table
  * (reference `batch_processor.py:72-79`). In the sandbox both are parquet;
  * the schemas are fixed (FIXTURES.md §B) so scans stay prunable —
  * column projection and predicate pushdown reach the parquet reader.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * by default. Read it as a raw long (legacy conf, runtime-settable) and
    * truncate nanos → micros exactly like DuckDB does on its side of the
    * oracle compare, so both engines see identical microsecond values. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Tick schema, identical to the reference's declared stream schema
    * (`stream_consumer.py:82-87`). */
  val tickSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("timestamp", TimestampType),
    StructField("price", DoubleType),
    StructField("volume", LongType)))

  /** Events schema as stored (FIXTURES.md §B) — needed by streaming file
    * sources, which require an explicit schema. ts is declared LongType
    * (raw nanos, see [[events]]); apply [[eventsTsFix]] after reading. */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Nanos-long → microsecond timestamp, identical to [[events]]. */
  def eventsTsFix(df: DataFrame): DataFrame =
    df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
}
