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
  /** events.ts loader, SCHEMA-ADAPTIVE over the physical encodings a sane
    * fixture generator may emit. The tick timestamp is semantically just a
    * timestamp column (reference `stream_consumer.py:82-87` declares
    * TimestampType); the engine must not care how parquet stores it:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's reader rejects it by default;
    *    with the legacy conf it arrives as a raw nanos LongType → truncate
    *    nanos → micros, exactly like DuckDB does on its side of the oracle
    *    compare, so both engines see identical microsecond values.
    *  - parquet timestamp[us] (isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ → cast to TimestampType. The session timezone is
    *    pinned UTC everywhere (Verify/Bench/specs), so the cast is
    *    value-stable and downstream window/date_trunc code and DuckDB
    *    hashes are unchanged.
    *  - parquet timestamp[us/ms] adjusted to UTC: already TimestampType.
    *
    * Anything else (string, int32 days, …) fails loudly with the observed
    * dtype rather than producing silently-wrong timestamps. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    normalizeTs(raw)
  }

  /** ts-dtype branch shared by the batch loader and the stream prestage. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>            // raw nanos (legacy TIMESTAMP(NANOS) read)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>    // timestamp[us], not UTC-adjusted
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df    // already what downstream expects
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported dtype $other — expected parquet " +
          "TIMESTAMP(NANOS) (read as raw long), timestamp[us] (NTZ), or a " +
          "UTC-adjusted timestamp; extend Tables.normalizeTs for new encodings")
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

  /** NORMALIZED events schema — what every consumer downstream of
    * [[events]] / the stream prestage sees, independent of the fixture's
    * physical ts encoding. Streaming file sources require an explicit
    * schema; the prestage writes its staged files with ts already
    * normalized to TimestampType ([[normalizeTs]] at write time), so
    * stream reads declare this schema directly and need no per-stream
    * fix-up. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
}
