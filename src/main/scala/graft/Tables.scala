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

  /** LOGICAL-PLAN memo for the table loaders. `spark.read.parquet` is not
    * free on the driver: every call re-lists the path and re-reads parquet
    * footers for the schema (~40-50 ms measured via tools/Profile at
    * sf0.1), and the 217-query bench calls the loaders 300+ times — ~15 s
    * of pure duplicated driver work per iteration. A DataFrame is an
    * immutable logical plan, so handing the SAME plan object to every
    * query is semantically identical to re-reading; each query still
    * plans/prunes/executes its own tree on top. Nothing row-level is
    * cached — this is driver metadata reuse, which a long-lived production
    * session gets for free from its catalog, and is scale-neutral (at
    * 100 TB the listing is *more* expensive, so reusing it matters more).
    *
    * Keying: (sessionUUID, path, dir-mtime). The session key keeps plans
    * from leaking across the many short-lived test sessions (a Dataset is
    * bound to the session that built it); the mtime key makes an
    * overwrite-in-place of a generated fixture invalidate the entry (the
    * file-listing snapshot inside the plan would otherwise go stale).
    * Bounded LRU so dead sessions' entries age out. */
  private val planCache =
    new java.util.LinkedHashMap[(String, String, Long), DataFrame](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, Long), DataFrame]): Boolean =
        size > 64
    }

  /** Per-session tag via the session-scoped SQLConf (public API; each
    * SparkSession carries its own conf even under a shared context).
    * Used to key session-bound cached DataFrames — a Dataset handed
    * across sessions (or out of a stopped one) is a runtime error. */
  private[graft] def sessionTag(spark: SparkSession): String =
    spark.conf.getOption("graft.session.tag").getOrElse {
      val t = java.util.UUID.randomUUID().toString
      spark.conf.set("graft.session.tag", t); t
    }

  private def cached(spark: SparkSession, path: String, variant: String = "")(
      build: => DataFrame): DataFrame = {
    val mtime =
      try java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(path)).toMillis
      catch { case scala.util.control.NonFatal(_) => -1L }
    val tag = sessionTag(spark)
    val key = (tag, path + variant, mtime)
    planCache.synchronized {
      val hit = planCache.get(key)
      if (hit != null) hit
      else { val df = build; planCache.put(key, df); df }
    }
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val p = s"$sfDir/$name.parquet"
    cached(spark, p)(spark.read.parquet(p))
  }

  /** Memoized table row count per (path, mtime) — size-regime gates
    * (artifact materialization, exact-vs-blocked routing) and samplers
    * consult the corpus size repeatedly; the count itself is one
    * metadata-cheap scan and, unlike a DataFrame, is not bound to the
    * session that computed it. */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Long]()

  def rowCount(s: SparkSession, d: String, name: String): Long = {
    val p = s"$d/$name.parquet"
    val mtime =
      try java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(p)).toMillis
      catch { case scala.util.control.NonFatal(_) => -1L }
    countCache.computeIfAbsent((p, mtime),
      _ => java.lang.Long.valueOf(load(s, d, name).count())).longValue()
  }

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
  def events(s: SparkSession, d: String): DataFrame =
    cached(s, s"$d/events.parquet", variant = "#normalized") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$d/events.parquet")
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
