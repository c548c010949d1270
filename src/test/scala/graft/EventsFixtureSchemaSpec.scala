package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FIXTURE-SCHEMA GUARD (round-6 postmortem): the driver regenerated
  * `/root/testdata` with `events.ts` stored as parquet `timestamp[us]`
  * where earlier rounds stored `timestamp[ns]`, and the then-hardcoded
  * nanos loader took 86 queries and 78 tests down at once. This suite is
  * the tripwire: it reads the fixture's ACTUAL schema and asserts the
  * loader normalizes it, so the next driver-side regeneration flips ONE
  * named test with a message naming the new dtype — instead of cascading
  * failures through every events-fed suite.
  *
  * Both historical encodings are covered: the live fixture (whatever it
  * is today) and a synthetic raw-nanos long fixture mirroring the
  * round-≤5 `timestamp[ns]` files as Spark reads them under
  * `nanosAsLong=true`.
  */
class EventsFixtureSchemaSpec extends SparkSpec {

  test("live fixture: Tables.events normalizes the driver's current ts encoding") {
    // what's physically on disk, read with the loader's own conf
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawDt = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    val accepted = Set[DataType](LongType, TimestampNTZType, TimestampType)
    assert(accepted.contains(rawDt),
      s"driver regenerated events.parquet with ts dtype $rawDt, which " +
        "Tables.normalizeTs does not handle — extend the dtype branch in " +
        "Tables.scala (this is the round-6 failure mode; see FIXTURES.md §B)")

    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must normalize ts to TimestampType, got ${df.schema("ts").dataType}")
    // sanity: values are in the documented corpus window (FIXTURES.md §B:
    // 2024-01-01..01-30), i.e. the normalization preserved magnitudes
    // instead of mis-scaling by 1000x
    val Row(mn: Long, mx: Long) =
      df.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val lo = java.time.Instant.parse("2023-12-31T00:00:00Z").toEpochMilli * 1000L
    val hi = java.time.Instant.parse("2025-01-01T00:00:00Z").toEpochMilli * 1000L
    assert(mn >= lo && mx <= hi,
      s"normalized ts range [$mn, $mx] µs is outside the documented corpus " +
        "window — the dtype branch mis-scaled the values")
  }

  test("legacy encoding: raw-nanos long fixture still loads (round-≤5 files)") {
    // Synthesize what nanosAsLong=true yields for a timestamp[ns] file: a
    // LongType ts column holding epoch nanos. Write it as a real
    // events.parquet in a temp dir and run the full loader against it.
    val dir = Files.createTempDirectory("graft_nsfix_").toString
    val tsUs = java.time.Instant.parse("2024-01-15T12:00:00Z").toEpochMilli * 1000L
    val legacySchema = StructType(Tables.eventsSchema.map {
      case f if f.name == "ts" => f.copy(dataType = LongType)
      case f => f
    })
    val rows = java.util.Arrays.asList(
      Row(1L, tsUs * 1000L, 7L, "view", 1.5, """{"k": 1}"""),
      Row(2L, tsUs * 1000L + 999L, 7L, "click", 2.5, """{"k": 2}"""))
    spark.createDataFrame(rows, legacySchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.orderBy("event_id").select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    // nanos truncate (not round) to micros — identical to DuckDB's side
    assert(got == Seq(tsUs, tsUs), s"nanos path mis-truncated: $got")
  }

  test("unsupported encoding fails loudly, naming the dtype") {
    val dir = Files.createTempDirectory("graft_badfix_").toString
    val badSchema = StructType(Tables.eventsSchema.map {
      case f if f.name == "ts" => f.copy(dataType = StringType)
      case f => f
    })
    val rows = java.util.Arrays.asList(
      Row(1L, "2024-01-15T12:00:00Z", 7L, "view", 1.5, """{"k": 1}"""))
    spark.createDataFrame(rows, badSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("StringType"))
    assert(e.getMessage.contains("normalizeTs"))
  }
}
