package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic tick generator — the reference's mock Kafka producer
  * (`producer.py:16-26`: random-walk price, uniform volume, ISO
  * timestamps, 10 ticks/s) re-expressed as a seeded, distributed,
  * reproducible Spark plan (SURVEY §2.1 S5).
  *
  * The reference mutates a global `base_price` per tick (inherently
  * serial); the same walk is expressed here as exp(cumsum(log-step)) over
  * a per-symbol window — the multiplicative walk
  * `p += (U−0.5)·0.5·p/100  ⇔  p_i = p0·Π(1 + (U_j−0.5)·0.005)` —
  * which parallelizes per symbol. Randomness is a pure function of
  * (symbol, tick index) via xxhash64, so any partitioning of the range
  * produces identical data (no per-task RNG state).
  *
  * The cumulative sum is CHUNKED, not one sort task per symbol: ticks
  * split into fixed `i`-ranges of `chunkRows`, each chunk computes its
  * local prefix sums (bounded task), chunk totals prefix-scan on the
  * tiny (symbol, chunk) table, and the offset broadcast-joins back —
  * the same hot-series fix as [[graft.ops.Chunked.frames]], here in
  * closed form because the chunk key is `i / chunkRows` (no quantile
  * pass needed on a dense range). The log-steps accumulate in DECIMAL,
  * where addition is exact and therefore associative — chunked and
  * sequential sums are equal BY CONSTRUCTION, bit for bit, at any
  * chunk size or partitioning (double addition would drift in the last
  * bits across chunk groupings). Spec-pinned: chunked == one-window
  * plan, and the generator splits a symbol across >1 chunk.
  */
object Ticks {

  /** n ticks per symbol, 100 ms cadence from a fixed epoch, price walk
    * starting at basePrice (reference start 180.0, `producer.py:13`). */
  def generate(s: SparkSession, symbols: Seq[String] = Seq("AAPL"),
      n: Long = 1000L, basePrice: Double = 180.0,
      chunkRows: Long = 262144L): DataFrame = {
    require(chunkRows >= 1, "chunkRows must be >= 1")
    val syms = s.createDataFrame(symbols.map(Tuple1(_))).toDF("symbol")
    val base = s.range(n).toDF("i").crossJoin(broadcast(syms))
    // U(0,1) as a pure function of (symbol, i): top 53 bits of xxhash64
    val u = (shiftrightunsigned(xxhash64(col("symbol"), col("i")), 11)
      .cast(DoubleType) / lit((1L << 53).toDouble))
    // decimal-routed step: the cast rounds each double step to a fixed
    // 20-decimal-place value deterministically; every sum below is then
    // EXACT, so regrouping across chunks cannot perturb any bit
    val step = log(lit(1.0) + (u - lit(0.5)) * lit(0.005))
      .cast(DecimalType(30, 20))
    val withCk = base
      .withColumn("_ck", (col("i") / lit(chunkRows)).cast(IntegerType))
      .withColumn("_step", step)
    // local prefix sums within (symbol, chunk): task size <= chunkRows
    val wIn = Window.partitionBy(col("symbol"), col("_ck")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // chunk totals are O(n / chunkRows) rows per symbol — the prefix
    // scan over them runs per symbol but over the TINY table, and the
    // result broadcast-joins back to the ticks
    val wOff = Window.partitionBy(col("symbol")).orderBy(col("_ck"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withCk.groupBy(col("symbol"), col("_ck"))
      .agg(sum(col("_step")).as("_cksum"))
      .select(col("symbol"), col("_ck"), sum(col("_cksum")).over(wOff).as("_off"))
    val zero = lit(0).cast(DecimalType(38, 20))
    withCk
      .withColumn("_cum", sum(col("_step")).over(wIn))
      .join(broadcast(offsets), Seq("symbol", "_ck"))
      .withColumn("logwalk",
        (coalesce(col("_off"), zero) + col("_cum")).cast(DoubleType))
      .select(
        col("symbol"),
        timestamp_micros(lit(1704067200000000L) + col("i") * 100000L).as("timestamp"),
        round(lit(basePrice) * exp(col("logwalk")), 2).as("price"),
        (shiftrightunsigned(xxhash64(col("i"), col("symbol")), 12) % 400001L
          + 100000L).as("volume"))
  }

  /** Ticks serialized as the producer's JSON wire format
    * (`producer.py:9`: one JSON object per Kafka message). */
  def asJson(ticks: DataFrame): DataFrame =
    ticks.select(to_json(struct(col("symbol"), col("timestamp"), col("price"),
      col("volume"))).as("value"))
}
