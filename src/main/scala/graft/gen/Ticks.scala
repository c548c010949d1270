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
  */
object Ticks {

  /** n ticks per symbol, 100 ms cadence from a fixed epoch, price walk
    * starting at basePrice (reference start 180.0, `producer.py:13`). */
  def generate(s: SparkSession, symbols: Seq[String] = Seq("AAPL"),
      n: Long = 1000L, basePrice: Double = 180.0): DataFrame = {
    val syms = s.createDataFrame(symbols.map(Tuple1(_))).toDF("symbol")
    val base = s.range(n).toDF("i").crossJoin(broadcast(syms))
    // U(0,1) as a pure function of (symbol, i): top 53 bits of xxhash64
    val u = (shiftrightunsigned(xxhash64(col("symbol"), col("i")), 11)
      .cast(DoubleType) / lit((1L << 53).toDouble))
    val step = log(lit(1.0) + (u - lit(0.5)) * lit(0.005))
    val w = Window.partitionBy(col("symbol")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, 0)
    base
      .withColumn("logwalk", sum(step).over(w))
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
