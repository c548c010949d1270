package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset surface (SURVEY §7 — `Dataset[T]` with case-class
  * Encoders where type safety helps): the same engine semantics
  * expressed through `groupByKey` + a custom
  * [[org.apache.spark.sql.expressions.Aggregator]] instead of untyped
  * Columns. The Aggregator is the USER-FACING typed cousin of the
  * engine-internal TypedImperativeAggregates (MinHash/TopK/Bloom):
  * same partial-aggregation contract (reduce per partition, merge
  * across), but written against domain types the compiler checks.
  */
object Typed {

  /** One tick, as the typed API sees it. */
  case class Tick(event_type: String, value: Double)

  /** Exact decimal moment buffer: (n, Σv, Σv²) with the sums carried
    * as BigDecimal — ORDER-INDEPENDENT accumulation (the zscore
    * technique, here inside a typed buffer), so the merge tree's shape
    * can never change a result bit. Values quantize to 2 dp on entry
    * (the fixture's price grain; squares are then exact at 4 dp). */
  case class Moments(n: Long, sx: BigDecimal, sxx: BigDecimal)

  /** Per-series summary the typed pipeline emits. */
  case class TickStats(event_type: String, n: Long, mean: Double, variance: Double)

  /** Welford-free exact variance: moments in decimal, the final
    * mean/variance algebra one fixed-association double expression —
    * identical on both engines, no tolerance. reduce() quantizes each
    * value once; merge() is plain decimal addition (associative and
    * commutative, so Spark's partial aggregation applies untouched). */
  object MomentsAgg extends Aggregator[Tick, Moments, (Long, Double, Double)] {
    override def zero: Moments = Moments(0L, BigDecimal(0), BigDecimal(0))

    override def reduce(b: Moments, t: Tick): Moments = {
      val v = BigDecimal(t.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      Moments(b.n + 1, b.sx + v, b.sxx + v * v)
    }

    override def merge(a: Moments, b: Moments): Moments =
      Moments(a.n + b.n, a.sx + b.sx, a.sxx + b.sxx)

    override def finish(m: Moments): (Long, Double, Double) = {
      val sx = m.sx.toDouble
      val sxx = m.sxx.toDouble
      val n = m.n.toDouble
      (m.n, sx / n, (sxx - sx * sx / n) / (n - 1))
    }

    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[(Long, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
  }

  /** Per-series exact moments through the fully TYPED pipeline:
    * `as[Tick]` → `groupByKey(_.event_type)` → custom Aggregator →
    * typed result. Plans as ObjectHashAggregate with partial + final
    * stages — one buffer per (series × partition) shuffles, exactly
    * like the untyped HashAggregate the Column formulation gets. */
  def tickMoments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = Tables.events(s, d)
      .select(col("event_type"), col("value"))
      .as[Tick]
    ds.groupByKey(_.event_type)
      .agg(MomentsAgg.toColumn.name("m"))
      .map { case (t, (n, mean, variance)) => TickStats(t, n, mean, variance) }
      .toDF()
      .orderBy(col("event_type"))
  }
}
