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

  /** One timed user event for the cogroup path. */
  case class UserEvent(user_id: Long, us: Long)

  /** Per-user attribution counts via typed COGROUP — the two-sided
    * per-key merge the Column API has no direct shape for: each user's
    * clicks and purchases arrive as two iterators and reduce in one
    * pass (a purchase is attributed iff the user's EARLIEST click
    * strictly precedes it). Task memory is one user's history (the
    * window-operator bound); the shuffle is the cogroup's two
    * co-partitioned exchanges.
    *
    * Deliberately the SAME semantics as the window-based
    * [[Behavior.attribution]] — TypedSpec pins the two derivations
    * equal, so the typed surface is checked against the relational one
    * (and both against the DuckDB oracle). (user_id, ts) is unique in
    * the fixture, so strictly-prior on the microsecond key equals the
    * window's (ts, event_id) frame. */
  def cogroupAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    def side(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id"), col("us")).as[UserEvent]
      .groupByKey(_.user_id)
    val out = side("click").cogroup(side("purchase")) { (uid, clicks, purchases) =>
      val minClick = clicks.foldLeft(Long.MaxValue)((m, c) => math.min(m, c.us))
      val ps = purchases.map(_.us).toArray
      if (ps.isEmpty) Iterator.empty
      else {
        // attributed ⇔ at least one click strictly before the purchase
        // ⇔ the earliest click strictly precedes it
        val attributed = ps.count(_ > minClick)
        Iterator.single((uid, ps.length.toLong, attributed.toLong))
      }
    }
    out.toDF("user_id", "n_purchases", "n_attributed")
      .orderBy(col("user_id"))
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
