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

  /** Exact INTEGER moment buffer: (n, Σcents, Σcents²) — the decimal
    * accumulation of the zscore technique carried as plain longs, so
    * the per-row cost is three integer adds (a BigDecimal-buffered
    * first cut cost ~5 allocations per row and read 36× slower at the
    * 10M-row scale point: 13.9 s vs 0.38 s). Prices are an exact
    * 2-dp grain, so cents = round(v·100) is unambiguous; overflow is
    * LOUD, not silent — addExact throws once Σcents² nears 2⁶³
    * (~3·10⁹ rows of max-price ticks in one final buffer), at which
    * point the untyped DECIMAL(38) formulation is the right tool. */
  case class Moments(n: Long, sxCents: Long, sxxCents2: Long)

  /** Per-series summary the typed pipeline emits. */
  case class TickStats(event_type: String, n: Long, mean: Double, variance: Double)

  /** Welford-free exact variance: integer moments, the final
    * mean/variance algebra one fixed-association double expression —
    * identical on both engines, no tolerance. merge() is plain
    * addition (associative and commutative, so Spark's partial
    * aggregation applies untouched); the cents→double conversion
    * happens ONCE per group in finish(), through an exact
    * scaled-decimal rounding. */
  object MomentsAgg extends Aggregator[Tick, Moments, (Long, Double, Double)] {
    override def zero: Moments = Moments(0L, 0L, 0L)

    override def reduce(b: Moments, t: Tick): Moments = {
      val c = Math.round(t.value * 100.0)
      Moments(b.n + 1, Math.addExact(b.sxCents, c),
        Math.addExact(b.sxxCents2, Math.multiplyExact(c, c)))
    }

    override def merge(a: Moments, b: Moments): Moments =
      Moments(a.n + b.n, Math.addExact(a.sxCents, b.sxCents),
        Math.addExact(a.sxxCents2, b.sxxCents2))

    override def finish(m: Moments): (Long, Double, Double) = {
      // one correctly-rounded decimal→double conversion per sum (the
      // exact value of Σv / Σv² at scale 2 / 4), matching the untyped
      // decimal path bit for bit
      val sx = java.math.BigDecimal.valueOf(m.sxCents, 2).doubleValue
      val sxx = java.math.BigDecimal.valueOf(m.sxxCents2, 4).doubleValue
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
