package graft

import graft.ops.Market
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-bar analytics: hand-computed truths on collected fixtures,
  * the chunked-prefix drawdown against the plain-window formulation,
  * and the oracle preconditions the hash parity rests on. */
class MarketSpec extends SparkSpec {

  test("fixture precondition: (event_type, ts) unique — arg_min/max bars are deterministic") {
    val e = Tables.events(spark, sf)
    assert(e.count() == e.select("event_type", "ts").distinct().count())
  }

  test("OHLC bar matches a hand-computed bar for one (symbol, day)") {
    val bars = q("q_market_ohlc").collect()
    assert(bars.nonEmpty)
    val b = bars.head
    val sym = b.getString(0)
    val day = b.getString(1)
    val trades = Tables.events(spark, sf)
      .filter(col("event_type") === sym &&
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd") === day)
      .select(col("ts"), col("value"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getDouble(1)))
      .sortBy(_._1)
    assert(b.getDouble(2) == trades.head._2, "open = first trade by time")
    assert(b.getDouble(3) == trades.map(_._2).max, "high")
    assert(b.getDouble(4) == trades.map(_._2).min, "low")
    assert(b.getDouble(5) == trades.last._2, "close = last trade by time")
    assert(b.getLong(6) == trades.length, "n_trades")
  }

  test("VWAP for one (symbol, day) equals the exact BigDecimal recomputation") {
    val rows = q("q_market_vwap").collect()
    assert(rows.forall(r => !r.isNullAt(3)))
    val v = rows.head
    val trades = Tables.events(spark, sf)
      .filter(col("event_type") === v.getString(0) &&
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd") === v.getString(1))
      .select(col("value"), get_json_object(col("props"), "$.k").cast("long"))
      .collect().map(r => (BigDecimal(r.getDouble(0)).setScale(2, BigDecimal.RoundingMode.HALF_UP), r.getLong(1)))
    val num = trades.map { case (p, k) => p * BigDecimal(k) }.sum
    val den = trades.map(_._2).sum
    assert(v.getLong(2) == den, "size_sum")
    assert(v.getDouble(3) == num.toDouble / den.toDouble, "vwap bit-exact")
  }

  test("chunked drawdown == plain-window running max on a skewed fixture, and the hot series splits") {
    import spark.implicits._
    val rows = (0 until 3000).map { i =>
      (i.toLong, "hot", new java.sql.Timestamp(1700000000000L + i * 1000L),
        math.sin(i * 0.31) * 40 + 100)
    } ++ (0 until 50).map { i =>
      (10000L + i, "cold", new java.sql.Timestamp(1700000000000L + i * 1000L),
        i + 1.0)
    }
    val df = rows.toDF("event_id", "event_type", "ts", "value")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val plain = df.select(col("event_id"), max(col("value")).over(w).as("rm"),
        (col("value") / max(col("value")).over(w) - lit(1.0)).as("dd"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val chunked = Market.drawdownOf(df, "fixture:market-skew-3000x50")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(chunked == plain, "chunked prefix-max must be bit-identical to the plain window")
    // scale claim: the hot series actually crosses chunk boundaries
    val (_, mapping) = graft.ops.Chunked.chunkPlan(df, "event_type", "ts",
      minRows = 256L, nBoundaries = 16)
    assert(mapping.filter(col("event_type") === "hot")
      .select("_fc").distinct().count() > 1)
  }

  test("drawdown invariants on real events: dd <= 0, run_max non-decreasing per series") {
    val dd = q("q_market_drawdown")
    assert(dd.filter(col("drawdown") > 0).count() == 0)
    val e = Tables.events(spark, sf).select(col("event_id"), col("event_type"), col("ts"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val nonMono = dd.join(e, "event_id")
      .withColumn("prev_rm", lag(col("run_max"), 1).over(w))
      .filter(col("prev_rm").isNotNull && col("run_max") < col("prev_rm"))
    assert(nonMono.count() == 0)
  }

  test("bollinger band matches a hand-computed window, bands bracket the mid") {
    val res = q("q_market_bollinger").collect()
    assert(res.nonEmpty)
    assert(res.forall(r => r.getDouble(2) >= r.getDouble(1) && r.getDouble(3) <= r.getDouble(1)))
    // recompute one row's band from the raw trailing-20 window
    val target = res.maxBy(_.getLong(0))
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("ts"), col("value")).collect()
    val sym = e.find(_.getLong(0) == target.getLong(0)).get.getString(1)
    val series = e.filter(_.getString(1) == sym)
      .map(r => (r.getTimestamp(2).getTime, r.getLong(0), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val idx = series.indexWhere(_._2 == target.getLong(0))
    val win = series.slice(idx - 19, idx + 1).map(_._3)
      .map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val sx = win.sum.toDouble
    val sxx = win.map(x => x * x).sum.toDouble
    val mid = sx / 20.0
    val sd = math.sqrt((sxx - sx * sx / 20.0) / 19.0)
    assert(target.getDouble(1) == mid)
    assert(target.getDouble(2) == mid + 2.0 * sd)
  }

  test("returns: one row per event with a predecessor; diff/ret hand-check") {
    val r = q("q_market_returns")
    val e = Tables.events(spark, sf)
    val nSeries = e.select("event_type").distinct().count()
    assert(r.count() == e.count() - nSeries)
    // hand-check a row: diff and ret against the collected series
    val sample = r.filter(col("event_type") === "view").orderBy(col("event_id")).head()
    val series = e.filter(col("event_type") === "view")
      .select(col("ts"), col("event_id"), col("value"))
      .collect().map(x => (x.getTimestamp(0).getTime, x.getLong(1), x.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val i = series.indexWhere(_._2 == sample.getLong(0))
    val (prev, cur) = (series(i - 1)._3, series(i)._3)
    val d2 = (BigDecimal(cur).setScale(2, BigDecimal.RoundingMode.HALF_UP) -
      BigDecimal(prev).setScale(2, BigDecimal.RoundingMode.HALF_UP)).toDouble
    assert(sample.getDouble(2) == d2)
    assert(sample.getDouble(3) == cur / prev - 1.0)
  }

  test("breakouts are exactly the bollinger rows whose price exits the band") {
    val bb = q("q_market_bollinger").collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val px = Tables.events(spark, sf).select(col("event_id"), col("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = bb.collect {
      case (id, (up, dn)) if px(id) > up || px(id) < dn => id
    }.toSet
    val got = q("q_market_breakout").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture should contain at least one band exit")
  }

  test("cents guard bound is k-derived: exact domain shrinks as the window grows") {
    // exactness needs k·(100·|price|)² ≤ 2⁵³ — the bound must follow k,
    // not sit at a fixed $200k (k=100 with prices near $200k would put
    // Σcents² ≈ 4e16 > 2⁵³ and silently break decimal-oracle parity)
    assert(Market.centsExactBound(20) == 212216.0)
    assert(Market.centsExactBound(100) < 200000.0)
    (1 to 512).foreach { k =>
      val b = Market.centsExactBound(k)
      assert(k.toDouble * math.pow(100.0 * b, 2) <= math.pow(2.0, 53))
    }
    // the guard raises per-row past the derived bound and passes below it
    import spark.implicits._
    val under = Seq(Market.centsExactBound(100) - 1.0).toDF("value")
      .select(Market.centsGuarded(100).as("c")).head.getLong(0)
    assert(under > 0L)
    val e = intercept[Exception] {
      Seq(Market.centsExactBound(100) + 1.0).toDF("value")
        .select(Market.centsGuarded(100).as("c")).collect()
    }
    assert(e.getMessage.contains("integer-cents"), e.getMessage)
  }

  test("EWMA: weights normalize to 1; one row equals the hand fold over its window") {
    val ws = Market.ewmaWeights(10)
    assert(math.abs(ws.sum - 1.0) < 1e-12)
    assert(ws.sliding(2).forall { case Seq(a, b) => a < b }, "newer ticks weigh more")
    val res = q("q_market_ewma").collect()
    val target = res.maxBy(_.getLong(0))
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("ts"), col("value")).collect()
    val sym = e.find(_.getLong(0) == target.getLong(0)).get.getString(1)
    val series = e.filter(_.getString(1) == sym)
      .map(r => (r.getTimestamp(2).getTime, r.getLong(0), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val idx = series.indexWhere(_._2 == target.getLong(0))
    val win = series.slice(idx - 9, idx + 1).map(_._3)
    var acc = 0.0
    win.zip(ws).foreach { case (x, w) => acc += x * w }
    assert(target.getDouble(1) == acc, "left-to-right fold, bit-exact")
  }

  test("ATR: hand recomputation over one symbol's bars") {
    val atr = q("q_market_atr").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(atr.nonEmpty)
    val sym = atr.keys.head._1
    val bars = q("q_market_ohlc").collect().filter(_.getString(0) == sym)
      .map(r => (r.getString(1), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1) // (day, high, low, close)
    val trs = bars.sliding(2).collect { case Array((_, _, _, pc), (day, h, l, _)) =>
      day -> BigDecimal(math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc))))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    }.toArray
    val expected = trs.sliding(14).collect {
      case w if w.length == 14 => w.last._1 -> (w.map(_._2).sum.toDouble / 14.0)
    }.toMap
    val got = atr.collect { case ((s, day), v) if s == sym => day -> v }
    assert(got == expected)
  }

  test("beta: hand recomputation from the bars; sum of cov terms equals var of market") {
    val res = q("q_market_beta").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(res.nonEmpty)
    // recompute from collected bars with BigDecimal moments
    val bars = q("q_market_ohlc").collect()
      .map(r => (r.getString(0), r.getString(1), BigDecimal(r.getDouble(5))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val bySym = bars.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val deltas = bySym.map { case (sym, rows) =>
      sym -> rows.sliding(2).collect {
        case Array((_, _, a), (_, day, b)) => day -> (b - a)
      }.toMap
    }
    val days = deltas.values.flatMap(_.keys).toSet
    val market = days.map(dy =>
      dy -> deltas.values.flatMap(_.get(dy)).sum).toMap
    deltas.foreach { case (sym, dd) =>
      val n = dd.size
      val pairs = dd.toSeq.map { case (dy, v) => (v, market(dy)) }
      val sd = pairs.map(_._1).sum.toDouble
      val sm = pairs.map(_._2).sum.toDouble
      val sdm = pairs.map(p => p._1 * p._2).sum.toDouble
      val smm = pairs.map(p => p._2 * p._2).sum.toDouble
      val expected = (n * sdm - sd * sm) / (n * smm - sm * sm)
      assert(res(sym)._1 == n && res(sym)._2 == expected, s"beta($sym)")
    }
  }

  test("forward fill carries the last observation; leading gap stays null") {
    val r = q("q_ffill").collect()
      .map(x => x.getLong(0) -> (Option(x.get(1)), Option(x.get(2)))).toMap
    // rebuild expectation per user from raw events
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect().map(x => (x.getLong(0), x.getTimestamp(1).getTime, x.getLong(2), x.getDouble(3)))
    e.groupBy(_._1).foreach { case (_, rows) =>
      var carry: Option[Double] = None
      rows.sortBy(t => (t._2, t._3)).foreach { case (_, _, id, v) =>
        val obs = if (id % 7 == 0) Some(v) else None
        if (obs.isDefined) carry = obs
        val (gotObs, gotFill) = r(id)
        assert(gotObs == obs, s"reading at $id")
        assert(gotFill == carry, s"filled at $id")
      }
    }
  }

  test("RSI stays in [0, 100]; an all-gain synthetic series pins to 100") {
    val r = q("q_market_rsi")
    assert(r.filter(col("rsi") < 0 || col("rsi") > 100).count() == 0)
    // monotone rising prices => every diff a gain => RSI exactly 100
    import spark.implicits._
    val rising = (0 until 40).map { i =>
      (i.toLong, "up", new java.sql.Timestamp(1700000000000L + i * 1000L),
        100.0 + i)
    }.toDF("event_id", "event_type", "ts", "value")
    val diffs = graft.ops.Chunked.frames(rising, "fixture:rsi-rising",
      "event_type", "ts", "event_id", 2) { w =>
      Seq(first(col("value")).over(w).as("prev"))
    }.select(col("event_id"), col("event_type"), col("ts"),
      (col("value") - col("prev")).cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("dd"))
    val framed = graft.ops.Chunked.frames(
      diffs.select(col("event_id"), col("event_type"), col("ts"),
        greatest(col("dd"), lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("gain"),
        greatest(-col("dd"), lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("loss")),
      "fixture:rsi-rising#returns", "event_type", "ts", "event_id", 14) { w =>
      Seq(sum(col("gain")).over(w).cast("double").as("g"),
        sum(col("loss")).over(w).cast("double").as("l"))
    }
    val rsis = framed.select(
      when(col("l") === 0.0, lit(100.0))
        .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + col("g") / col("l")))
        .as("rsi")).collect().map(_.getDouble(0))
    assert(rsis.nonEmpty && rsis.forall(_ == 100.0))
  }

  test("level shift: plain-Scala two-window recompute agrees, full windows only") {
    val w = 7
    val daily = Market.levelShift(spark, sf).collect()
    assert(daily.nonEmpty)
    // independent recompute from the raw events via BigDecimal sums
    val raw = Tables.events(spark, sf)
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val dmeans: Map[String, Seq[(String, Double)]] = raw.groupBy(_._1).map { case (sym, rows) =>
      sym -> rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (day, vs) =>
        val dec = vs.map(v => BigDecimal(v._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
        day -> dec.toDouble / vs.length
      }
    }
    val want = dmeans.flatMap { case (sym, days) =>
      days.indices.collect { case i if i >= w && i + w < days.length =>
        def winSum(r: Range) = r.map(j =>
          BigDecimal(days(j)._2).setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        val pm = winSum(i - w until i) / w
        val nm = winSum(i + 1 to i + w) / w
        (sym, days(i)._1) -> (days(i)._2, pm, nm, nm - pm)
      }
    }
    assert(daily.length == want.size)
    daily.foreach { r =>
      val (dm, pm, nm, sh) = want((r.getString(0), r.getString(1)))
      assert(r.getAs[Double]("dmean") == dm)
      assert(r.getAs[Double]("prev_mean") == pm)
      assert(r.getAs[Double]("next_mean") == nm)
      assert(r.getAs[Double]("shift") == sh)
    }
  }

  test("macd: rows start at the slow window, hist = macd − signal, warm-up NULLs") {
    val rows = q("q_market_macd").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getString(1))
      // signal needs 9 macd rows: the first min(8, n) rows are NULL
      ordered.take(8).foreach(r => assert(r.isNullAt(3) && r.isNullAt(4)))
      ordered.drop(8).foreach { r =>
        assert(!r.isNullAt(3))
        assert(r.getAs[Double]("hist") ==
          r.getAs[Double]("macd") - r.getAs[Double]("signal"))
      }
    }
  }

  test("stochastic: %K in [0,100], %D is the mean of the last 3 %K values") {
    val rows = q("q_market_stochastic").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getString(1))
      ordered.foreach { r =>
        val k = r.getAs[Double]("pct_k")
        assert(k >= 0.0 && k <= 100.0)
      }
      ordered.sliding(3).zipWithIndex.foreach { case (win, _) =>
        if (win.length == 3 && !win.last.isNullAt(3)) {
          val mean = win.map(_.getAs[Double]("pct_k") / 3).sum
          assert(math.abs(win.last.getAs[Double]("pct_d") - mean) < 1e-9)
        }
      }
    }
  }
}
