package graft

import graft.ops.{Predict, Windows}
import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}

/** Window-operator laws (SURVEY §2.5, §5: window count = n−k+1 for n≥k;
  * minmax-scale ∘ inverse = identity; predictor shape). */
class WindowSpec extends SparkSpec {

  test("sliding windows: complete-window count per series is n-k+1") {
    val k = 60
    val perSeries = Tables.events(spark, sf)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = perSeries.values.map(n => math.max(0L, n - k + 1)).sum
    assert(q("q_sliding_windows").count() == expected)
  }

  test("sliding windows: direct (past-gate) regime equals the artifact regime row-for-row") {
    // artifactMaxRows = 0 forces the path production takes past the 20M
    // window-array gate (native frame aggregates, no array build); the
    // default path reads the shared array artifact. Bit-equality keeps
    // the gate a pure performance switch — the oracle only ever sees
    // one of the two.
    val viaArtifact = Windows.slidingWindowStats(spark, sf).collect().toSeq
    val direct = Windows.slidingWindowStats(spark, sf, artifactMaxRows = 0L)
      .collect().toSeq
    assert(direct == viaArtifact)
  }

  test("last5 stats bound each other") {
    q("q_last5_window").collect().foreach { r =>
      assert(r.getAs[Long]("n") == 5L)
      assert(r.getAs[Double]("min_lastk") <= r.getAs[Double]("max_lastk"))
      assert(r.getAs[Double]("sum_lastk") >= 5 * r.getAs[Double]("min_lastk") - 1e-9)
      assert(r.getAs[Double]("sum_lastk") <= 5 * r.getAs[Double]("max_lastk") + 1e-9)
    }
  }

  test("bounded top-k aggregate equals the window-rank formulation") {
    import org.apache.spark.sql.expressions.Window
    // the pre-rewrite shape: rank newest-first, keep 5, aggregate
    val newestFirst = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val viaWindow = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(newestFirst))
      .filter(col("rn") <= 5)
      .groupBy(col("event_type"))
      .agg(graft.ops.Aggregates.dsum(col("value")).as("sum_lastk"),
        min(col("value")).as("min_lastk"), max(col("value")).as("max_lastk"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val viaAgg = q("q_last5_window").collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(viaAgg == viaWindow)
  }

  test("frozen-scaler: out-of-range values scale outside [0,1], inverse restores") {
    val (mn, mx) = (10.0, 200.0)
    val scaled = Windows.minMaxScaleFrozen(spark, sf, mn, mx)
    val joined = scaled
      .join(Tables.events(spark, sf).select(col("event_id"), col("value")), "event_id")
    // frozen constants: a value below mn MUST scale negative (never clamped)
    val below = joined.filter(col("value") < mn)
    if (below.count() > 0)
      assert(below.filter(col("scaled") >= 0.0).count() == 0)
    val restored = Windows.minMaxInverse(scaled, mn, mx)
      .join(Tables.events(spark, sf).select(col("event_id"), col("value")), "event_id")
      .filter(abs(col("restored") - col("value")) > 1e-9)
    assert(restored.count() == 0)
  }

  test("minmax scale lands in [0,1] and inverse restores original values") {
    val scaled = q("q_minmax_scale")
    val bounds = scaled.agg(min(col("scaled")), max(col("scaled"))).head()
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
    val stats = Tables.events(spark, sf)
      .agg(min(col("value")), max(col("value"))).head()
    val restored = Windows.minMaxInverse(scaled, stats.getDouble(0), stats.getDouble(1))
      .join(Tables.events(spark, sf).select(col("event_id"), col("value")), "event_id")
      .filter(abs(col("restored") - col("value")) > 1e-9)
    assert(restored.count() == 0)
  }

  test("linear predictor: property next = last + slope over arbitrary series") {
    val gen = Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))
    val prop = forAll(gen) { xs =>
      val p = Predict.LinearPredictor.predict(xs)
      if (xs.size < 2) p == xs.last
      else math.abs(p - (xs.last + (xs.last - xs.head) / (xs.size - 1))) < 1e-9
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("shape search: self-match tops the ranking, correlations bounded") {
    val rows = q("q_ts_search").collect()
      .map(r => (r.getLong(0), r.getAs[Double]("corr")))
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { case (_, c) => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9) }
    // the query window itself (global min event_id among complete
    // windows) must appear with corr ~ 1
    val minId = rows.map(_._1).min
    val self = rows.find(_._1 == minId)
    assert(self.exists(p => math.abs(p._2 - 1.0) < 1e-9))
  }

  test("shape search: bounded query-window derivation == window-set derivation") {
    // queryWindowRow replaces the frames-pass `orderBy(event_id).limit(1)`
    // with three bounded jobs; its (win, sm, ss) must equal the plain
    // window-set derivation value for value, fold for fold
    val w = 20
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-(w - 1), 0)
    val first = Tables.events(spark, sf)
      .select(col("event_id"),
        collect_list(col("value")).over(frame).as("win"))
      .filter(size(col("win")) === w)
      .orderBy(col("event_id")).limit(1).collect()(0)
    val expected = first.getSeq[Double](1).toArray
    val q = graft.ops.TimeSeries.queryWindowRow(spark, sf, w)
    assert(q.nonEmpty, "fixture has complete windows")
    val (qwin, qsm, qss) = q.get
    assert(qwin.sameElements(expected))
    var sm = 0.0
    var ss = 0.0
    expected.foreach { v => sm += v * 1.0; ss += v * v }
    assert(qsm == sm && qss == ss)
  }

  test("sessionize splits on >30min gaps and covers every event exactly once") {
    import spark.implicits._
    def t(mins: Long) = new java.sql.Timestamp(1704067200000L + mins * 60000L)
    // user 1: a 3-event burst, a 2h gap, a 2-event burst; user 2: singleton
    val fx = Seq(
      (1L, 1L, t(0)), (1L, 2L, t(10)), (1L, 3L, t(20)),
      (1L, 4L, t(150)), (1L, 5L, t(160)),
      (2L, 6L, t(0))).toDF("user_id", "event_id", "ts")
    val sess = graft.ops.Windows.sessionizeDf(fx).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(sess == Map(
      (1L, 1L) -> (3L, 20L * 60000000L),
      (1L, 2L) -> (2L, 10L * 60000000L),
      (2L, 1L) -> (1L, 0L)))
    // on the real corpus: partition of the events, no loss, no overlap
    val df = q("q_sessionize")
    assert(df.agg(sum(col("n_events"))).head().getLong(0) ==
      Tables.events(spark, sf).count())
    assert(df.filter(col("duration_us") < 0).count() == 0)
  }

  test("percent_rank/cume_dist are in [0,1] with the right endpoints per series") {
    val rows = q("q_window_pctrank").collect()
    rows.foreach { r =>
      val pr = r.getDouble(1); val cd = r.getDouble(2)
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
    }
    // every series has a minimum (pr == 0) and the last row's cd == 1
    assert(rows.count(_.getDouble(1) == 0.0) >= 1)
    assert(rows.count(_.getDouble(2) == 1.0) >= 1)
  }

  test("monthly rollup partitions the orders table") {
    assert(q("q_agg_monthly").agg(sum(col("n_orders"))).head().getLong(0) ==
      Tables.orders(spark, sf).count())
  }

  test("native session_window agrees with gaps-and-islands up to the >= edge") {
    val nat = q("q_session_window")
    val gi = q("q_sessionize")
    // same corpus, same gap: total events covered identically; session
    // counts can differ only on gaps of exactly 30min (none in a
    // continuous-time fixture, but don't assume — compare bounds)
    assert(nat.agg(sum(col("n_events"))).head().getLong(0) ==
      Tables.events(spark, sf).count())
    val natSessions = nat.count()
    val giSessions = gi.count()
    assert(natSessions >= giSessions, "session_window splits >= the lag formulation")
    // every native session is internally consistent: end = start + span + gap
    nat.collect().foreach { r =>
      assert(r.getAs[Long]("end_us") > r.getAs[Long]("start_us"))
    }
  }

  test("stratified sample balances strata deterministically with a broadcast-only fact path") {
    val counts = q("q_sample_stratified").groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val prof = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = prof.values.min
    val target = nMin / 2.0
    prof.foreach { case (t, nT) =>
      val c = counts.getOrElse(t, 0L)
      assert(c < nT, s"stratum '$t' must be genuinely thinned ($c of $nT kept)")
      assert(math.abs(c - target) <= 5 * math.sqrt(target) + 1,
        s"stratum '$t' sampled $c, want ≈$target")
    }
    // deterministic in the key: a second run yields the identical set
    val a = q("q_sample_stratified").collect().map(_.getLong(1)).toSet
    val b = q("q_sample_stratified").collect().map(_.getLong(1)).toSet
    assert(a == b)
    // the fact side meets the 5-row rate table by broadcast, not shuffle
    val plan = q("q_sample_stratified").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("rank/lag window results align with per-user ordering") {
    val lagged = q("q_window_lag").limit(0) // schema check only
    assert(lagged.columns.toSeq ==
      Seq("event_id", "value", "prev_value", "next_value"))
    // every user's first event (by ts) has null prev_value
    val firsts = q("q_window_lag").filter(col("prev_value").isNull).count()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(firsts == users)
  }

  test("z-scored groups have mean ~0 and sample sd ~1") {
    val byGroup = q("q_zscore_group").groupBy(col("event_type"))
      .agg(avg(col("z")).as("m"),
        stddev_samp(col("z")).as("s"), count(lit(1)).as("n"))
      .collect()
    assert(byGroup.nonEmpty)
    byGroup.foreach { r =>
      assert(math.abs(r.getAs[Double]("m")) < 1e-9, s"mean ${r.getAs[Double]("m")}")
      assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-9, s"sd ${r.getAs[Double]("s")}")
    }
  }

  test("winsorize clamps into the group band and leaves the interior untouched") {
    val e = Tables.events(spark, sf)
    val joined = q("q_winsorize")
      .join(e.select(col("event_id"), col("value")), Seq("event_id"))
      .collect()
    assert(joined.length == e.count())
    val byType = joined.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rows) =>
      val clipped = rows.map(_.getAs[Double]("clipped"))
      val (lo, hi) = (clipped.min, clipped.max)
      rows.foreach { r =>
        val (c, v) = (r.getAs[Double]("clipped"), r.getAs[Double]("value"))
        assert(c >= lo && c <= hi)
        // interior values pass through bit-identical
        if (v > lo && v < hi) assert(c == v)
      }
      // something actually clips at the 5%/95% cuts on 2000 rows/group
      assert(rows.exists(r => r.getAs[Double]("clipped") != r.getAs[Double]("value")))
    }
  }

  test("daily correlation: diagonal ~1, everything in [-1,1], upper triangle only") {
    val rows = q("q_corr_daily").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, c) = (r.getString(0), r.getString(1), r.getAs[Double]("corr"))
      assert(a <= b, s"$a > $b")
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"corr $c")
      if (a == b) assert(math.abs(c - 1.0) < 1e-12, s"diag corr $c")
    }
  }

  test("resample: grid is complete and equals a hand-computed interpolation") {
    // precondition the carry windows' determinism rests on
    val e = Tables.events(spark, sf)
    assert(e.count() == e.select("user_id", "ts").distinct().count(),
      "(user_id, ts) must be unique or the bracketing order is ambiguous")
    val rows = q("q_resample").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val users = e.select("user_id").distinct().count()
    val days = rows.keys.map(_._2).toSet
    assert(rows.size == users * days.size, "one row per user per grid day")
    // hand-recompute for every user from the collected fixture
    val ev = e.select(col("user_id"), unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, g) => u -> g.map(t => (t._2, t._3)).sortBy(_._1) }
    for (((u, dayStr), got) <- rows) {
      val g = java.time.LocalDate.parse(dayStr)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
      val series = ev(u)
      val before = series.filter(_._1 <= g)
      val after = series.filter(_._1 >= g)
      val expect =
        if (before.isEmpty) after.head._2
        else if (after.isEmpty) before.last._2
        else {
          val (t1, v1) = before.last; val (t2, v2) = after.head
          if (t2 == t1) v1
          else v1 + (v2 - v1) * ((g - t1).toDouble / (t2 - t1).toDouble)
        }
      assert(got == expect, s"user $u day $dayStr: $got != $expect")
    }
  }

  test("24h moving average: time-RANGE frame equals a brute-force trailing window") {
    val rows = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUser = rows.groupBy(_._2)
    val got = q("q_window_movavg").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.size == rows.length)
    rows.foreach { case (id, u, us, _) =>
      val frame = byUser(u).filter(r => r._3 >= us - 86400000000L && r._3 <= us)
      val sumCents = frame.map(r => BigDecimal(r._4).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum
      val (n, mav) = got(id)
      assert(n == frame.length, s"count at event $id")
      assert(mav == (sumCents.toDouble / frame.length), s"mean at event $id")
    }
  }
}
