package graft

import org.apache.spark.sql.functions._

/** User-behavior analytics (ops.Behavior): retention / funnel / SCD2.
  * Each query's oracle is the DuckDB SQL in SparkEntry; these specs pin
  * the structural invariants a hash can't articulate. */
class BehaviorSpec extends SparkSpec {

  test("retention: offset-0 cell equals cohort size and dominates every later cell") {
    val cells = q("q_retention").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val day0 = cells.filter(_._2 == 0L).map(c => c._1 -> c._3).toMap
    // every user is active on their own first day, so each cohort MUST
    // have an offset-0 cell and it bounds all its later cells
    val cohorts = cells.map(_._1).distinct
    assert(cohorts.forall(day0.contains), "cohort missing its offset-0 cell")
    assert(cells.forall { case (cd, _, n) => n <= day0(cd) })
    // cohort sizes partition the user base
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(day0.values.sum == users)
  }

  test("active users: daily counts partition the user base and the curve is monotone") {
    val rows = q("q_active_users").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_._3).sum == users, "Σ n_new covers every user exactly once")
    assert(rows.last._4 == users, "cumulative curve ends at the user count")
    assert(rows.forall(r => r._2 >= r._3), "new users are active that day")
    assert(rows.sliding(2).forall {
      case Array(a, b) => b._4 == a._4 + b._3   // cum is the running sum
      case _ => true
    })
  }

  test("funnel equals a hand-computed funnel over the collected fixture") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1)
    def firstAfter(u: Long, tpe: String, after: Long): Option[Long] = {
      val ts = byUser(u).filter(e => e._2 == tpe && e._3 > after).map(_._3)
      if (ts.isEmpty) None else Some(ts.min)
    }
    var nv = 0L; var nc = 0L; var np = 0L
    for (u <- byUser.keys) {
      firstAfter(u, "view", Long.MinValue).foreach { tv =>
        nv += 1
        firstAfter(u, "click", tv).foreach { tc =>
          nc += 1
          if (firstAfter(u, "purchase", tc).nonEmpty) np += 1
        }
      }
    }
    val Array(r) = q("q_funnel").collect()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((nv, nc, np)))
    assert(nv >= nc && nc >= np && nv > 0)
  }

  test("scd2: per-user intervals are contiguous, alternating, with exactly one current") {
    val iv = q("q_scd2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    assert(iv.nonEmpty)
    iv.groupBy(_._1).foreach { case (_, rows) =>
      val hist = rows.sortBy(_._3)
      // exactly one open (current) interval per user, and it is the last
      assert(hist.count(_._5) == 1 && hist.last._5)
      // each interval closes exactly where the next opens; types change
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), "gap or overlap between intervals")
          assert(a._2 != b._2, "consecutive repeat not collapsed")
        case _ => ()
      }
    }
    // collapse is real: strictly fewer intervals than events
    assert(iv.length < Tables.events(spark, sf).count())
  }

  test("kNN edges equal a plain-Scala top-3 pick over hand-counted pair weights") {
    val pd = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("day", col("ts")))
      .distinct().collect().map(r => (r.getLong(0), r.get(1).toString)).toSet
    val counts = pd.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val pairW = (for {
      (a, da) <- counts.toSeq; (b, db) <- counts.toSeq if a < b
      c = (da & db).size if c > 0
    } yield ((a, b), c)).toMap
    val expect = counts.keySet.flatMap { u =>
      pairW.iterator.collect {
        case ((a, b), c) if a == u => (b, c)
        case ((a, b), c) if b == u => (a, c)
      }.toSeq.sortBy { case (v, c) => (-c, v) }.take(3)
        .map { case (v, _) => (math.min(u, v), math.max(u, v)) }
    }
    val got = ops.Behavior.coPurchaseKnnEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect && got.nonEmpty)
  }

  // purchase activity of the sf fixture — the DENSE regime input
  private def densePd = Tables.events(spark, sf)
    .filter(col("event_type") === "purchase")
    .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    .distinct()

  // 40 users, user u active on days {u, u+1}: consecutive users share
  // exactly one day, so pairs exist but Σ_day cnt² (≈ 4·41) is far
  // under |users|² (1600) — the SPARSE regime input
  private def sparsePd = {
    import spark.implicits._
    (0L until 40L).flatMap(u => Seq((u, u), (u, u + 1L)))
      .toDF("user_id", "di")
      .select(col("user_id"),
        expr("timestamp'2020-01-01 00:00:00' + di * INTERVAL 1 DAY").as("day"))
  }

  test("kNN regime dispatch: dense fixture → all-pairs, disjoint-day fixture → day-keyed join") {
    val dStats = ops.Behavior.activityStats(densePd)
    assert(!dStats.sparse,
      s"~98%-dense co-activity must pick all-pairs (Σcnt²=${dStats.dayPairRows} vs n²=${dStats.nUsers * dStats.nUsers})")
    val sStats = ops.Behavior.activityStats(sparsePd)
    assert(sStats.sparse,
      s"near-disjoint activity must pick the day-keyed join (Σcnt²=${sStats.dayPairRows} vs n²=${sStats.nUsers * sStats.nUsers})")
  }

  test("dense and sparse kNN builders produce identical edge sets on both fixtures") {
    for (pd <- Seq(densePd, sparsePd)) {
      val viaDense = ops.Behavior.knnEdgesFromActivity(spark, pd, 3,
        forceDense = Some(true)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaSparse = ops.Behavior.knnEdgesFromActivity(spark, pd, 3,
        forceDense = Some(false)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaDense == viaSparse && viaDense.nonEmpty,
        "the regime swap must be a pure planner choice — identical counts, identical picks")
    }
  }

  test("kNN edge set is invariant to the derived block count") {
    val pd = densePd
    val edges = Seq(4, 8).map { b =>
      ops.Behavior.knnEdgesFromActivity(spark, pd, 3,
        forceDense = Some(true), forceBlocks = Some(b)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(edges(0) == edges(1) && edges(0).nonEmpty,
      "every unordered pair lands in exactly one (i ≤ j) combo for ANY B")
    // the derivation: ⌈users/256⌉ clamped to [4, 256]
    assert(ops.Behavior.knnBlockCount(150L) == 4)
    assert(ops.Behavior.knnBlockCount(15000L) == 59)
    assert(ops.Behavior.knnBlockCount(10L * 1000 * 1000) == 256)
  }

  test("kNN-graph components equal a plain-Scala union-find with min labels") {
    val edges = ops.Behavior.coPurchaseKnnEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = parent.keys.map(u => u -> find(u)).toMap
    val got = q("q_graph_components").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, "min-label propagation must equal union-find")
    // every label is its component's minimum member
    got.groupBy(_._2).foreach { case (c, m) => assert(m.keys.min == c) }
  }

  test("degree-oriented triangles equal the naive enumeration and close on real edges") {
    val edges = ops.Behavior.coPurchaseKnnEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.nonEmpty, "fixture yields no co-purchase edges")
    // naive: for every edge (a,b) with a<b, any c>b adjacent to both
    val expect = (for {
      (a, b) <- edges
      (x, c) <- edges if x == b
      if edges.contains((a, c))
    } yield (a, b, c)).toSet
    assert(expect.nonEmpty, "fixture yields no triangles")
    val got = q("q_graph_triangles").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    got.foreach { case (a, b, c) =>
      assert(a < b && b < c)
      assert(edges((a, b)) && edges((b, c)) && edges((a, c)))
    }
  }

  test("fixed-point pagerank equals a plain-Scala integer recurrence exactly") {
    val edges = ops.Behavior.coPurchaseKnnEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = adj.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var ranks: Map[Long, Long] = deg.map { case (u, _) => u -> 1000000000000L }
    for (_ <- 1 to ops.Behavior.PageRankIters) {
      val in = adj.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      ranks = ranks.keys.map { v =>
        val s = in(v).map(u => ranks(u) / deg(u)).sum
        v -> (150000000000L + (85L * s) / 100L)
      }.toMap
    }
    val got = q("q_pagerank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ranks && got.nonEmpty)
    // mass sanity: total rank stays within damping loss of the start
    val total = got.values.sum
    val start = got.size.toLong * 1000000000000L
    assert(total <= start && total > start / 2)
  }

  test("transition counts conserve steps and match a hand recompute") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = rows.groupBy(_._1).values.flatMap { g =>
      g.sortBy(r => (r._2, r._3)).map(_._4).sliding(2)
        .filter(_.length == 2).map(w => (w(0), w(1)))
    }.toSeq.groupBy(w => w).map { case (k, v) => k -> v.length.toLong }
    val got = q("q_transitions").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expect)
    // conservation: total transitions == total events - users
    val users = rows.map(_._1).distinct.length
    assert(got.values.sum == rows.length - users)
  }
}
