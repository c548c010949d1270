package graft

import org.apache.spark.sql.functions._

/** Core relational operators at sf0.001 (SURVEY §2.2/2.4/2.6/2.7). */
class RelationalSpec extends SparkSpec {

  test("scan_filter keeps only clicks and projects three columns") {
    val df = q("q_scan_filter")
    assert(df.columns.toSeq == Seq("event_id", "user_id", "value"))
    assert(df.count() > 0)
  }

  test("partitioned layout prunes non-matching partitions at plan time") {
    val dir = graft.ops.Relational.partitionedEventsDir(spark, sf)
    val scan = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("(event_type") && plan.contains("purchase"),
      plan.take(1200))
    // pruned values == raw-table filter
    assert(scan.count() ==
      Tables.events(spark, sf).filter(col("event_type") === "purchase").count())
  }

  test("spark.sql runs the oracle's exact SQL text") {
    assert(SparkEntry.oracleSql("q_sql_yr_priority") ==
      graft.ops.Relational.RevenueByYearPrioritySql)
    assert(q("q_sql_yr_priority").count() > 0)
  }

  test("six-way SQL join plans with broadcast dims and returns the ASIA volumes") {
    val df = graft.ops.Relational.sqlLocalSupplierVolume(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the dim chains (region→nation→supplier, customer) must ride
    // broadcast joins; only the fact-fact side may shuffle
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert("Join".r.findAllIn(plan).size >= 5, "all five join conditions planned")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every revenue positive, sorted descending
    val revs = rows.map(_.getDouble(1))
    assert(revs.forall(_ > 0) && revs.sameElements(revs.sortBy(-_)))
  }

  test("count matches direct parquet count") {
    val n = q("q_count").head().getLong(0)
    assert(n == Tables.lineitem(spark, sf).count())
  }

  test("orderby_limit returns ascending event_ids, bounded by limit") {
    val ids = q("q_orderby_limit").select("event_id").collect().map(_.getLong(0))
    assert(ids.length <= 5000)
    assert(ids.sameElements(ids.sorted))
  }

  test("union all keeps duplicates; intersect/except are distinct") {
    val e = Tables.events(spark, sf)
    val clicks = e.filter(col("event_type") === "click").count()
    val high = e.filter(col("value") > 150.0).count()
    assert(q("q_union").count() == clicks + high)
    val inter = q("q_intersect")
    assert(inter.count() == inter.distinct().count())
  }

  test("rollup has per-group rows plus subtotals plus grand total") {
    val rows = q("q_agg_rollup").collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Tables.lineitem(spark, sf).count())
  }

  test("grouped aggregation sums are exact decimals") {
    val row = q("q_metrics_summary").head()
    val n = row.getAs[Long]("n")
    assert(n == Tables.events(spark, sf).count())
    assert(row.getAs[Double]("min_value") <= row.getAs[Double]("avg_value"))
    assert(row.getAs[Double]("avg_value") <= row.getAs[Double]("max_value"))
  }

  test("approx distinct (HLL++) tracks exact distinct within the 1% rsd band") {
    val approx = q("q_approx_distinct").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("approx_parts")).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("exact_parts")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      // rsd 0.01 → allow a generous 5-sigma relative band
      assert(math.abs(ap - ex) <= math.max(1.0, 0.05 * ex),
        s"supplier $k: approx $ap vs exact $ex")
    }
  }

  test("approx percentile tracks the exact percentile per group") {
    val approx = q("q_approx_pctl").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = q("q_agg_percentile").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (med, p90)) =>
      val (am, a9) = approx(k)
      // accuracy 10000 → rank error <= n/10000; values are prices, use a
      // relative band generous to the rank-to-value mapping
      assert(math.abs(am - med) <= math.max(1.0, 0.05 * math.abs(med)))
      assert(math.abs(a9 - p90) <= math.max(1.0, 0.05 * math.abs(p90)))
    }
  }

  test("sketch rollup: unioned daily HLL sketches track exact distinct users") {
    val approx = q("q_sketch_rollup").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_users")).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("u")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) <= math.max(2.0, 0.05 * ex),
        s"$k: sketch ${approx(k)} vs exact $ex")
    }
  }

  test("approx_top_k heavy hitters pin to the exact vocabulary counts") {
    val approx = q("q_approx_topk").collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("est_freq")).toMap
    val exact = q("q_top_tokens").collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("freq")).toMap
    // at this scale the sketch tracks far more items than the true
    // vocabulary head, so the top-10 exact tokens must all surface with
    // exact counts
    exact.toSeq.sortBy(-_._2).take(10).foreach { case (t, f) =>
      assert(approx.contains(t), s"heavy hitter '$t' missing from sketch")
      assert(approx(t) == f, s"'$t': sketch ${approx(t)} != exact $f")
    }
  }

  test("approx_top_k oracle preconditions hold on the oracle-gate corpus") {
    // the q_approx_topk DuckDB oracle states EXACT top-20 counts, which
    // the sketch guarantees only while (a) the stream's distinct count
    // stays under its tracking capacity and (b) the k/k+1 boundary is
    // untied — assert both on sf0.01, where the hash compare runs, so a
    // fixture change fails loudly here instead of as a silent hash drift
    val gateSf = "/root/testdata/sf0.01"
    val counts = Tables.documents(spark, gateSf)
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).count()
      .orderBy(col("count").desc, col("token"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(counts.length < 10000, s"vocab ${counts.length} exceeds sketch capacity")
    assert(counts.length > 20 && counts(19)._2 > counts(20)._2,
      s"tie at the top-20 boundary: ${counts.slice(18, 22).mkString(", ")}")
  }

  test("semi + anti partition customers") {
    val total = Tables.customer(spark, sf).count()
    assert(q("q_join_semi").count() + q("q_join_anti").count() == total)
  }

  test("bucketed co-located join: zero hash exchanges, values match shuffle join") {
    val (lineitem, orders) = graft.ops.Joins.bucketedTables(spark, sf)
    val joined = lineitem.hint("merge")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(1500))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not reshuffle either side:\n${plan.take(1500)}")
    // same values as computing the aggregate off the raw parquet
    val viaBuckets = q("q_join_bucketed").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val viaShuffle = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(graft.ops.Aggregates
          .revenueTerm(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(viaBuckets == viaShuffle)
  }

  test("outer join order counts sum to total orders") {
    val sums = q("q_join_outer").agg(sum(col("n_orders"))).head().getLong(0)
    assert(sums == Tables.orders(spark, sf).count())
  }

  test("range join counts clicks within one hour, never negative") {
    val df = q("q_join_range")
    assert(df.filter(col("n_clicks_1h") < 0).count() == 0)
    assert(df.count() ==
      Tables.events(spark, sf).filter(col("event_type") === "purchase").count())
  }

  test("salted join equals the plain join and spreads the hot key over salts") {
    import spark.implicits._
    // skewed fixture: one hot key carrying 97% of the fact rows
    val fact = ((0 until 5000).map(i => (i.toLong, "hot")) ++
      (0 until 150).map(i => (5000L + i, s"cold${i % 3}"))).toDF("id", "k")
    val small = Seq(("hot", 1.0), ("cold0", 2.0), ("cold1", 3.0), ("cold2", 4.0))
      .toDF("k", "w")
    val salted = graft.ops.Joins.saltedEquiJoin(fact, small, "k", salts = 8)
    // the join's shuffle must hash on (key, salt), not the key alone —
    // that is the mechanism that splits the hot key across tasks
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan.take(2000))
    assert(plan.matches("(?s).*hashpartitioning\\(.*k.*__salt.*"),
      s"expected the shuffle to partition on (k, __salt):\n${plan.take(2000)}")
    // salting must be invisible in the result
    val expected = fact.join(small, Seq("k")).select("id", "k", "w")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val got = salted.select("id", "k", "w")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == expected)
    // and the salted fact side really carries >1 distinct salt for the hot key
    val hotSalts = fact.withColumn("__salt",
        pmod(xxhash64(fact.columns.map(col): _*), lit(8L)))
      .filter(col("k") === "hot").select("__salt").distinct().count()
    assert(hotSalts > 1, s"hot key landed in $hotSalts salt buckets")
  }

  test("AQE skew-join split fires on a skewed sort-merge join") {
    // the adaptive half of the hot-key join story (the manual half is
    // the salted join above): with skewJoin enabled, AQE re-plans a
    // skewed SMJ partition into multiple splits at runtime. Thresholds
    // are lowered to make the toy fixture's hot partition register as
    // skewed; production keeps the defaults and the same plan shape
    // appears once a partition crosses 256 MB.
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k =>
      k -> scala.util.Try(conf.get(k)).toOption.flatMap(Option(_)))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // 97% of fact rows carry one key; padding inflates the hot shuffle
      // partition past the lowered skew threshold
      val fact = spark.range(120000).select(col("id"),
        when(pmod(col("id"), lit(100)) < 97, lit("hot"))
          .otherwise(concat(lit("cold"), pmod(col("id"), lit(100)))).as("k"),
        lpad(col("id").cast("string"), 64, "x").as("pad"))
      val dim = Seq.tabulate(100)(i => if (i < 97) "hot" else s"cold$i")
        .distinct.zipWithIndex.toDF("k", "w")
      val joined = fact.join(dim, Seq("k"))
      // run THIS df's own plan (count() would plan a separate query and
      // leave joined's adaptive plan unfinalized)
      assert(joined.collect().length == 120000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed SMJ partition (skew=true):\n${plan.take(3000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("correlated subqueries decorrelate into joins (no per-row re-execution)") {
    val df = q("q_sql_correlated")
    val optimized = df.queryExecution.optimizedPlan
    val joins = optimized.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    // EXISTS → semi join; two scalar aggregates → one outer join each
    assert(joins.size >= 3, s"expected >=3 decorrelated joins:\n$optimized")
    assert(!optimized.toString.contains("scalar-subquery"),
      "correlated scalar subquery survived optimization")
    // semantics: EXISTS filter keeps exactly the urgent-order customers,
    // and the COUNT subquery can never be below 1 for a kept customer
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct().count()
    assert(df.count() == urgent)
    assert(df.filter(col("n_orders") < 1).count() == 0)
  }

  test("histogram: bins partition all rows, bounds nest inside bin edges") {
    val h = q("q_histogram").collect()
    val total = Tables.lineitem(spark, sf).count()
    assert(h.map(_.getLong(1)).sum == total, "bin counts partition the table")
    assert(h.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 19))
    assert(h.forall(r => r.getDouble(2) <= r.getDouble(3)), "bin_min <= bin_max")
    // recompute one bin membership by hand
    val xs = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice").cast("double")).collect().map(_.getDouble(0))
    val (mn, mx) = (xs.min, xs.max)
    val w = (mx - mn) / 20.0
    val hand = xs.map(x => math.min(math.floor((x - mn) / w), 19.0).toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(h.map(r => r.getLong(0) -> r.getLong(1)).toMap == hand)
  }

  test("profile: one row per column; counts match direct queries") {
    val p = q("q_profile").collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    p.values.foreach(r => assert(r.getLong(1) == n))
    val qty = p("l_quantity")
    assert(qty.getLong(2) == li.filter(col("l_quantity").isNull).count())
    assert(qty.getLong(3) == li.select("l_quantity").distinct().count())
    assert(qty.getDouble(4) == li.agg(min(col("l_quantity").cast("double"))).head().getDouble(0))
    assert(qty.getDouble(5) == li.agg(max(col("l_quantity").cast("double"))).head().getDouble(0))
  }

  test("weighted sample keeps exactly the rows under the k-proportional hash threshold") {
    // plain-Scala recompute of the inclusion rule: top-32 bits of the
    // mod-2^64 rolling hash vs k·2^32/(2·k_max) — no Spark expressions
    def rollhash(s: String): Long =
      s.foldLeft(0L)((a, c) => a * 1000003L + c.toLong)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val kMax = ev.map(_._2).max
    val expect = ev.filter { case (id, k) =>
      val h32 = rollhash(s"wsamp#$id#v1") >>> 32
      h32 * kMax * 2 < k * 4294967296L
    }.map(_._1).toSet
    val got = q("q_sample_weighted").collect().map(_.getLong(0)).toSet
    assert(got == expect && got.nonEmpty && got.size < ev.length)
    // weighting is real: kept rows skew toward high k
    val keptMean = ev.filter(e => expect(e._1)).map(_._2.toDouble).sum / expect.size
    val allMean = ev.map(_._2.toDouble).sum / ev.length
    assert(keptMean > allMean, "sample does not skew toward heavy weights")
  }

  test("skyline equals brute-force dominance per brand") {
    val parts = Tables.part(spark, sf)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val expect = parts.filter { p =>
      !parts.exists(o => o._1 == p._1 &&
        o._3 <= p._3 && o._4 >= p._4 && (o._3 < p._3 || o._4 > p._4))
    }.map(p => (p._1, p._2)).toSet
    val got = q("q_skyline").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("dq checks: metrics match direct recomputes; the fixture's real uniqueness defect is caught") {
    val li = Tables.lineitem(spark, sf)
    val n = li.count().toDouble
    val rows = q("q_dq_checks").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(rows.keySet == Set("accepted_values_l_returnflag",
      "completeness_l_quantity", "range_l_discount",
      "referential_orderkey", "uniqueness_orderkey_linenumber"))
    assert(rows("completeness_l_quantity")._1 ==
      li.filter(col("l_quantity").isNotNull).count() / n)
    assert(rows("uniqueness_orderkey_linenumber")._1 ==
      li.select(col("l_orderkey"), col("l_linenumber")).distinct().count() / n)
    // passed is exactly metric >= 1.0
    rows.values.foreach { case (m, p) => assert(p == (m >= 1.0)) }
    // the suite catches a REAL defect: the synthetic fixture duplicates
    // ~23% of (orderkey, linenumber) pairs, so uniqueness must FAIL
    // while the four other checks pass — a quality gate that can only
    // say "pass" tests nothing
    assert(!rows("uniqueness_orderkey_linenumber")._2)
    assert(rows.removed("uniqueness_orderkey_linenumber").values.forall(_._2),
      s"failing checks: ${rows.filterNot(_._2._2).keys}")
  }

  test("negative sample equals a plain-Scala recompute and never emits an observed pair") {
    def rollHash(str: String): Long = {
      var h = 0L
      str.getBytes("UTF-8").foreach(b => h = h * 1000003L + (b & 0xFF))
      h
    }
    val nParts = Tables.part(spark, sf).count()
    val custs = Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0)).sorted
    val observed = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = custs.flatMap { c =>
      val cand = (0 until 10)
        .map(slot => slot -> java.lang.Long.remainderUnsigned(
          rollHash(s"negs#$c#$slot#v1") >>> 32, nParts))
        .groupBy(_._2).map { case (p, ss) => (ss.map(_._1).min, p) }.toSeq
        .filter { case (_, p) => !observed((c, p)) }
        .sortBy(_._1).take(5)
      cand.zipWithIndex.map { case ((_, p), i) => (c, (i + 1).toLong, p) }
    }.toSeq
    val got = q("q_negative_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    got.foreach { case (c, _, p) => assert(!observed((c, p))) }
  }

  test("csv source quarantines exactly the corrupted slice") {
    val raw = ops.Relational.csvEventsRaw(spark, sf).cache()
    try {
      val total = Tables.events(spark, sf).count()
      val corrupt = Tables.events(spark, sf).filter(col("event_id") % 97 === 0).count()
      assert(corrupt > 0, "fixture exercises no corrupt rows")
      assert(raw.count() == total)
      assert(raw.filter(col("_corrupt_record").isNotNull).count() == corrupt)
      // surviving rows parse completely — no silent partial rows
      assert(raw.filter(col("_corrupt_record").isNull &&
        (col("event_id").isNull || col("value").isNull)).count() == 0)
    } finally raw.unpersist()
  }

  test("orc source round-trips events bit-exactly; summary equals the parquet-side aggregate") {
    val orc = spark.read.orc(ops.Relational.orcEventsDir(spark, sf))
    val src = Tables.events(spark, sf)
    assert(orc.count() == src.count())
    // whole-row parity: binary columnar round-trip loses nothing
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value").map(col)
    assert(orc.select(cols: _*).exceptAll(src.select(cols: _*)).count() == 0)
    assert(src.select(cols: _*).exceptAll(orc.select(cols: _*)).count() == 0)
    // scan-level treatment matches parquet: predicates and column
    // pruning reach the ORC stripes
    val plan = orc.filter(col("event_type") === "click")
      .select(col("event_id")).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"),
      s"ORC scan did not push the predicate:\n$plan")
    // the registered summary equals the same aggregate straight off parquet
    val fromOrc = q("q_source_orc").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val fromParquet = src.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        ops.Aggregates.dsum(col("value")).as("total"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(fromOrc == fromParquet)
  }

  test("schema-evolution read: legacy rows surface NULL type, union conserves the table") {
    import graft.ops.Relational
    val (legacy, evolved) = Relational.evolvedEventsDirs(spark, sf)
    val merged = spark.read.option("mergeSchema", "true").parquet(legacy, evolved)
    // the legacy half has no event_type column on disk, yet the merged
    // schema carries it — NULL exactly on even ids
    assert(merged.columns.toSet == Set("event_id", "event_type", "value"))
    merged.collect().foreach { r =>
      val id = r.getAs[Long]("event_id")
      assert(r.isNullAt(r.fieldIndex("event_type")) == (id % 2 == 0))
    }
    // union conserves: every event exactly once, per-type counts match
    val n = Tables.events(spark, sf).count()
    assert(merged.count() == n)
    assert(merged.select("event_id").distinct().count() == n)
    val byType = q("q_source_evolution").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    val wantTyped = Tables.events(spark, sf)
      .filter(col("event_id") % 2 === 1)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
    wantTyped.foreach { case (t, c) => assert(byType(t) == c) }
    assert(byType("_legacy") == n - wantTyped.values.sum)
  }

  test("disjunctive join stays keyed: equi-join on partkey, no cartesian") {
    val plan = q("q_sql_disjunctive").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the OR-of-conjuncts must remain a residual on a keyed join:\n$plan")
    assert(plan.contains("p_partkey") && plan.contains("Join"))
  }

  test("group sample: exactly k per stratum (capped by stratum size), ids distinct") {
    val rows = q("q_group_sample").collect()
    val perSource = Tables.documents(spark, sf).groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
    val got = rows.groupBy(_.getAs[String]("source"))
    assert(got.keySet == perSource.keySet)
    got.foreach { case (src, rs) =>
      assert(rs.length == math.min(5L, perSource(src)))
      assert(rs.map(_.getAs[Long]("doc_id")).distinct.length == rs.length)
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to rs.length))
    }
  }

  test("containment: bounded by 1, ≥ jaccard, and exact on a containing pair") {
    val cont = q("q_dedup_containment").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Double]("contain_ab"), r.getAs[Double]("contain_ba"))).toMap
    val jac = q("q_dedup_ngram_jaccard").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(cont.keySet == jac.keySet)
    cont.foreach { case (k, (ab, ba)) =>
      assert(ab >= jac(k) - 1e-12 && ba >= jac(k) - 1e-12,
        "containment dominates jaccard (denominator is one set, not the union)")
      assert(ab <= 1.0 + 1e-12 && ba <= 1.0 + 1e-12)
    }
  }
}
