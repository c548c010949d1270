package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Feature-prep wave + the round-8d TPC-H SQL shapes: invariants that
  * the DuckDB oracle can't express (plan shapes, algebraic identities,
  * cross-formulation equality). */
class TrainPrepSpec extends SparkSpec {

  test("late-orders EXISTS decorrelates to a semi join over pruned orders") {
    val df = q("q_sql_late_orders")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(1500))
    assert(!df.queryExecution.optimizedPlan.toString.contains("exists"),
      "EXISTS must not survive optimization")
    assert(df.count() > 0)
  }

  test("nation-value threshold equals 4% of the independently computed total") {
    val rows = q("q_sql_nation_value").collect()
    val total = Tables.lineitem(spark, sf)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"))
      .head.getDouble(0)
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) > total * 0.04))
  }

  test("promo share is one row with 0 <= promo <= total and consistent pct") {
    val r = q("q_sql_promo_share").head
    val (promo, tot, pct) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(promo >= 0 && promo <= tot)
    assert(math.abs(pct - 100.0 * promo / tot) < 1e-9)
  }

  test("supplier-parts NOT IN plans as a null-aware anti join, counts bounded") {
    val df = q("q_sql_supplier_parts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(1500))
    val nSupp = Tables.supplier(spark, sf)
      .filter(col("s_acctbal") >= 0).count()
    df.collect().foreach(r => assert(r.getLong(3) <= nSupp))
  }

  test("waiting-supplier matches an independent window-based formulation") {
    // alternative derivation: per (order, supplier) max ship; per order
    // the top-2 of those maxes; a line l1 waits iff its order is F,
    // another supplier exists, and no other supplier shipped later —
    // i.e. l1.shipdate >= max over OTHER suppliers' per-supplier max
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val perSupp = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("smax"))
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("smax").desc)
    val ranked = perSupp
      .withColumn("mx1", max(col("smax")).over(Window.partitionBy(col("l_orderkey"))))
      .withColumn("rk", row_number().over(w.orderBy(col("smax").desc, col("l_suppkey"))))
    val top2 = ranked.filter(col("rk") <= 2)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("nTop"),
        max(when(col("rk") === 1, col("smax"))).as("m1"),
        max(when(col("rk") === 1, col("l_suppkey"))).as("s1"),
        max(when(col("rk") === 2, col("smax"))).as("m2"))
    val nSupPerOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("nsupp"))
    val f = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val waits = li
      .join(top2, "l_orderkey").join(nSupPerOrder, "l_orderkey")
      .join(f, col("l_orderkey") === col("o_orderkey"))
      .filter(col("nsupp") >= 2)
      .withColumn("maxOther",
        when(col("l_suppkey") === col("s1"), col("m2")).otherwise(col("m1")))
      .filter(col("l_shipdate") >= col("maxOther"))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
    // note: maxOther via top-2 works because ties at rank 1 mean the
    // other tied supplier's max equals m1 — the otherwise() branch
    val expect = waits.join(
        Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = q("q_sql_waiting_supplier")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("LOO encoding: per-segment mean of encodings equals the segment mean") {
    val enc = q("q_target_encode")
    val plan = enc.queryExecution.executedPlan.toString
    // the 5-key encoder must ride broadcast joins, never a 5-partition
    // window shuffle of the fact table
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("Window"),
      plan.take(1500))
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val segMean = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(avg(col("o_totalprice")).as("m"))
    val looMean = enc.groupBy(col("segment")).agg(avg(col("loo_enc")).as("lm"))
    looMean.join(segMean, "segment").collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-6,
        s"${r.getString(0)}: mean(loo)=${r.getDouble(1)} segMean=${r.getDouble(2)}")
    }
  }

  test("feature hashing: bounded buckets, token conservation, known md5 bucket") {
    val fh = q("q_feature_hash").collect()
    assert(fh.forall(r => r.getLong(1) >= 0 && r.getLong(1) < TrainPrepSpecUtil.B))
    val totalTokens = Tables.documents(spark, sf)
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("t"))
      .filter(col("t") =!= "").count()
    assert(fh.map(_.getLong(2)).sum == totalTokens)
    // hand-computed: md5("vector") = 6601... → ascii('6')*256+ascii('6') % 64
    val m = java.security.MessageDigest.getInstance("MD5")
      .digest("vector".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expB = (m(0).toInt * 256 + m(1).toInt) % TrainPrepSpecUtil.B
    assert(graft.ops.TrainPrep.HashBuckets == TrainPrepSpecUtil.B)
    // the operator's bucket formula for the literal token must equal expB
    import spark.implicits._
    val one = Seq(("x", "vector")).toDF("source", "text")
    val b = one.select(
      ((ascii(substring(md5(col("text").cast("binary")), 1, 1)) * lit(256) +
        ascii(substring(md5(col("text").cast("binary")), 2, 1))) % lit(64))
        .cast("long").as("b")).head.getLong(0)
    assert(b == expB)
  }

  test("degree distribution conserves pairs and customers") {
    val dd = q("q_degree_dist").collect()
    val pairs = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct().count()
    val buyers = Tables.orders(spark, sf).select(col("o_custkey")).distinct().count()
    assert(dd.map(r => r.getLong(0) * r.getLong(1)).sum == pairs)
    assert(dd.map(_.getLong(1)).sum == buyers)
  }

  test("seasonality: n-weighted mean of the index is 1") {
    val rows = q("q_seasonality").collect()
    assert(rows.nonEmpty && rows.length <= 7)
    val n = rows.map(_.getLong(1)).sum.toDouble
    val weighted = rows.map(r => r.getLong(1) * r.getDouble(3)).sum / n
    assert(math.abs(weighted - 1.0) < 1e-9, s"weighted index $weighted")
  }

  test("welch t-test: one series recomputed in plain scala, df bounds hold") {
    val rows = q("q_ab_ttest").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb) = (r.getLong(1), r.getLong(2))
      val (ma, mb, t, df) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(math.signum(t) == math.signum(ma - mb) || t == 0.0)
      assert(df >= math.min(na, nb) - 1 && df <= na + nb - 2,
        s"df $df outside [${math.min(na, nb) - 1}, ${na + nb - 2}]")
    }
    // independent recompute for one series off the raw rows
    val et = rows.head.getString(0)
    val raw = Tables.events(spark, sf)
      .filter(col("event_type") === et)
      .select((pmod(col("user_id"), lit(2)) === 0).as("a"), col("value"))
      .collect().map(r => (r.getBoolean(0), BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    def stats(xs: Seq[BigDecimal]) = {
      val n = xs.length.toDouble
      val s = xs.sum.toDouble; val q2 = xs.map(x => (x * x).toDouble).sum
      (n, s / n, (q2 - s * s / n) / (n - 1.0))
    }
    val (naR, maR, vaR) = stats(raw.filter(_._1).map(_._2).toSeq)
    val (nbR, mbR, vbR) = stats(raw.filterNot(_._1).map(_._2).toSeq)
    val tR = (maR - mbR) / math.sqrt(vaR / naR + vbR / nbR)
    val got = rows.head
    assert(got.getLong(1) == naR.toLong && got.getLong(2) == nbR.toLong)
    assert(math.abs(got.getDouble(5) - tR) < 1e-9, s"t ${got.getDouble(5)} vs $tR")
  }

  test("trend OLS: r2 in [0,1] and slope recomputed from micro-tick moments") {
    val rows = q("q_trend_ols").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
    val et = rows.head.getString(0)
    // independent daily recompute at the same fixed 1e-6 tick
    val daily = Tables.events(spark, sf).filter(col("event_type") === et)
      .select((unix_micros(date_trunc("DAY", col("ts"))) / lit(86400000000L))
        .cast("long").as("x"), col("value"))
      .collect().groupBy(_.getLong(0)).toSeq
      .map { case (x, rs) =>
        val sv = rs.map(r => BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
        (x, ((sv * 1000000).toBigInt / rs.length).toLong)
      }
    val n = daily.length.toDouble
    val sx = daily.map(_._1).sum.toDouble
    val sxx = daily.map(p => p._1 * p._1).sum.toDouble
    val sy = daily.map(_._2).sum.toDouble
    val sxy = daily.map(p => p._1 * p._2).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx) / 1000000.0
    assert(math.abs(rows.head.getDouble(2) - slope) < 1e-12,
      s"slope ${rows.head.getDouble(2)} vs $slope")
  }

  test("funnel paths: counts conserve against per-user activity") {
    val rows = q("q_funnel_paths").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // total trigram positions across ALL paths = Σ_u max(0, n_u - 2);
    // the top-10 can't exceed it
    val totalPos = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(sum(greatest(col("n") - 2, lit(0L)))).head.getLong(0)
    assert(counts.sum <= totalPos)
  }

  test("lateness histogram conserves events and buckets are non-negative") {
    val rows = q("q_lateness").collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.forall(_.getLong(0) >= 0L))
    // the md5-shuffled arrival must actually produce disorder (the
    // in-order audit reads all-zero — the degenerate case this op
    // exists to avoid)
    assert(rows.length > 1, "expected nonzero lateness under hash arrival")
  }

  test("key skew: shares and ratios are consistent with the count table") {
    val rows = q("q_key_skew").collect()
    assert(rows.length == 5)
    val total = Tables.lineitem(spark, sf).count().toDouble
    rows.foreach { r =>
      val cnt = r.getLong(1).toDouble
      assert(math.abs(r.getDouble(2) - cnt / total) < 1e-15)
      assert(r.getLong(1) <= r.getLong(5), "top-k count cannot exceed max_cnt")
      assert(math.abs(r.getDouble(3) - r.getDouble(2) * r.getLong(4)) < 1e-9)
    }
    assert(rows.head.getLong(1) == rows.head.getLong(5),
      "first row must be the hottest key")
  }

  test("equi-depth bins: near-equal counts, monotone edges, conservation") {
    val rows = q("q_equidepth_bins").collect()
    val byType = rows.groupBy(_.getString(0))
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total)
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val counts = sorted.map(_.getLong(2))
      assert(counts.max - counts.min <= 1, s"ntile balance: ${counts.toSeq}")
      // hi of bin k <= lo of bin k+1 (edges partition the sorted order)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(4) <= b.getDouble(3))
        case _ =>
      }
    }
  }

  test("equi-depth closed form equals Spark's own ntile bit-for-bit") {
    // the operator streams a row_number + integer closed form instead
    // of ntile's whole-partition buffer (36x at gen100x); semantics
    // must stay EXACTLY ntile's large-buckets-first assignment
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val viaNtile = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("bin", ntile(10).over(w).cast("long"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("lo"),
        max(col("value")).as("hi"))
      .orderBy(col("event_type"), col("bin"))
      .collect().toSeq
    val viaClosedForm = q("q_equidepth_bins").collect().toSeq
    assert(viaClosedForm == viaNtile)
  }

  test("seriesRanks chunked path is row-identical to the plain window") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val plain = e.withColumn("i", row_number().over(w).cast("long"))
      .select(col("event_type"), col("event_id"), col("i"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // threshold=0 forces the value-chunked prefix-offset path
    val chunked = graft.ops.Chunked
      .seriesRanks(e, "event_type", "value", "event_id", threshold = 0L)
      .select(col("event_type"), col("event_id"), col("i"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(chunked == plain)
  }

  test("skewness/kurtosis: one series recomputed exactly in plain scala") {
    val rows = q("q_skew_kurtosis").collect()
    val et = rows.head.getString(0)
    val vs = Tables.events(spark, sf).filter(col("event_type") === et)
      .select(col("value")).collect()
      .map(r => BigDecimal(r.getDouble(0)).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val n = vs.length.toDouble
    val m = (vs.sum.toDouble) / n
    val r2 = vs.map(v => (v * v).toDouble).sum / n
    val r3 = vs.map(v => (v * v * v).toDouble).sum / n
    val r4 = vs.map(v => (v * v * v * v).toDouble).sum / n
    val c2 = r2 - m * m
    val skew = (r3 - 3.0 * m * r2 + 2.0 * m * m * m) / math.sqrt(c2 * c2 * c2)
    val kurt = (r4 - 4.0 * m * r3 + 6.0 * m * m * r2 - 3.0 * m * m * m * m) / (c2 * c2) - 3.0
    assert(math.abs(rows.head.getDouble(3) - skew) < 1e-9,
      s"skew ${rows.head.getDouble(3)} vs $skew")
    assert(math.abs(rows.head.getDouble(4) - kurt) < 1e-9,
      s"kurt ${rows.head.getDouble(4)} vs $kurt")
  }

  test("gini: bounded in [0,1) and recomputed from sorted cents") {
    val rows = q("q_gini").collect()
    rows.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0))
    val et = rows.head.getString(0)
    val cents = Tables.events(spark, sf).filter(col("event_type") === et)
      .select(col("value"), col("event_id")).collect()
      .map(r => ((BigDecimal(r.getDouble(0)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact, r.getLong(1)))
      .sortBy(identity).map(_._1)
    val n = cents.length.toDouble
    val siv = cents.zipWithIndex.map { case (v, i) => BigInt(i + 1) * v }.sum
    val gini = 2.0 * siv.toDouble / (n * cents.map(BigInt(_)).sum.toDouble) - (n + 1.0) / n
    assert(math.abs(rows.head.getDouble(2) - gini) < 1e-12,
      s"gini ${rows.head.getDouble(2)} vs $gini")
  }

  test("zipf fit: rank count pinned, r2 in [0,1], flat slope on the uniform fixture") {
    val r = q("q_zipf_fit").head
    val vocab = Tables.documents(spark, sf)
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("t"))
      .filter(col("t") =!= "").distinct().count()
    assert(r.getLong(0) == math.min(vocab, 1000L))
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    // the fixture vocabulary is uniform by construction — the fit must
    // read nearly flat (natural text would sit near -1; the deviation
    // is the corpus-health signal)
    assert(math.abs(r.getDouble(1)) < 0.5, s"slope ${r.getDouble(1)}")
  }

  test("wide sign-band blocking finds planted near-dups past the size threshold") {
    // 21k synthetic vectors trip the >20k wide-band path (4 tables x
    // 16 bits); 50 planted copies with tiny sign-preserving noise must
    // all surface as candidates, and random collisions must stay ~256x
    // below the narrow geometry's L*n^2/2^8 expectation
    import spark.implicits._
    graft.functions.Native.register(spark)
    val n = 21000
    // hash-based coordinates — sign-uniform (a sinusoid here produces
    // long same-sign runs, hot buckets, and a quadratic candidate set)
    val base = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), j -> " +
        "CAST(pmod(xxhash64(id * 64 + j), 2001) - 1000 AS FLOAT))").as("embedding"))
    val planted = spark.range(50).select((col("id") + n).as("vec_id"),
      expr("transform(sequence(0, 63), j -> " +
        "CAST((pmod(xxhash64(id * 64 + j), 2001) - 1000) * 1.0001 AS FLOAT))").as("embedding"))
    val cands = graft.ops.Similarity
      .signBandCandidates(base.unionByName(planted))
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 50).foreach { i =>
      assert(cands.contains((i.toLong, (i + n).toLong)),
        s"planted pair ($i, ${i + n}) missed by wide banding")
    }
    // wide geometry: expected random collisions ≈ 4 * n^2 / 2^16 / 2
    // ≈ 13.5k; the narrow 8-bit geometry would expect ≈ 3.4M
    assert(cands.size < 200000, s"candidate volume ${cands.size}")
  }

  test("tfidf: ranks are 1..3 per doc, scores non-increasing, df joined unbroadcast") {
    val df = q("q_text_tfidf")
    val plan = df.queryExecution.executedPlan.toString
    // tf (bounded doc slice) must be the broadcast side; the vocabulary
    // df table must stream
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }
}

object TrainPrepSpecUtil { val B = 64L }
