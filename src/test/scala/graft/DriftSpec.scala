package graft

import org.apache.spark.sql.functions._

/** Laws for the drift monitors and the round-8c statistics wave
  * (KS / PSI / robust scale / ACF / attribution / TF-IDF keywords /
  * source entropy). The DuckDB oracle pins exact values; these pin
  * the mathematical contracts that must hold at ANY scale. */
class DriftSpec extends SparkSpec {

  test("ks_drift: statistic is a [0,1] sup-norm and both halves are populated") {
    val rows = q("q_ks_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ks = r.getAs[Double]("ks_stat")
      assert(ks >= 0.0 && ks <= 1.0)
      assert(r.getAs[Long]("n_ref") > 0 && r.getAs[Long]("n_cur") > 0)
    }
  }

  test("psi_drift: dense 10-bin frame, probabilities in (0,1), psi = Σ terms") {
    val rows = q("q_psi_drift").collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("bin")).sorted.toSeq == (0L to 9L))
      rs.foreach { r =>
        assert(r.getAs[Double]("p_ref") > 0.0 && r.getAs[Double]("p_ref") < 1.0)
        assert(r.getAs[Double]("p_cur") > 0.0 && r.getAs[Double]("p_cur") < 1.0)
      }
      // the per-type psi column is the quantized sum of the 10 terms
      val total = rs.map(r => BigDecimal(r.getAs[Double]("psi_term"))).sum
      rs.foreach(r =>
        assert((BigDecimal(r.getAs[Double]("psi")) - total).abs < BigDecimal("1e-7")))
    }
  }

  test("robust_scale: per-group median lands on 0 and IQR on 1") {
    val st = q("q_robust_scale").groupBy(col("event_type"))
      .agg(expr("percentile(robust_z, 0.5)").as("med"),
        (expr("percentile(robust_z, 0.75)") - expr("percentile(robust_z, 0.25)"))
          .as("iqr"))
      .collect()
    assert(st.nonEmpty)
    st.foreach { r =>
      assert(math.abs(r.getAs[Double]("med")) < 1e-9)
      assert(math.abs(r.getAs[Double]("iqr") - 1.0) < 1e-9)
    }
  }

  test("ts_acf: correlations bounded, aligned-pair count shrinks by one per lag") {
    val rows = q("q_ts_acf").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => {
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12)
    })
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val byLag = rs.map(r => r.getAs[Int]("lag_k") -> r.getAs[Long]("n")).toMap
      (2 to 5).foreach(l => assert(byLag(l) == byLag(l - 1) - 1))
    }
  }

  test("attribution: one row per purchase; credited click strictly precedes it") {
    val e = Tables.events(spark, sf)
    val purchases = e.filter(col("event_type") === "purchase").count()
    val out = q("q_attribution")
    assert(out.count() == purchases)
    // re-derive each credited click's position: it must be a click of the
    // same user with a strictly smaller (ts, event_id)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("attributed_click"),
        col("user_id").as("cu"), unix_micros(col("ts")).as("cus"))
    val attributed = out.filter(col("attributed_click").isNotNull)
    val joined = attributed.join(clicks, Seq("attributed_click")).collect()
    assert(joined.length == attributed.count())
    joined.foreach { r =>
      assert(r.getAs[Long]("cu") == r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("gap_us") > 0)
    }
  }

  test("text_keywords: ≤3 ranked keywords per doc, scores non-increasing") {
    val rows = q("q_text_keywords").collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getAs[Int]("rnk"))
      assert(ranked.map(_.getAs[Int]("rnk")).toSeq == (1 to ranked.length))
      assert(ranked.length <= 3)
      ranked.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("score") >= b.getAs[Double]("score"))
        case _ =>
      }
    }
  }

  test("embed_drift: one row per label, cosine bounded, halves partition the label") {
    val e = Tables.embeddings(spark, sf)
    val perLabel = e.groupBy(col("label")).count().collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("count")).toMap
    val rows = q("q_embed_drift").collect()
    assert(rows.length == perLabel.size)
    rows.foreach { r =>
      val cos = r.getAs[Double]("centroid_cos")
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur") ==
        perLabel(r.getAs[Int]("label")))
    }
  }

  test("lm_perplexity: one row per multi-token doc, ppl ≥ 1, n_bigrams = tokens − 1") {
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"),
        (size(split(lower(trim(col("text"))), "\\s+")) - 1).as("nb"))
      .filter(col("nb") >= 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("nb")).toMap
    val rows = q("q_lm_perplexity").collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == expected(r.getAs[Long]("doc_id")))
      assert(r.getAs[Double]("avg_nll") >= 0.0)
      assert(r.getAs[Double]("ppl") >= 1.0 - 1e-9)
    }
  }

  test("lm_perplexity: shuffle-join LM regime is row-for-row the broadcast regime") {
    // broadcastMaxDocs = 0 forces the past-budget plan (LM tables join
    // as regular exchanges instead of driver-built hash relations); the
    // join strategy must never touch values
    val bc = q("q_lm_perplexity").collect().map(_.toString).sorted
    val sh = graft.ops.TextOps.lmPerplexity(spark, sf, broadcastMaxDocs = 0L)
      .collect().map(_.toString).sorted
    assert(bc.sameElements(sh))
  }

  test("embed_outliers: top-10 by unit error, kept set is the extreme tail") {
    val rows = q("q_embed_outliers").collect()
    assert(rows.length == math.min(10L, Tables.embeddings(spark, sf).count()))
    rows.foreach(r => assert(r.getAs[Double]("unit_err") ==
      math.abs(r.getAs[Double]("norm2") - 1.0)))
    val kept = rows.map(_.getAs[Double]("unit_err"))
    val all = graft.ops.Drift.embedNormOutliers(spark, sf, k = Int.MaxValue)
      .collect().map(_.getAs[Double]("unit_err")).sorted.reverse
    assert(kept.min >= all.drop(rows.length).headOption.getOrElse(0.0) - 1e-15)
  }

  test("funnel_time: gaps positive, median ≤ p90, converted ≤ funnel purchasers") {
    val r = q("q_funnel_time").head()
    assert(r.getAs[Long]("n_converted") > 0)
    assert(r.getAs[Double]("median_hours") > 0.0)
    assert(r.getAs[Double]("median_hours") <= r.getAs[Double]("p90_hours"))
  }

  test("source_entropy: 0 ≤ H ≤ ln(distinct tokens) per source") {
    val rows = q("q_source_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_nats")
      val cap = math.log(r.getAs[Long]("n_types").toDouble)
      assert(h >= -1e-8 && h <= cap + 1e-8)
    }
  }
}
