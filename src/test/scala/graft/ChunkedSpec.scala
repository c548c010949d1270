package graft

import graft.ops.Chunked
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Overlapped time-chunk repartitioning (the stride-1 window skew fix):
  * chunked frames must be ROW-IDENTICAL to the plain per-series window
  * while actually splitting a hot series into >1 bounded chunk. */
class ChunkedSpec extends SparkSpec {

  /** Each generated property fixture gets a fresh corpus-identity tag —
    * the caches key on the tag, so reusing one across fixtures would
    * serve a stale chunk plan (exactly the collision the string key is
    * designed to make impossible for real corpus paths). */
  private val propFixtureId = new java.util.concurrent.atomic.AtomicInteger(0)

  test("mergeChunks: every non-final chunk reaches minRows, order preserved") {
    val counts = Seq(0 -> 10L, 1 -> 10L, 2 -> 10L, 3 -> 10L, 4 -> 10L)
    val m = Chunked.mergeChunks(counts, minRows = 25L)
    // greedy: {0,1,2} -> 0 (30 rows), {3,4} -> trailing 20 < 25 folds back
    assert(m.values.toSet.size >= 1)
    val byFc = counts.groupBy { case (cc, _) => m(cc) }
      .view.mapValues(_.map(_._2).sum).toMap
    val maxFc = byFc.keys.max
    byFc.foreach { case (fc, n) => if (fc != maxFc) assert(n >= 25L) }
    // order-preserving: cc1 < cc2 => fc(cc1) <= fc(cc2)
    counts.map(_._1).sliding(2).foreach {
      case Seq(a, b) => assert(m(a) <= m(b)); case _ =>
    }
  }

  test("mergeChunks: undersized trailing chunk folds into its predecessor") {
    val m = Chunked.mergeChunks(Seq(0 -> 100L, 1 -> 3L), minRows = 50L)
    assert(m(0) == 0 && m(1) == 0)
    val m2 = Chunked.mergeChunks(Seq(0 -> 100L, 1 -> 60L), minRows = 50L)
    assert(m2(0) == 0 && m2(1) == 1)
  }

  /** 2-series skewed fixture: one hot series (n rows), one cold. */
  private def skewed(hot: Int, cold: Int) = {
    import spark.implicits._
    val mk = (n: Int, series: String, base: Long) =>
      (0 until n).map { i =>
        (base + i, series,
          new java.sql.Timestamp(1700000000000L + i * 1000L),
          math.sin(i * 0.37) * 50 + 100)
      }
    (mk(hot, "hot", 0L) ++ mk(cold, "cold", 1000000L))
      .toDF("event_id", "event_type", "ts", "value")
  }

  test("chunked frames == plain window frames on a skewed fixture, and the hot series splits") {
    val k = 5
    val df = skewed(hot = 3000, cold = 40)
    val plainW = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-(k - 1), 0)
    val plain = df.select(col("event_id"),
        count(lit(1)).over(plainW).as("c"),
        sum(col("value")).over(plainW).as("s"),
        collect_list(col("value")).over(plainW).as("w"))
      .filter(col("c") === k).drop("c")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Double](2).toList)).toMap
    val chunked = Chunked.frames(df, "fixture:skew-3000x40", "event_type", "ts",
        "event_id", k, minChunkRows = 100, nBoundaries = 16) { w =>
        Seq(sum(col("value")).over(w).as("s"),
          collect_list(col("value")).over(w).as("w"))
      }
      .select(col("event_id"), col("s"), col("w"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Double](2).toList)).toMap
    assert(chunked.keySet == plain.keySet)
    chunked.foreach { case (id, (s, w)) =>
      val (ps, pw) = plain(id)
      assert(w == pw, s"window list mismatch at $id")
      assert(math.abs(s - ps) < 1e-9)
    }
    // the scale claim: the hot series runs as >1 final chunk, every
    // non-final chunk big enough to donate a full k-1 warm-up
    val (ccExpr, mapping) = Chunked.chunkPlan(df, "event_type", "ts",
      minRows = 100L, nBoundaries = 16)
    val hotChunks = mapping.filter(col("event_type") === "hot")
      .select(col("_fc")).distinct().count()
    assert(hotChunks > 1, s"hot series should split, got $hotChunks chunk(s)")
    val sizes = df.withColumn("_cc", ccExpr)
      .join(broadcast(mapping), Seq("event_type", "_cc"))
      .groupBy(col("event_type"), col("_fc")).count()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    sizes.groupBy(_._1).foreach { case (_, chunks) =>
      val maxFc = chunks.map(_._2).max
      chunks.foreach { case (_, fc, n) => if (fc != maxFc) assert(n >= k - 1) }
    }
  }

  test("property: chunked == plain on random fixtures (ties, tiny chunks, any k)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    // deliberately nasty: duplicate timestamps (ties decided by id),
    // minChunkRows small enough that chunk merges and warm-ups matter,
    // series lengths straddling k
    val gen = for {
      k        <- Gen.choose(1, 6)
      nSeries  <- Gen.choose(1, 3)
      sizes    <- Gen.listOfN(nSeries, Gen.choose(0, 120))
      tsSteps  <- Gen.listOfN(sizes.sum, Gen.choose(0L, 3L)) // 0 ⇒ tie
      minRows  <- Gen.oneOf(4L, 16L, 64L)
      nBounds  <- Gen.oneOf(4, 8)
    } yield (k, sizes, tsSteps, minRows, nBounds)
    val prop = forAll(gen) { case (k, sizes, tsSteps, minRows, nBounds) =>
      var id = 0L
      var t = 1700000000000L
      val steps = tsSteps.iterator
      val rows = sizes.zipWithIndex.flatMap { case (n, si) =>
        (0 until n).map { _ =>
          id += 1
          t += (if (steps.hasNext) steps.next() * 1000L else 1000L)
          (id, s"s$si", new java.sql.Timestamp(t), (id % 17).toDouble)
        }
      }
      rows.isEmpty || {
        val df = rows.toDF("event_id", "event_type", "ts", "value")
        val plainW = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-(k - 1), 0)
        val plain = df.select(col("event_id"),
            count(lit(1)).over(plainW).as("c"),
            collect_list(col("value")).over(plainW).as("w"))
          .filter(col("c") === k)
          .collect().map(r => r.getLong(0) -> r.getSeq[Double](2).toList).toMap
        val chunked = Chunked.frames(df, s"fixture:prop-${propFixtureId.incrementAndGet()}",
            "event_type", "ts", "event_id", k,
            minChunkRows = minRows, nBoundaries = nBounds) { w =>
            Seq(collect_list(col("value")).over(w).as("w"))
          }
          .select(col("event_id"), col("w"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
        chunked == plain
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("boundary cache is frame-agnostic: two frame families over one corpus stay correct") {
    // the boundary-set cache key deliberately OMITS the caller's frame
    // columns (the set depends only on corpus/series/time/id/k); this
    // guards the invariant by running two different frame families over
    // the same fixture+k — the second call reuses the first's cached
    // boundary rows and must still match its own plain-window truth
    val k = 7
    val df = skewed(hot = 2000, cold = 60)
    val plainW = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-(k - 1), 0)
    def plain(cols: Seq[(String, org.apache.spark.sql.Column)]) =
      df.select(col("event_id") +: (count(lit(1)).over(plainW).as("c") +:
          cols.map { case (n, c) => c.as(n) }): _*)
        .filter(col("c") === k).drop("c")
    def chunked(cols: (org.apache.spark.sql.expressions.WindowSpec => Seq[org.apache.spark.sql.Column])) =
      Chunked.frames(df, "fixture:skew-2000x60", "event_type", "ts", "event_id", k,
        minChunkRows = 100, nBoundaries = 16)(cols)
    // family 1: sum
    val s1 = chunked(w => Seq(sum(col("value")).over(w).as("s")))
      .select("event_id", "s").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val p1 = plain(Seq("s" -> sum(col("value")).over(plainW))).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("s")).toMap
    assert(s1.keySet == p1.keySet && s1.forall { case (id, v) => math.abs(v - p1(id)) < 1e-9 })
    // family 2 (cache hit): min/max — different frame columns entirely
    val s2 = chunked(w => Seq(min(col("value")).over(w).as("mn"),
        max(col("value")).over(w).as("mx")))
      .select("event_id", "mn", "mx").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val p2 = plain(Seq("mn" -> min(col("value")).over(plainW),
        "mx" -> max(col("value")).over(plainW)))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("mn"), r.getAs[Double]("mx"))).toMap
    assert(s2 == p2)
  }

  test("chunked sliding stats on real events equal the plain-window formulation") {
    val k = 60
    val plainW = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-(k - 1), 0)
    val plain = Tables.events(spark, sf)
      .select(col("event_id"),
        count(lit(1)).over(plainW).as("c"),
        min(col("value")).over(plainW).as("mn"),
        max(col("value")).over(plainW).as("mx"))
      .filter(col("c") === k)
      .select(col("event_id"), col("mn"), col("mx"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val viaQuery = q("q_sliding_windows")
      .select(col("event_id"), col("w_min"), col("w_max"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(viaQuery == plain)
  }
}
