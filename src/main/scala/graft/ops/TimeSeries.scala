package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Time-series similarity search over the event streams (north-star
  * extension; cf. "Time Series Similarity Search for Streaming Data in
  * Distributed Systems", EDBT 2019 — PAPERS.md): find the k stride-1
  * windows whose SHAPE most resembles a query window, scored by Pearson
  * correlation (equivalent to z-normalized similarity, but computable
  * from dot products and means alone — no per-element normalization
  * pass, and bit-exact against the SQL oracle because every term reuses
  * the fixed-order fold primitives).
  *
  * Scale shape: windows materialize per series behind ONE shuffle on the
  * series key (the same frame machinery as slidingWindowStats); the
  * query window is one broadcast row; scoring is a map; the top-k is a
  * TakeOrderedAndProject. Nothing global ever sorts.
  */
object TimeSeries {

  /** Stride-1 length-w windows per series with their sum and
    * sum-of-squares (for mean/variance), computed with the bit-exact
    * primitives: sum = left-fold aggregate (== DuckDB list_sum), sum of
    * squares = native dot(win, win). */
  private def windows(s: SparkSession, d: String, w: Int): DataFrame = {
    graft.functions.Native.register(s)
    // frames via Chunked.frames — bounded chunk tasks per series instead
    // of one sort task per series (same skew fix as slidingWindowStats)
    Chunked.frames(
        Tables.events(s, d).select(col("event_id"), col("event_type"),
          col("ts"), col("value")),
        d, "event_type", "ts", "event_id", w) { fr =>
        Seq(collect_list(col("value")).over(fr).as("win"))
      }
      .select(col("event_id"), col("event_type"), col("win"))
      // sum as dot(win, ones): bit-identical to the left-fold sum
      // (x * 1.0 == x exactly, same accumulation order) but codegen'd —
      // an interpreted aggregate() HOF here gets INLINED once per use
      // site when the variance filter pushes down (the known HOF trap)
      .withColumn("sm", graft.functions.Native.dot(
        col("win").cast(ArrayType(DoubleType)), array_repeat(lit(1.0), w)))
      .withColumn("ss", graft.functions.Native.dot(
        col("win").cast(ArrayType(DoubleType)), col("win").cast(ArrayType(DoubleType))))
  }

  /** The query window — the complete window holding the globally
    * smallest event_id — derived WITHOUT materializing the corpus-wide
    * window set: the previous formulation evaluated the full frames
    * pass TWICE per run (once under the broadcast's `orderBy(event_id)
    * .limit(1)`, once for the scored side — a broadcast subtree is its
    * own job and shares nothing with the main plan). This derivation
    * replaces the first pass with three BOUNDED jobs over the raw scan:
    *   1. per-series w-th smallest (ts, event_id) via the bounded
    *      [[graft.functions.TopKByAgg]] on NEGATED keys (largest
    *      negated = smallest original; both keys are far from
    *      Long.MinValue, so negation is exact) — an event has a
    *      complete window iff its (ts, id) key is ≥ this threshold;
    *   2. the anchor: min event_id among threshold-qualified events —
    *      a broadcast join of the ~|series| threshold rows + one
    *      TakeOrdered(1);
    *   3. the anchor's trailing w values — one filtered TakeOrdered(w).
    * The window values return in chronological order; sm/ss accumulate
    * on the driver in the SAME ascending left-fold order as the scored
    * side's `Native.dot` (and DuckDB's `list_sum`), so every scored
    * correlation is bit-identical to the two-pass formulation. Values
    * ride exactly (ts-micros and ids are < 2^53, lossless in the
    * aggregate's double slot). */
  private[graft] def queryWindowRow(s: SparkSession, d: String,
      w: Int): Option[(Array[Double], Double, Double)] = {
    import graft.functions.Native
    Native.register(s)
    val ev = Tables.events(s, d).select(col("event_type"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("value"))
    val th = ev.groupBy(col("event_type")).agg(
        Native.topKBy(-col("ts_us"), -col("event_id"),
          col("ts_us").cast(DoubleType), w).as("th_ts_arr"),
        Native.topKBy(-col("ts_us"), -col("event_id"),
          col("event_id").cast(DoubleType), w).as("th_id_arr"))
      .filter(size(col("th_ts_arr")) === w)
      .select(col("event_type"),
        element_at(col("th_ts_arr"), w).cast("long").as("th_ts"),
        element_at(col("th_id_arr"), w).cast("long").as("th_id"))
    val anchor = ev.join(broadcast(th), "event_type")
      .filter(col("ts_us") > col("th_ts") ||
        (col("ts_us") === col("th_ts") && col("event_id") >= col("th_id")))
      .orderBy(col("event_id")).limit(1)
      .select(col("event_type"), col("event_id"), col("ts_us"))
      .collect()
    if (anchor.isEmpty) None
    else {
      val et = anchor(0).getString(0)
      val eid = anchor(0).getLong(1)
      val ts0 = anchor(0).getLong(2)
      val win = ev.filter(col("event_type") === et &&
          (col("ts_us") < ts0 ||
            (col("ts_us") === ts0 && col("event_id") <= eid)))
        .orderBy(col("ts_us").desc, col("event_id").desc).limit(w)
        .select(col("value")).collect().map(_.getDouble(0)).reverse
      var sm = 0.0
      var ss = 0.0
      win.foreach { v => sm += v * 1.0; ss += v * v }
      Some((win, sm, ss))
    }
  }

  /** Top-k windows by Pearson correlation with the query window (the
    * complete window holding the globally smallest event_id — a
    * deterministic, oracle-expressible pick standing in for a
    * user-supplied pattern; derived by [[queryWindowRow]] in three
    * bounded jobs, so the frames pass materializes ONCE). Windows with
    * zero variance are excluded on both sides identically. The
    * self-match ranks first with corr 1 by construction — kept,
    * deterministic. */
  def searchByShape(s: SparkSession, d: String, w: Int = 20,
      k: Int = 25): DataFrame = {
    val wins = windows(s, d, w)
    def empty = wins
      .select(col("event_id"), col("event_type"), lit(0.0).as("corr"))
      .limit(0)
    queryWindowRow(s, d, w) match {
      case None => empty
      case Some((qwin, qsm, qss)) =>
        val wd   = w.toDouble
        val qm   = qsm / wd
        val qVar = qss - wd * qm * qm
        if (!(qVar > 0)) empty
        else {
          val wdC = lit(wd)
          val m   = col("sm") / wdC
          val qwinCol = array(qwin.map(lit(_)): _*).cast(ArrayType(DoubleType))
          val num = graft.functions.Native.dot(
            col("win").cast(ArrayType(DoubleType)), qwinCol) - wdC * m * lit(qm)
          val den = sqrt(col("ss") - wdC * m * m) * lit(math.sqrt(qVar))
          wins
            .filter(col("ss") - wdC * m * m > 0)
            .select(col("event_id"), col("event_type"), (num / den).as("corr"))
            .orderBy(col("corr").desc, col("event_id"))
            .limit(k)
            .orderBy(col("event_id"))
        }
    }
  }

  /** Closed-form OLS trend per series — slope / intercept / R² of the
    * daily mean against the epoch-day index, the linear-trend fit the
    * reference's forecaster implies but never states.
    *
    * Determinism is STRUCTURAL, not probabilistic: the daily mean is
    * held at a fixed 10⁻⁶ tick via INTEGER division (exact-decimal sum
    * × 10⁶ `div` count — truncating integral division is bit-identical
    * on both engines, unlike a double→decimal quantization whose
    * shortest-repr vs binary rounding CAN split at a .5·10⁻⁸ boundary
    * — one 'view' day hit exactly that in testing). All five moment
    * sums are then exact integers (Σy², whose terms can pass 2⁶³,
    * rides DECIMAL(38,0)), and the closed form evaluates one shared
    * IEEE tree on micro-unit moments, rescaling slope/intercept by
    * 10⁻⁶ at the end (R² is scale-invariant). Everything map-side
    * combines; no windows, no per-series sort. */
  def trendOls(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        (unix_micros(date_trunc("DAY", col("ts"))) / lit(86400000000L))
          .cast(LongType).as("x"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      .groupBy(col("event_type"), col("x"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("nd"))
      .select(col("event_type"), col("x"),
        // Spark DIV and DuckDB // both truncate toward zero (verified
        // -7//2 = -3 in DuckDB), so the tick is sign-safe cross-engine
        expr("CAST(sv * 1000000 AS BIGINT) DIV nd").as("y"))
    val d38 = DecimalType(38, 0)
    val g = daily.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y").cast(d38) * col("y").cast(d38)).as("syy"))
    val n = col("n").cast(DoubleType)
    val sx = col("sx").cast(DoubleType); val sxx = col("sxx").cast(DoubleType)
    val sy = col("sy").cast(DoubleType); val sxy = col("sxy").cast(DoubleType)
    val syy = col("syy").cast(DoubleType)
    val covn = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    g.select(col("event_type"), col("n").as("n_days"),
        (covn / varx / lit(1000000.0)).as("slope"),
        ((sy - covn / varx * sx) / n / lit(1000000.0)).as("intercept"),
        (covn * covn / (varx * vary)).as("r2"))
      .orderBy(col("event_type"))
  }
}
