package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation operators (SURVEY.md §2.4).
  *
  * The reference aggregates driver-side in numpy over collected lists
  * (`stream_consumer.py:110-111`, `batch_processor.py:62-65`); here every
  * aggregate is a native Catalyst HashAggregate with map-side partial
  * aggregation — at 100 TB only one pre-aggregated row per (group ×
  * partition) crosses the shuffle.
  *
  * Oracle-parity note: double summation order differs between engines
  * (Spark sums per-partition, DuckDB in its own order), so a float sum is
  * not bit-reproducible. All compared sums go through DECIMAL(18,2) —
  * exact, order-independent — then cast back to double. Raw min/max/count
  * pass through untouched (exact in any engine).
  */
object Aggregates {

  /** sum(x::decimal(18,2))::double — exact, engine-order-independent. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact decimal revenue term: extendedprice * (1 - discount). */
  def revenueTerm(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(18, 2)) * (lit(1.0) - discount).cast(DecimalType(18, 2)))
      .cast(DoubleType)

  /** TPC-H Q1-shaped grouped aggregation (SURVEY A4): the generalization of
    * the reference's single-symbol stats to groupBy(symbol) —
    * `producer.py:12` pins one symbol; we group. */
  def groupedPricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      // session-TZ-resolved literal (Timestamp.valueOf would parse in the
      // JVM default zone — a portability hazard vs the UTC oracle)
      .filter(col("l_shipdate") < lit("1999-01-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        revenueTerm(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("sum_base_price"), col("sum_disc_price"), col("avg_qty"), col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** ROLLUP hierarchy totals (SURVEY A5). Null group slots from the rollup
    * are coalesced to 'ALL' so cross-engine null ordering never matters. */
  /** Base cuboid for the rollup/cube/grouping-sets family: ONE
    * partial/final aggregate of lineitem on (rf, ls), sums kept at
    * DECIMAL precision so coarser cuboids re-aggregate EXACTLY. Spark's
    * built-in ROLLUP/CUBE plan is Expand — every input row is REPLICATED
    * once per grouping set before the partial aggregate, so a 2-dim
    * CUBE scans the 100 TB fact table once but pushes 4× its rows
    * through the aggregate. count/sum are algebraic, so every coarser
    * set is derivable from the ~|rf|·|ls|-row base cuboid instead
    * (Gray et al.'s cube lattice): same one scan, 1× rows through the
    * partial aggregate, and the derivations aggregate a handful of
    * rows. Grouping-null fidelity holds because the base cuboid KEEPS
    * null group keys as groups — deriving (rf) from it yields exactly
    * the rows CUBE's {(rf)} set yields, null groups included. */
  /** Memoized per corpus fingerprint like the repo's other build-once
    * artifacts: the checkpointed base is genuinely ONE lineitem scan
    * shared across the whole rollup/cube/grouping-sets family AND
    * across repeat invocations — without the memo each call (even just
    * constructing the DataFrame) re-runs the fact-table aggregate. */
  private def baseCuboid(s: SparkSession, d: String): DataFrame =
    Tables.artifact(s, d, Seq("lineitem"), "baseCuboid") {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("rf0"), col("l_linestatus").as("ls0"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("dq"))
        .localCheckpoint(true)
    }

  /** Re-aggregate the base cuboid onto a coarser grouping set; keys
    * absent from the set surface as the 'ALL' margin label. The dummy
    * literal grouping key makes the () set emit ZERO rows on empty
    * input — matching GROUP BY GROUPING SETS semantics, where even the
    * global set produces no group when there is no input (a bare
    * `.agg` would emit one count-0 row). */
  private def cuboid(base: DataFrame, keepRf: Boolean, keepLs: Boolean): DataFrame = {
    val rfKey = if (keepRf) col("rf0") else lit(null).cast(StringType)
    val lsKey = if (keepLs) col("ls0") else lit(null).cast(StringType)
    base.groupBy(rfKey.as("rfk"), lsKey.as("lsk"), lit(0).as("_g"))
      .agg(sum(col("n")).as("n"), sum(col("dq")).as("dq"))
      .select(coalesce(col("rfk"), lit("ALL")).as("rf"),
        coalesce(col("lsk"), lit("ALL")).as("ls"),
        col("n"), col("dq").cast(DoubleType).as("sum_qty"))
  }

  def rollupSummary(s: SparkSession, d: String): DataFrame = {
    val base = baseCuboid(s, d)
    cuboid(base, keepRf = true, keepLs = true)
      .union(cuboid(base, keepRf = true, keepLs = false))
      .union(cuboid(base, keepRf = false, keepLs = false))
      .orderBy(col("rf"), col("ls"))
  }

  /** Global metric summary — the reference's latency-stats computation
    * (`stream_consumer.py:110-111`: mean/min/max over the collected series)
    * as one distributed aggregate. */
  /** A7 sketch family — approximate HEAVY HITTERS via Spark 4's
    * `approx_top_k` (a mergeable frequency sketch: per-partition
    * sketches combine associatively, so only sketch buffers shuffle —
    * never the token stream). The scale path for "top terms over 100 TB
    * of text" when the exact vocab aggregate (q_top_tokens) gets too
    * wide.
    *
    * Oracle-exact ON THIS CORPUS, with the precondition spec-asserted
    * (AggregateSpec): the sketch tracks maxItemsTracked (default 10000)
    * items exactly and only approximates once the stream's distinct
    * count exceeds that, so with |vocab| ≪ capacity every estimate IS
    * the exact count; and with no tie at the k-th/k+1-th boundary the
    * returned item set is exactly the top k. The final rank is
    * recomputed as row_number over (count DESC, token) — the sketch's
    * internal order for equal counts is not part of its contract. */
  def approxTopTokens(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("est_freq").desc, col("token"))
    Tables.documents(s, d)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .select(expr(s"approx_top_k(token, $k)").as("topk"))
      .select(posexplode(col("topk")).as(Seq("pos", "tc")))
      .select(col("tc.item").as("token"), col("tc.count").cast(LongType).as("est_freq"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .select(col("rnk"), col("token"), col("est_freq"))
      .orderBy(col("rnk"))
  }

  /** Calendar-bucket rollup via date_trunc — the time-dimension cousin
    * of the key-grouped aggregates: one partial/final aggregate on the
    * truncated month, never a per-month window. The month bucket is a
    * pure scan-side expression, so partition pruning on a date-
    * partitioned layout composes with it for free. */
  def monthlyRevenue(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("month"))

  def metricsSummary(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        dsum(col("value")).as("sum_value"))
      .withColumn("avg_value", col("sum_value") / col("n"))
      .select(col("n"), col("min_value"), col("max_value"), col("sum_value"), col("avg_value"))

  /** Skew-resistant two-phase (salted) aggregation: phase 1 aggregates on
    * (key, salt) spreading one hot key over `salts` reducers, phase 2
    * merges the partials per key. events has only ~15 users — exactly the
    * hot-key shape that stalls a single reducer at 100 TB. Results are
    * identical to a direct groupBy (decimal sums are associative), which
    * is what the oracle checks. */
  def saltedUserTotals(s: SparkSession, d: String, salts: Int = 8): DataFrame =
    Tables.events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(salts.toLong)))
      .groupBy(col("user_id"), col("salt"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).as("partial_sum"),
        count(lit(1)).as("partial_n"))
      .groupBy(col("user_id"))
      .agg(sum(col("partial_sum")).cast(DoubleType).as("total"),
        sum(col("partial_n")).as("n"))
      .orderBy(col("user_id"))

  /** CUBE over both group dimensions (SURVEY A5 family): all 2^k
    * grouping-set combinations — derived from the one-scan base cuboid
    * ([[baseCuboid]]) instead of `.cube`'s 4×-row Expand plan. */
  def cubeSummary(s: SparkSession, d: String): DataFrame = {
    val base = baseCuboid(s, d)
    cuboid(base, keepRf = true, keepLs = true)
      .union(cuboid(base, keepRf = true, keepLs = false))
      .union(cuboid(base, keepRf = false, keepLs = true))
      .union(cuboid(base, keepRf = false, keepLs = false))
      .orderBy(col("rf"), col("ls"))
  }

  /** Explicit GROUPING SETS (A5 family) — arbitrary grouping
    * combinations, derived from the shared base cuboid like
    * [[cubeSummary]] (every requested set here is coarser than
    * (rf, ls), so the lattice derivation applies; a set NOT derivable
    * from a common base — e.g. over a different dimension — would fall
    * back to the SQL `GROUP BY GROUPING SETS` surface, whose Expand
    * plan replicates rows per set). */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    val base = baseCuboid(s, d)
    cuboid(base, keepRf = true, keepLs = false)
      .union(cuboid(base, keepRf = false, keepLs = true))
      .union(cuboid(base, keepRf = false, keepLs = false))
      .orderBy(col("rf"), col("ls"))
  }

  /** Exact percentiles per group (linear interpolation — the same
    * index = p·(n−1) definition DuckDB's quantile_cont uses). At 100 TB
    * prefer approx_percentile (t-digest sketch); the exact form shown
    * here is the oracle-comparable baseline. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("med"),
        expr("percentile(value, 0.9)").as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** approx_percentile (t-digest-style sketch) per group — the 100 TB
    * companion to [[percentiles]]: fixed-size sketch per group instead
    * of buffering the group's values. Sketch merge order makes low bits
    * run-dependent → rows-only check; the spec pins it to the exact
    * percentile within the accuracy band. */
  def approxPercentiles(s: SparkSession, d: String,
      accuracy: Int = 10000): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        expr(s"approx_percentile(value, 0.5, $accuracy)").as("approx_med"),
        expr(s"approx_percentile(value, 0.9, $accuracy)").as("approx_p90"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** PIVOT — long-to-wide reshaping with an explicit value list (A4/A5
    * companion). The explicit list matters twice over: the output schema
    * is static (no extra distinct-values pass over the corpus before
    * planning), and the plan is a single partial/final aggregate with
    * one conditional sum per bucket — exactly the CASE-WHEN form the
    * oracle states. Decimal-routed sums, null where a user lacks the
    * event type on both engines. */
  def pivotEventValues(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(dsum(col("value")))
      .orderBy(col("user_id"))

  /** UNPIVOT (melt) — the wide-to-long inverse of [[pivotEventValues]]:
    * the pivoted per-user totals flow back to (user_id, event_type,
    * total) rows, dropping the null cells the pivot manufactured. A pure
    * row-local projection: no shuffle beyond the pivot's own aggregate. */
  def unpivotEventValues(s: SparkSession, d: String): DataFrame =
    pivotEventValues(s, d)
      .unpivot(Array(col("user_id")),
        Array(col("click"), col("error"), col("purchase"), col("signup"), col("view")),
        "event_type", "total")
      .filter(col("total").isNotNull)
      .orderBy(col("user_id"), col("event_type"))

  /** Two-level MERGEABLE-SKETCH rollup — the 100 TB pre-aggregation
    * pattern: per-(day, type) HLL sketches materialize once (in
    * production, a daily sketch table), then any coarser rollup UNIONS
    * the stored sketches instead of rescanning raw data — here per-type
    * distinct users from the daily sketches. Sketch bytes are
    * run-dependent → rows-only; the spec pins the estimates to exact
    * distinct counts within the HLL error band. */
  def sketchRollup(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
      .orderBy(col("event_type"))
  }

  /** Pairwise PEARSON CORRELATION between the per-type daily-revenue
    * series — the reference domain's "which symbols move together"
    * analytics as one distributed plan: daily partial/final aggregate
    * (30 rows per type), a day-keyed self-join of that TINY table (the
    * corpus is never self-joined), then one aggregate per type pair.
    *
    * Oracle-exact correlation without a tolerance, same technique as
    * the z-score scaler: every moment (Σx, Σy, Σx², Σy², Σxy)
    * accumulates in DECIMAL — order-independent, a double fits it
    * losslessly at these magnitudes — and the final corr algebra is
    * the identical double expression on both engines. The diagonal
    * (a,a) rides along as a built-in sanity row (≈1 up to the shared
    * sqrt rounding, identical bits both engines). */
  def corrDaily(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(18, 2)).as("v"))
    val a = daily.select(col("day"), col("event_type").as("type_a"), col("v").as("va"))
    val b = daily.select(col("day"), col("event_type").as("type_b"), col("v").as("vb"))
    a.join(b, Seq("day")).filter(col("type_b") >= col("type_a"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("va")).cast(DoubleType).as("sx"),
        sum(col("vb")).cast(DoubleType).as("sy"),
        sum(col("va") * col("va")).cast(DoubleType).as("sxx"),
        sum(col("vb") * col("vb")).cast(DoubleType).as("syy"),
        sum(col("va") * col("vb")).cast(DoubleType).as("sxy"))
      .select(col("type_a"), col("type_b"), col("n_days"),
        ((col("n_days") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n_days") * col("sxx") - col("sx") * col("sx")) *
           sqrt(col("n_days") * col("syy") - col("sy") * col("sy")))).as("corr"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** AUTOCORRELATION FUNCTION of each per-type daily-revenue series at
    * lags 1..maxLag — the stationarity probe run before fitting any
    * forecaster (the reference fits its LSTM blind; a near-1 lag-1 ACF
    * is exactly why its "prediction" shadows the last price). Pearson
    * correlation between the series and its lag-shifted self over the
    * aligned days.
    *
    * Shape: the corpus collapses to the same TINY daily table as
    * [[corrDaily]] (partial/final aggregate, ~30 rows per type); ONE
    * window per type computes all maxLag lag columns on a single sort;
    * `stack` unpivots to (type, lag) rows; one aggregate per (type,
    * lag) over ≤ n_days rows. Nothing downstream of the first
    * aggregate scales with the corpus.
    *
    * Oracle-exact by the corrDaily technique: daily values and every
    * moment (Σx, Σy, Σx², Σy², Σxy) accumulate in DECIMAL —
    * order-independent — and the final corr algebra is the identical
    * double expression on both engines. */
  def acfDaily(s: SparkSession, d: String, maxLag: Int = 5): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(18, 2)).as("v"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lagged = (1 to maxLag).foldLeft(daily) { (df, l) =>
      df.withColumn(s"v_$l", lag(col("v"), l).over(w))
    }
    val stackArgs = (1 to maxLag).map(l => s"$l, v_$l").mkString(", ")
    lagged
      .select(col("event_type"), col("v"),
        expr(s"stack($maxLag, $stackArgs) AS (lag_k, vl)"))
      .filter(col("vl").isNotNull)
      .groupBy(col("event_type"), col("lag_k"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast(DoubleType).as("sx"),
        sum(col("vl")).cast(DoubleType).as("sy"),
        sum(col("v") * col("v")).cast(DoubleType).as("sxx"),
        sum(col("vl") * col("vl")).cast(DoubleType).as("syy"),
        sum(col("v") * col("vl")).cast(DoubleType).as("sxy"))
      .select(col("event_type"), col("lag_k"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
           sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("acf"))
      .orderBy(col("event_type"), col("lag_k"))
  }

  /** approx_count_distinct (HLL++) per group (SURVEY A7) — the 100 TB
    * cardinality path: fixed-size sketch per group instead of a distinct
    * shuffle. No exact oracle by design; rows-only check. */
  def approxDistinctParts(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(
        // rsd 0.02 — matched to the companion check's sizing rule: HLL
        // register state is per-group-per-partition memory (3 KB at
        // 0.02 vs 16 KB at 0.01; see Checks.approxDistinctCheck)
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_suppkey"))

  /** Equal-width histogram — the data-profiling distribution sketch.
    * Two passes: a min/max aggregate (one row, broadcast back as a cross
    * join) fixes the 20 bins; the main pass is a codegen'd
    * floor((x−mn)/w) groupBy — one shuffle of 20 partial rows per task,
    * independent of corpus size. All bin arithmetic runs in doubles
    * (prices at 2 dp are double-exact), the identical IEEE expression
    * both engines, so even boundary ties bucket identically. */
  def histogram(s: SparkSession, d: String, nBins: Int = 20): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_extendedprice").cast(DoubleType).as("x"))
    val stats = li.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val nb = lit(nBins.toDouble)
    li.crossJoin(broadcast(stats))
      .withColumn("_w", (col("mx") - col("mn")) / nb)
      .withColumn("bin",
        least(floor((col("x") - col("mn")) / col("_w")), lit(nBins - 1L)).cast(LongType))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_items"),
        min(col("x")).as("bin_min"), max(col("x")).as("bin_max"))
      .orderBy(col("bin"))
  }

  /** Per-column data profile — the schema-dynamic quality report every
    * ingest pipeline runs first: row/null/distinct counts and value
    * range per requested numeric column. One column-pruned pass PER
    * COLUMN: groupBy(value) partial-aggregates map-side (only distinct
    * values shuffle), and every statistic then reduces over the
    * distinct-value rows — nn = Σ counts, nd = group count, min/max
    * over keys. This replaces the earlier single multi-countDistinct
    * aggregate, whose Expand branch multiplied the scan by the column
    * count and hashed the union of all columns through ONE table
    * (measured 2.0 s → 0.28 s at sf0.1). At 100 TB swap the distinct
    * pre-aggregation for approx_count_distinct — one scan total, no
    * distinct shuffle at all. */
  def profile(s: SparkSession, d: String,
      cols: Seq[String] = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      : DataFrame = {
    // an empty column list would otherwise surface as an opaque
    // UnsupportedOperationException out of reduce below
    require(cols.nonEmpty, "profile: need at least one column to profile")
    val li = Tables.lineitem(s, d)
    val nRows = li.agg(count(lit(1)).as("n_rows"))
    val per = cols.map { c =>
      li.select(col(c).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .agg(
          sum(when(col("v").isNotNull, col("cnt")).otherwise(0L)).as("n_notnull"),
          count(col("v")).as("n_distinct"),
          min(col("v")).cast(DoubleType).as("min_v"),
          max(col("v")).cast(DoubleType).as("max_v"))
        .select(lit(c).as("col_name"), col("n_notnull"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_ unionAll _)
    per.crossJoin(broadcast(nRows))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_notnull")).as("n_null"),
        col("n_distinct"), col("min_v"), col("max_v"))
      .orderBy(col("col_name"))
  }

  /** DATA-QUALITY CONSTRAINT SUITE (the Deequ/dbt-test shape):
    * completeness, accepted-values, range, composite-key uniqueness,
    * and referential integrity over lineitem, emitted as one
    * (check, metric, passed) table — assertions as data, so a
    * scheduler can gate a pipeline on `passed`. The scalar checks ride
    * ONE scan as conditional aggregates (violation counting is free at
    * the pass that was reading the data anyway); uniqueness adds a
    * distinct on the key pair; referential integrity is a left anti
    * join (broadcast when the parent's keys fit, shuffle otherwise).
    * Every metric is a ratio of exact counts — one double division,
    * value-exact vs the oracle. */
  def dqChecks(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val nRows = "CAST(count(*) AS DOUBLE)"
    // THREE lineitem passes, down from five: the row count `n` rides
    // the scalar-aggregate pass (one more conditional aggregate on a
    // scan already reading the rows) instead of two dedicated
    // count(*)-only scans — the ratios divide by the same exact long,
    // so every metric is bit-unchanged. Remaining passes are the
    // irreducible ones: the key-pair distinct and the referential
    // anti-join probe.
    val scalar = li.agg(
      expr(s"count(l_quantity) / $nRows").as("completeness_l_quantity"),
      expr(s"CAST(count_if(l_returnflag IN ('A','N','R')) AS DOUBLE) / $nRows")
        .as("accepted_values_l_returnflag"),
      expr(s"CAST(count_if(l_discount >= 0.0 AND l_discount <= 0.5) AS DOUBLE) / $nRows")
        .as("range_l_discount"),
      count(lit(1)).as("n"))
    val uniq = li.select(col("l_orderkey"), col("l_linenumber")).distinct()
      .agg(count(lit(1)).as("n_distinct"))
    val orphan = li.join(Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    scalar.crossJoin(uniq).crossJoin(orphan)
      .withColumn("uniqueness_orderkey_linenumber",
        col("n_distinct").cast(org.apache.spark.sql.types.DoubleType) / col("n"))
      .withColumn("referential_orderkey",
        lit(1.0) - col("n_orphans").cast(org.apache.spark.sql.types.DoubleType)
          / col("n"))
      .select(expr(
        """stack(5,
           'accepted_values_l_returnflag', accepted_values_l_returnflag,
           'completeness_l_quantity', completeness_l_quantity,
           'range_l_discount', range_l_discount,
           'referential_orderkey', referential_orderkey,
           'uniqueness_orderkey_linenumber', uniqueness_orderkey_linenumber)
           AS (check_name, metric)"""))
      .select(col("check_name"), col("metric"), (col("metric") >= 1.0).as("passed"))
      .orderBy(col("check_name"))
  }

  /** EQUI-DEPTH (quantile) bins per series — the complement of the
    * equal-WIDTH [[histogram]]: every bin holds (near-)equal row
    * count, so the bin EDGES are the data summary (where an equi-width
    * histogram piles everything into two hot bins on skewed data).
    * Semantics are SQL-standard `ntile` — earlier buckets absorb the
    * remainder, (value, event_id) tie-break — so the n/lo/hi cells
    * hash-compare exactly with no percentile-interpolation parity
    * question (the DuckDB oracle literally runs ntile).
    *
    * Spark-side the bucket is the CLOSED FORM of ntile over a
    * streaming row_number + a broadcast per-series count: Spark's
    * `ntile` window function must BUFFER the whole partition (bucket
    * width needs the partition size), which measured 9.0 s at the 10M
    * -row gen100x fixture versus 0.25 s for the row_number-shaped
    * gini on the SAME sort — a 36× cliff that only widens with
    * series width. row_number streams the sorted run, the series
    * count is a 5-row broadcast, and integer arithmetic reproduces
    * ntile's large-buckets-first assignment bit-for-bit
    * (a TrainPrepSpec test pins equality against Spark's own ntile).
    * The per-series sort task-width caveat (ksDrift) still applies. */
  def equidepthBins(s: SparkSession, d: String, nBins: Int = 10): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
    val counts = e.groupBy(col("event_type")).agg(count(lit(1)).as("nn"))
    // ntile's assignment in pure INTEGER arithmetic (Column./ is double
    // division — a rounded quotient under floor() mis-bins near exact
    // multiples once divisors pass ~2^26; DIV never does): first
    // nn % b buckets take nn DIV b + 1 rows, the rest nn DIV b.
    // Ranks come from the value-chunked prefix-offset helper, so a
    // series wider than one sort task spreads over bounded chunks
    Chunked.seriesRanks(e, "event_type", "value", "event_id")
      .join(broadcast(counts), "event_type")
      .withColumn("bin", expr(
        s"""CASE WHEN i <= (nn % $nBins) * (nn DIV $nBins + 1)
            THEN (i - 1) DIV (nn DIV $nBins + 1) + 1
            ELSE (nn % $nBins) + (i - (nn % $nBins) * (nn DIV $nBins + 1) - 1) DIV (nn DIV $nBins) + 1 END"""))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("lo"), max(col("value")).as("hi"))
      .orderBy(col("event_type"), col("bin"))
  }

  /** Skewness and excess kurtosis per series from EXACT raw power
    * sums — the shape moments completing [[metricsSummary]]'s
    * mean/min/max and the z-score/winsorize scalers' second moment.
    * Σv, Σv², Σv³, Σv⁴ stay decimal-exact (v has 2 decimals, so each
    * power is a FINITE decimal: v² at scale 4, v³ at 6, v⁴ at 8 —
    * widened before multiplying so no product exceeds precision 38,
    * the trendOls precision-loss trap), cast to double once; the
    * central-moment algebra then runs one shared IEEE tree, with
    * skew's 3/2 power spelled sqrt(c2·c2·c2) — pow() is NOT
    * correctly-rounded across libms, sqrt is. One map-side-combined
    * aggregate; no second pass, no window. */
  def skewKurtosis(s: SparkSession, d: String): DataFrame = {
    val v = col("value").cast(DecimalType(18, 2))
    val e = Tables.events(s, d).select(col("event_type"), v.as("v"),
      (v * v).cast(DecimalType(18, 4)).as("v2"))
    val g = e.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("v")).as("s1"),
      sum(col("v2")).as("s2"),
      sum((col("v2") * col("v")).cast(DecimalType(38, 6))).as("s3"),
      sum((col("v2") * col("v2")).cast(DecimalType(38, 8))).as("s4"))
    val n = col("n").cast(DoubleType)
    val m = col("s1").cast(DoubleType) / n
    val r2 = col("s2").cast(DoubleType) / n
    val r3 = col("s3").cast(DoubleType) / n
    val r4 = col("s4").cast(DoubleType) / n
    val c2 = r2 - m * m
    val c3 = r3 - lit(3.0) * m * r2 + lit(2.0) * m * m * m
    val c4 = r4 - lit(4.0) * m * r3 + lit(6.0) * m * m * r2 -
      lit(3.0) * m * m * m * m
    g.select(col("event_type"), col("n"), m.as("mean"),
        (c3 / sqrt(c2 * c2 * c2)).as("skewness"),
        (c4 / (c2 * c2) - lit(3.0)).as("kurtosis_excess"))
      .orderBy(col("event_type"))
  }

  /** GINI coefficient of value concentration per series — the
    * inequality audit (is 1% of events carrying 90% of the value?)
    * that sizes sampling and skew-mitigation decisions, same family
    * as [[graft.ops.Relational.keySkew]]. Formula: the sorted-rank
    * identity G = 2·Σ(i·vᵢ)/(n·Σv) − (n+1)/n with values held as
    * exact integer CENTS (rank·cents products ride DECIMAL(38,0) —
    * their sum passes 2⁶³ at 100× fixtures). Deterministic tie-break
    * (value, event_id) pins rank assignment; one per-series sort
    * window (ksDrift task-width caveat), one aggregate. */
  def giniValue(s: SparkSession, d: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    // ranks via the value-chunked prefix-offset helper (Chunked
    // .seriesRanks) — a hot series spreads over bounded chunk sorts
    // instead of one task (measured 18.9 s → chunk-parallel at gen100x)
    val e = Chunked.seriesRanks(
      Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("vc")),
      "event_type", "vc", "event_id")
    val g = e.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("vc")).as("sv"),
      sum(col("i").cast(d38) * col("vc").cast(d38)).as("siv"))
    val n = col("n").cast(DoubleType)
    g.select(col("event_type"), col("n").as("n_events"),
        (lit(2.0) * col("siv").cast(DoubleType) /
          (n * col("sv").cast(DoubleType)) - (n + lit(1.0)) / n).as("gini"))
      .orderBy(col("event_type"))
  }
}
