package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Feature-preparation operators for training pipelines: target
  * encoding, the feature-hashing trick, bipartite degree statistics,
  * and calendar seasonality — the tabular-ML companions to the text /
  * dedup / similarity families.
  *
  * The reference's pipelines stop at min-max scaling
  * (`batch_processor.py:96-100`); these are the generalization a
  * large-scale tabular training pipeline needs on top. Every operator
  * here is two-phase: a SMALL aggregate (segments, buckets, degrees —
  * bounded by category/bucket cardinality, never by corpus size)
  * produced with map-side partial aggregation, then a broadcast join
  * back onto the fact rows where a per-row output is required. Nothing
  * shuffles the fact table on a low-cardinality key (a 5-key window
  * partition would funnel the corpus through 5 reducers at 100 TB —
  * the skew cliff the window-function formulation hides).
  */
object TrainPrep {

  /** Leave-one-out target encoding of a categorical (customer market
    * segment) against a continuous target (order total): for row i in
    * segment g, enc_i = (sum(g) − y_i) / (n(g) − 1) — the standard
    * leakage-free replacement for a raw per-category mean (the row's
    * own label never contributes to its own feature).
    *
    * Plan shape: fact ⋈ broadcast(dim) for the segment label, one
    * grouped aggregate down to |segments| rows (exact decimal sums),
    * then broadcast that tiny encoder table back onto the fact rows —
    * two broadcast joins, one map-side-combined shuffle of 5 rows.
    * The subtraction is decimal-exact; the single double division is
    * bit-deterministic cross-engine. */
  def targetEncode(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
    val c = Tables.customer(s, d).select(col("c_custkey"),
      col("c_mktsegment").as("segment"))
    val rows = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
    val enc = rows.groupBy(col("segment"))
      .agg(sum(col("price")).as("seg_sum"), count(lit(1)).as("seg_n"))
    rows.join(broadcast(enc), "segment")
      .select(col("o_orderkey"), col("segment"),
        ((col("seg_sum") - col("price")).cast(DoubleType) /
          (col("seg_n") - lit(1)).cast(DoubleType)).as("loo_enc"))
      .orderBy(col("o_orderkey"))
  }

  /** Feature-hashing trick over document tokens: every token maps to
    * one of [[HashBuckets]] buckets via an engine-portable hash (two
    * leading md5 hex chars — md5 is bit-identical everywhere, unlike
    * the engines' native hash functions), and the per-(source, bucket)
    * counts ARE the fixed-width feature vector. The point at 100 TB:
    * the feature space is bounded by construction (64 buckets, not an
    * unbounded vocabulary), so the aggregate is map-side-combinable
    * into at most sources×64 rows — no vocabulary table, no OOV
    * handling, which is why the trick survives streaming vocabularies
    * (Weinberger et al., "Feature Hashing for Large Scale Multitask
    * Learning", ICML 2009). */
  val HashBuckets = 64

  def featureHash(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val m = md5(col("token").cast(BinaryType))
    val bucket = (ascii(substring(m, 1, 1)) * lit(256) +
      ascii(substring(m, 2, 1))) % lit(HashBuckets)
    toks.select(col("source"), bucket.cast(LongType).as("bucket"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
      .orderBy(col("source"), col("bucket"))
  }

  /** Bipartite degree distribution (customer ↔ distinct part): how many
    * customers bought exactly k distinct parts. Two-level exact
    * aggregate — distinct pairs first (map-side combinable), then a
    * count per customer, then a count-of-counts — the same
    * reducer-safe ladder as the LM count-of-counts: no count(DISTINCT)
    * per-group set survives in memory and no key sees more than its
    * own group's rows. The histogram (≤ |parts| rows) is the standard
    * scale-free-graph diagnostic on an interaction table. */
  def degreeDist(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
    pairs.groupBy(col("o_custkey")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("degree"))
  }

  /** Day-of-week seasonality of purchase value: per-weekday mean vs the
    * global mean (the multiplicative seasonal index of classical
    * decomposition). Two bounded aggregates (7 rows and 1 row) and a
    * broadcast cross join — the global mean rides into the per-row
    * division as a one-row broadcast, never a driver collect. Sums are
    * decimal-exact; the two divisions are double-deterministic. The
    * weekday label is the locale-independent full day name (both
    * engines format from the same UTC timestamp). */
  def seasonality(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(date_format(col("ts"), "EEEE").as("dow"),
        col("value").cast(DecimalType(18, 2)).as("v"))
    val byDow = ev.groupBy(col("dow"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("dow_sum"))
    val global = ev.agg(count(lit(1)).as("g_n"), sum(col("v")).as("g_sum"))
    val dowMean = col("dow_sum").cast(DoubleType) / col("n").cast(DoubleType)
    val gMean = col("g_sum").cast(DoubleType) / col("g_n").cast(DoubleType)
    byDow.crossJoin(broadcast(global))
      .select(col("dow"), col("n"), dowMean.as("dow_mean"),
        (dowMean / gMean).as("seasonal_index"))
      .orderBy(col("dow"))
  }
}
