package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Join operators (SURVEY.md §2.3 J1-J5).
  *
  * The reference has no joins (single-symbol, single-table pipeline); this
  * is the generalized join surface its batch path would need to enrich
  * ticks with reference data. Strategy choices are explicit for 100 TB:
  * dims are broadcast (no shuffle of the fact side), fact-fact joins are
  * shuffle hash/sort-merge on the join key, and the "range join" is
  * re-expressed as a partitioned window aggregate so it never builds the
  * per-key cross product a naive theta-join would.
  */
object Joins {

  /** J1 — small dim ⋈ small dim, broadcast hash join: the small side ships
    * to every executor, zero shuffle of the probe side. */
  def broadcastJoin(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"), "inner")
      .select(col("n_name"), col("r_name"))
      .orderBy(col("n_name"))

  /** J2 — fact ⋈ fact ⋈ dim with grouped revenue. lineitem⋈orders is a
    * shuffle join on the order key; customer is small → broadcast. The
    * aggregate runs partial/final so only one row per customer shuffles. */
  def shuffleJoinRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"), "inner")
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        Aggregates.revenueTerm(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("c_custkey"))

  /** Bucketed CO-LOCATED join: both fact tables are written bucketed (and
    * per-file sorted) by the join key, so the subsequent sort-merge join
    * needs NO exchange of either side — each bucket pair joins in place.
    * This is the 100 TB pattern for repeated fact-fact joins: pay the
    * shuffle ONCE at ingest/write time, then every downstream join reuses
    * the co-location for free. The write is cached per (session, sfDir);
    * a MERGE hint keeps the demonstration an SMJ even when AQE would
    * broadcast the smaller side at toy scale. JoinSpec asserts the
    * join subtree plans with zero hash-partition exchanges. */
  def bucketedTables(s: SparkSession, d: String, buckets: Int = 8): (DataFrame, DataFrame) = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val lt = s"graft_lineitem_b$tag"
    val ot = s"graft_orders_b$tag"
    if (!s.catalog.tableExists(lt)) {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(lt)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(ot)
    }
    (s.table(lt), s.table(ot))
  }

  def bucketedJoinRevenue(s: SparkSession, d: String): DataFrame = {
    val (lineitem, orders) = bucketedTables(s, d)
    lineitem.hint("merge")
      .join(orders, col("l_orderkey") === col("o_orderkey"), "inner")
      .groupBy(col("o_orderpriority"))
      .agg(
        Aggregates.revenueTerm(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** Skew-safe equi-join by explicit KEY SALTING — the hot-key half of
    * the 100 TB story (q_agg_salted covers skewed aggregation). A plain
    * shuffle join hash-partitions both sides on `key`, so a hot key
    * funnels its entire fact volume through ONE task. Salting appends a
    * per-row salt to the fact side and REPLICATES the small side once
    * per salt value, joining on (key, salt): the hot key now spreads
    * over `salts` tasks, at the cost of a salts× blow-up of the small
    * side only. Results are exactly the plain join (each fact row meets
    * exactly one replica of its key's row). The SHUFFLE_HASH hint keeps
    * the demonstration a shuffle join even where AQE would broadcast
    * the replicated side at toy scale — production keeps the hint
    * precisely when the small side exceeds the broadcast threshold,
    * which is when salting matters. */
  def saltedEquiJoin(fact: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(salts.toLong)))
    val repl = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    // the hint rides the SMALL side so it becomes the hash-table build
    // side (BuildRight) — building over the fact side would materialize
    // a per-partition hash table of the corpus at scale
    salted.join(repl.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Salted-join demonstration query: every event joined to its type's
    * profile (average value) — event_type is the naturally hot key
    * (5 values across the whole corpus). Oracle = the PLAIN join in SQL;
    * JoinSpec asserts the salted shuffle actually partitions on
    * (event_type, salt). */
  def saltedSkewJoinTypeAvg(s: SparkSession, d: String, salts: Int = 8): DataFrame = {
    val ev = Tables.events(s, d)
    val prof = ev.groupBy(col("event_type"))
      .agg((Aggregates.dsum(col("value")) / count(lit(1))).as("type_avg"))
    saltedEquiJoin(ev.select(col("event_id"), col("event_type"), col("value")),
        prof, "event_type", salts)
      .select(col("event_id"), col("event_type"), col("value"), col("type_avg"))
      .orderBy(col("event_id"))
  }

  /** J3a — left semi (EXISTS): customers that have at least one order. */
  def semiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** J3b — left anti (NOT EXISTS): customers with no orders. */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** J4 — left outer + group: order count per customer including zeros.
    * count(o_orderkey) skips the nulls the outer join manufactures. */
  def outerJoinOrderCounts(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))

  /** J5 — interval/as-of-style "range join": for every purchase, how many
    * clicks did the same user make in the preceding hour (inclusive)?
    *
    * A naive theta-join `a.user=b.user AND b.ts BETWEEN a.ts-1h AND a.ts`
    * degenerates to a per-user cross product (O(n²/users) rows through the
    * join) — fatal at 100 TB. Re-expressed as a RANGE window over
    * event-time per user: one shuffle on user_id, one sort, O(n) work.
    * This is the standard Spark-first reformulation of bounded-interval
    * self-joins. */
  /** As-of join: attach to every purchase the most recent prior click
    * value of the same user (strictly earlier in (ts, event_id) order),
    * null if none — the tick-enrichment pattern of the reference domain
    * (latest quote at or before an event).
    *
    * A naive formulation is a theta-join with a per-row ORDER BY ... LIMIT
    * 1 subquery; re-expressed as carry-forward state: one shuffle on
    * user_id, one sort, then `last(value_if_click) IGNORE NULLS` over the
    * preceding-rows frame. O(n log n) per user partition, no join at all. */
  def asofLastClickBeforePurchase(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("last_click_value",
        last(when(col("event_type") === "click", col("value")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("last_click_value"))
      .orderBy(col("event_id"))
  }

  def rangeJoinClicksBeforePurchase(s: SparkSession, d: String): DataFrame = {
    val oneHourMicros = 3600L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-oneHourMicros, 0)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("n_clicks_1h",
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("n_clicks_1h"))
      .orderBy(col("event_id"))
  }

  /** BLOOM-PRUNED selective join — the runtime-filter pattern owned as
    * an operator ([[graft.functions.BloomAgg]]): a selective dim-side
    * predicate (one quarter of order dates) reduces to a 128 KiB bitset
    * of the surviving join keys, the bitset broadcasts onto the fact
    * scan (1-row cross join, the minmax-scaler shape), and a codegen'd
    * membership probe drops ~96% of fact rows BEFORE they reach the
    * exact join. Spark's optimizer injects this same shape only when
    * statistics allow (`runtime.bloomFilter.enabled`); building it
    * explicitly makes the pruning unconditional and source-agnostic.
    *
    * At 100 TB this is THE lever for selective fact⋈dim joins: the
    * fact side never shuffles unjoinable rows — the shuffle shrinks by
    * the selectivity (false-positive rate ~1%) while the exact join
    * afterwards keeps the result provably identical (the oracle is the
    * plain join; a wrong bitset could only show up as a hash mismatch
    * or a lost row, both gated). */
  def bloomPrunedJoin(s: SparkSession, d: String): DataFrame = {
    graft.functions.Native.register(s)
    val sel = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1995-04-01").cast(TimestampType))
      .select(col("o_orderkey"), col("o_orderpriority"))
    // the bitset becomes a plan LITERAL — exactly how Spark's own
    // InjectRuntimeFilter ships its bloom (a scalar subquery evaluated
    // to a literal before the probe side runs). The driver collect is
    // bounded at the filter's fixed 128 KiB (the k-means-centroid
    // class of collect). A 1-row broadcast-join formulation is the
    // trap here: the probe would re-read the 128 KiB binary from the
    // joined row PER FACT ROW (~75 GB of array copies at sf0.1 —
    // measured 24 s); as a literal it lives in the codegen references
    // array, read once per task.
    val bfBytes = sel
      .agg(graft.functions.Native.bloom(xxhash64(col("o_orderkey"))).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val pruned = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .filter(graft.functions.Native.bloomContains(
        lit(bfBytes), xxhash64(col("l_orderkey"))))
    pruned.join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        Aggregates.revenueTerm(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }
}
