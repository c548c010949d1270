package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** User-behavior analytics over the event log — the cohort / funnel /
  * history-tracking queries every product-analytics warehouse runs
  * (north-star extensions; the reference's event stream is the natural
  * input). All outputs are integer counts or exact microsecond
  * timestamps, so every query here is value-exact against the DuckDB
  * oracle — no float routing.
  */
object Behavior {

  /** Cohort RETENTION matrix: users are cohorted by their first active
    * day; each cell (cohort_day, day_offset) counts the cohort's users
    * active that many days later. The product-analytics staple.
    *
    * Scale shape: one distinct on (user_id, day) — the dominant
    * shuffle, keyed by the high-cardinality pair so it balances; the
    * per-user cohort aggregate reuses the same user_id partitioning
    * (Catalyst plans the equi-join on user_id without a fresh fact
    * exchange); the final (cohort, offset) count is map-side combined
    * to days² tiny rows. Because activity is already distinct per
    * (user, day), the cell count is a plain count(1) — no
    * count-distinct state. */
  def retention(s: SparkSession, d: String): DataFrame = {
    val active = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohort = active.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    active.join(cohort, Seq("user_id"))
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast(LongType).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Daily ACTIVE/NEW/CUMULATIVE users — the growth dashboard staple.
    * Everything derives from the distinct (user, day) activity set:
    * daily active is a count per day, new users count first-activity
    * days, and the cumulative curve is a running sum over the DAILY
    * table — a window over O(days) rows, so the single-task global
    * window is a non-issue at any corpus size (the corpus itself only
    * ever moves through the distinct + per-user min, both keyed on the
    * high-cardinality user). */
  def activeUsers(s: SparkSession, d: String): DataFrame = {
    // ONE scan: the distinct (user, day) table tags each row with its
    // user's first activity day via a window, so daily-active and
    // daily-new ride the same aggregate. The previous `dau ⋈ newu`
    // join re-executed the corpus scan + distinct for each leg (a
    // DataFrame referenced twice recomputes its subtree); n_new =
    // count of rows where day == first_day is value-identical to
    // counting per-user min(day) arrivals, and every day with activity
    // still emits a row (n_new 0 where no user is new — the old
    // left-join coalesce).
    val a = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("first_day",
        min(col("day")).over(Window.partitionBy(col("user_id"))))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    a.groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        count(when(col("day") === col("first_day"), 1)).as("n_new"))
      .withColumn("cum_users", sum(col("n_new")).over(wCum))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_active"), col("n_new"), col("cum_users"))
      .orderBy(col("day"))
  }

  /** Ordered FUNNEL: how many users progress view → click → purchase,
    * where each later stage must happen strictly AFTER the user's
    * first event of the previous stage. One row: the three stage
    * counts. Every stage is a per-user min aggregate plus an equi-join
    * on user_id — no window, no skew (the funnel key is the user, never
    * the event type), each stage's input shrinks to the survivors. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    // ONE scan, one user-keyed exchange: the three stage times are
    // per-user window minima chained over the SAME partitioning
    // (t_click = min click ts strictly after t_view, etc. — a later
    // window expression may reference an earlier one's column; all
    // three WindowExecs ride one sort, zero extra shuffles), then one
    // partial-aggregated per-user collapse and a 1-row count. The
    // previous stage-join chain re-executed each stage's upstream for
    // every reference (v in c's subtree AND the final join, c in p's
    // AND the final join) — SIX corpus scans and five shuffles for
    // three counts. Null algebra is unchanged: a user with no view has
    // t_view = min over nothing = NULL, ts > NULL is NULL, so later
    // stages stay NULL — exactly the inner-join-then-left-join
    // semantics of the chained form.
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"),
          col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t_view")).as("t_view"),
        max(col("t_click")).as("t_click"),
        max(col("t_purchase")).as("t_purchase"))
      .agg(count(col("t_view")).as("n_view"),
        count(col("t_click")).as("n_click"),
        count(col("t_purchase")).as("n_purchase"))
  }

  /** Type-2 SLOWLY-CHANGING-DIMENSION build from a change log: treating
    * each event as "user's current type changed to event_type",
    * collapse consecutive repeats and emit one validity interval per
    * surviving change — valid_from = the change's event time,
    * valid_to = the next change's (NULL while current). The standard
    * warehouse history-tracking shape, derived here entirely from lag /
    * lead over the (user_id, time) order: one exchange on the
    * high-cardinality user key, both window passes ride the same
    * partitioning, task width is bounded by one user's history. */
  def scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("us").as("valid_from_us"),
        col("valid_to_us"), col("valid_to_us").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from_us"))
  }

  /** Co-purchase PAIR COUNTS: for each user pair, the number of common
    * days on which both purchased — the co-occurrence weight behind
    * affinity/community analytics. The day-keyed self-join is quadratic
    * in the per-day active set; that is inherent to co-occurrence
    * (every co-active pair must materialize once) — at 100 TB the
    * active sets are bucketed (join on (day, bucket) pairs) so no
    * single day funnels one task, and the count is map-side combined on
    * the (a, b) pair key. Pairs are id-ordered (a < b).
    *
    * Build-once lifecycle: the pair-count table is a corpus-level graph
    * index (same production shape as Dedup's LSH pair index) — built
    * once per (JVM, corpus), checkpointed, shared by every downstream
    * graph query. Bench attributes the build via its cold column. */
  def coPurchasePairCounts(s: SparkSession, d: String): DataFrame =
    Tables.dfArtifact(s, d, Seq("events"), "coPurchasePairCounts")(
      coPurchasePairCountsUncached(s, d))

  private def coPurchasePairCountsUncached(s: SparkSession, d: String): DataFrame = {
    val pd = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    pd.select(col("day"), col("user_id").as("ua"))
      .join(pd.select(col("day"), col("user_id").as("ub")), Seq("day"))
      .filter(col("ua") < col("ub"))
      .groupBy(col("ua"), col("ub")).agg(count(lit(1)).as("n_days"))
  }

  /** k-NEAREST-NEIGHBOR graph over the co-purchase weights: each user
    * keeps its k strongest partners (ties broken by partner id), the
    * kept picks union into an undirected edge set. A fixed-threshold
    * cut ("≥ N common days") makes the graph density an accident of
    * corpus scale — denser data silently explodes it; the kNN cut is
    * scale-invariant (≤ k·|users| edges at ANY corpus size) and is the
    * standard graph construction for similarity/affinity analytics.
    *
    * The build does NOT go through [[coPurchasePairCounts]]'s day-keyed
    * join: on a DENSE co-activity profile (this corpus: ~98% of user
    * pairs share ≥1 purchase day) that join re-enumerates every pair
    * once per common day (~6× amplification) and then aggregates the
    * flood — measured 10+ MINUTES at the 1M-event scale point. Instead:
    *   1. per-user sorted DAY-INDEX ARRAY (day index from the corpus
    *      min — one metadata action, Chunked-style; then
    *      sort_array(collect_set(di)) per user) — |active days| longs
    *      per user, NOT a dense span-wide bitmap: at per-user
    *      densities below span/32 the sorted array is both smaller
    *      and faster to intersect (469 popcount words vs ~66 array
    *      slots on the 82-year fixture, measured ~4×);
    *   2. pair weights by broadcast all-pairs: n_days = the codegen'd
    *      [[graft.functions.SortedIntersectCount]] two-pointer walk —
    *      O(|Da|+|Db|) per pair, no aggregation state, no shuffle
    *      (the |users|-row day-set table broadcasts);
    *   3. per-user top-k via the bounded [[graft.functions.TopKByAgg]]
    *      partial aggregate over the pair stream exploded both
    *      directions — per-partition state is |users seen| × a k-slot
    *      buffer, input streams through unsorted, and only the tiny
    *      partial buffers shuffle. The pair stream itself (Θ(users²)
    *      rows) is NEVER sorted and never crosses an exchange: both a
    *      row_number window (WindowGroupLimit still local-sorts the
    *      full stream before its Partial limit — measured spill-bound
    *      at the 10× scale point) and default ObjectHashAggregate
    *      (sort-based fallback past 128 distinct keys — same spill)
    *      degrade to an external sort of a quarter-billion rows, so
    *      the fallback threshold is scoped up to cover the per-task
    *      user cardinality (state stays ≤ ~150 B/user; size the
    *      threshold to executor memory at larger |users|/partition).
    * Regime choice — a PLANNER DECISION, made from two cheap stats over
    * the per-(user, day) activity set before any pair materializes:
    * the day-keyed join enumerates exactly Σ_day |active(day)|² rows
    * (output-sensitive — each co-active pair once per common day),
    * while block all-pairs scores exactly |users|² pairs; whichever
    * bound is smaller names the cheaper plan, so the dispatch is
    * `Σcnt² < |users|²` ([[ActivityStats.sparse]]). On this corpus
    * (~98% pair density, ~6 common days/pair) all-pairs wins ~6×; a
    * sparse corpus (users active on mostly-disjoint days) flips the
    * inequality and takes the day-keyed join. Both paths feed the same
    * top-k, produce identical counts (spec-asserted on both a dense
    * and a sparse fixture), and the choice costs two metadata
    * aggregates. A corpus with per-user active days approaching the
    * span (dense sets) would further flip the scorer to span/64-word
    * bitmaps with AND+popcount. Checkpointed per (corpus, k) — the kNN
    * edge set IS the graph index; Bench's cold column attributes the
    * build. */
  def coPurchaseKnnEdges(s: SparkSession, d: String, k: Int = 3): DataFrame =
    Tables.dfArtifact(s, d, Seq("events"), s"coPurchaseKnnEdges:$k") {
      val pd = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      knnEdgesFromActivity(s, pd, k)
    }

  /** The two regime stats plus the day-index base, one pass each over
    * the (user, day) activity set — tiny metadata actions against a
    * build-once index construction. */
  private[graft] case class ActivityStats(minDay: java.sql.Timestamp,
      spanDays: Long, nUsers: Long, dayPairRows: Long, activityRows: Long) {
    /** Day-keyed enumeration (Σ_day cnt² rows) beats |users|² scored
      * pairs ⇒ the output-sensitive sparse plan wins. */
    def sparse: Boolean = dayPairRows.toDouble < nUsers.toDouble * nUsers.toDouble
    /** 64-bit words per user bitmap covering the whole day span. */
    def spanWords: Int = ((spanDays + 63L) / 64L).toInt
    /** Driver/broadcast footprint of the full bitmap table: one
      * span-wide word row plus an 8-byte id and array overhead per
      * user — the budget check for the kernel regime. */
    def bitmapBytes: Long = nUsers * (spanWords * 8L + 24L)
  }

  private[graft] def activityStats(pd: DataFrame): ActivityStats = {
    val st = pd.agg(min(col("day")).as("mn"),
      (datediff(max(col("day")), min(col("day"))) + 1).cast(LongType).as("span"),
      countDistinct(col("user_id")).as("nu")).head()
    val dc = pd.groupBy(col("day")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("ss"), sum(col("c")).as("nrows")).head()
    ActivityStats(st.getTimestamp(0), st.getLong(1), st.getLong(2),
      dc.getLong(0), dc.getLong(1))
  }

  /** Blocks DERIVED from |users|, not hardcoded: B = ⌈users / 256⌉
    * bounds per-task work at ~(users/B)² ≈ 256² ≈ 65k intersections per
    * block combo at ANY corpus scale, so the task count — not the task
    * size — absorbs growth (the correct shape for quadratic total
    * work). Clamped to [4, 256]: the floor keeps ≥10 combos of
    * parallelism on small corpora, the ceiling bounds the i-side
    * fan-out (≤B rows per user) and the B(B+1)/2-row combo table
    * (≤33k rows broadcast). Edge content is B-invariant — every
    * unordered pair lands in exactly one (i ≤ j) combo for ANY B —
    * which the spec pins by hashing the edge set at two block
    * counts. */
  private[graft] val BlockTargetUsers = 256L

  private[graft] def knnBlockCount(nUsers: Long): Int =
    math.max(4L, math.min(256L,
      (nUsers + BlockTargetUsers - 1) / BlockTargetUsers)).toInt

  /** Broadcast budget for the dense path's day-set table: past this the
    * block join plans as a regular exchange hashed on the block id
    * (build side bounded at ~users/B rows per partition) instead of a
    * driver-side broadcast that would OOM first. */
  private[graft] val KnnBroadcastBudgetBytes = 128L * 1024 * 1024

  private[graft] def knnEdgesFromActivity(s: SparkSession, pd: DataFrame,
      k: Int, forceDense: Option[Boolean] = None,
      forceBlocks: Option[Int] = None): DataFrame = {
    graft.functions.Native.register(s)
    val stats = activityStats(pd)
    // fallback threshold scoped up so BOTH object aggregates here
    // (collect_set day sets, TopKByAgg) stay HASH-based — their
    // per-key state is bounded, only the default 128-key cutoff
    // would push them into a sort of the full input
    graft.Tuning.withConf(s,
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (1 << 20).toString) {
      val dense = forceDense.getOrElse(!stats.sparse)
      val pairs =
        if (dense)
          densePairs(s, pd, stats,
            forceBlocks.getOrElse(knnBlockCount(stats.nUsers)))
        else sparsePairs(pd)
      knnFromPairs(pairs, k)
    }
  }

  /** SPARSE regime: the output-sensitive day-keyed self-join — the same
    * plan as [[coPurchasePairCounts]] (bucketable on (day, bucket) at
    * scale), chosen when Σ_day cnt² < |users|². */
  private def sparsePairs(pd: DataFrame): DataFrame =
    pd.select(col("day"), col("user_id").as("ua"))
      .join(pd.select(col("day"), col("user_id").as("ub")), Seq("day"))
      .filter(col("ua") < col("ub"))
      .groupBy(col("ua"), col("ub")).agg(count(lit(1)).as("n_days"))

  /** DENSE regime: block-pair all-pairs enumeration. A raw theta
    * self-join would plan as BroadcastNestedLoopJoin — interpreted,
    * row-at-a-time, ~0.5M pairs/s. Decomposing into B(B+1)/2 block
    * combos turns it into two HASH equi-joins that whole-stage-codegen
    * fuses with the intersection scoring (measured ~20x faster). Each
    * unordered user pair lands in exactly one (i ≤ j) block combo;
    * same-block combos additionally order by id to kill self/dup
    * pairs. The i-side fan-out is ≤ B rows per user — bounded, even,
    * and independent of any hub structure. */
  private def densePairs(s: SparkSession, pd: DataFrame,
      stats: ActivityStats, blocks: Int): DataFrame = {
    import s.implicits._
    val B = blocks
    val di = datediff(col("day"),
      lit(new java.sql.Date(stats.minDay.getTime))).cast(LongType)
    val daySets = pd
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(di)).as("ds"))
      .localCheckpoint(true)
    val bp = (for (i <- 0 until B; j <- i until B) yield (i, j)).toDF("i", "j")
    val a = daySets.select(col("user_id").as("u_a"), col("ds").as("dsa"))
      .withColumn("i", pmod(col("u_a"), lit(B.toLong)).cast(IntegerType))
    val b = daySets.select(col("user_id").as("u_b"), col("ds").as("dsb"))
      .withColumn("j", pmod(col("u_b"), lit(B.toLong)).cast(IntegerType))
    // ~8 B per stored day index + ~32 B row overhead per user: under
    // the budget the day-set table broadcasts; past it the join runs
    // as an exchange on the block id (see KnnBroadcastBudgetBytes)
    val estBytes = stats.activityRows * 8L + stats.nUsers * 32L
    val bSide = if (estBytes <= KnnBroadcastBudgetBytes) broadcast(b) else b
    val common =
      graft.functions.Native.sortedIntersectCount(col("dsa"), col("dsb"))
    a.join(broadcast(bp), Seq("i"))
      .join(bSide, Seq("j"))
      .filter(col("i") < col("j") || col("u_a") < col("u_b"))
      .select(least(col("u_a"), col("u_b")).as("ua"),
        greatest(col("u_a"), col("u_b")).as("ub"), common.as("n_days"))
      .filter(col("n_days") >= 1L)
  }

  /** Shared tail of both regimes: per-user top-k via the bounded
    * [[graft.functions.TopKByAgg]] partial aggregate over the pair
    * stream exploded both directions (see the scaladoc's step 3 — the
    * pair stream never sorts and never crosses an exchange), then the
    * undirected union of kept picks, checkpointed. Ids are
    * nonnegative, so the -v tiebreak column cannot overflow. */
  private def knnFromPairs(pairs: DataFrame, k: Int): DataFrame = {
    val sym = pairs.select(explode(array(
        struct(col("ua").as("u"), col("ub").as("v"), col("n_days")),
        struct(col("ub").as("u"), col("ua").as("v"), col("n_days"))))
        .as("p"))
      .select(col("p.u"), col("p.v"), col("p.n_days"))
    sym.groupBy(col("u"))
      .agg(graft.functions.Native.topKBy(col("n_days"), -col("v"),
        col("v").cast(DoubleType), k).as("picks"))
      .select(col("u"), explode(col("picks")).as("pv"))
      .select(least(col("u"), col("pv").cast(LongType)).as("ua"),
        greatest(col("u"), col("pv").cast(LongType)).as("ub"))
      .distinct()
      .localCheckpoint(true)
  }

  /** TRIANGLE enumeration over the co-purchase kNN graph,
    * DEGREE-ORDERED — the classic distributed triangle algorithm (MR
    * node-iterator++): orient every edge from its lower-(degree, id)
    * endpoint to the higher; each triangle then has exactly one node
    * with two outgoing oriented edges, so wedges are generated from
    * out-edges only and every out-degree is bounded by O(√(2m))
    * regardless of how hot a hub vertex is — a star node with a million
    * neighbors generates ZERO wedges instead of 10¹² (it loses the
    * orientation to almost everyone). On a kNN graph out-degrees are
    * already small, but the orientation keeps the operator safe for ANY
    * edge set. Wedge closure is one equi-join against the id-ordered
    * edge set. Output: the triangle's three members, id-sorted — exact,
    * so the oracle is the naive 3-way join. */
  def coPurchaseTriangles(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    val edges = coPurchaseKnnEdges(s, d, k).select(col("ua"), col("ub"))
    val deg = edges.select(col("ua").as("u")).union(edges.select(col("ub").as("u")))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // orient each edge from lower (deg, id) to higher
    val oriented = edges
      .join(deg.select(col("u").as("ua"), col("deg").as("da")), Seq("ua"))
      .join(deg.select(col("u").as("ub"), col("deg").as("db")), Seq("ub"))
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("ua") < col("ub")),
          col("ua")).otherwise(col("ub")).as("src"),
        when(col("da") < col("db") || (col("da") === col("db") && col("ua") < col("ub")),
          col("ub")).otherwise(col("ua")).as("dst"))
    val wedges = oriented.select(col("src"), col("dst").as("x"))
      .join(oriented.select(col("src"), col("dst").as("y")), Seq("src"))
      .filter(col("x") < col("y"))
    wedges
      .join(edges.select(least(col("ua"), col("ub")).as("x"),
        greatest(col("ua"), col("ub")).as("y")), Seq("x", "y"), "left_semi")
      .select(array_sort(array(col("src"), col("x"), col("y"))).as("t"))
      .select(col("t").getItem(0).as("u1"), col("t").getItem(1).as("u2"),
        col("t").getItem(2).as("u3"))
      .orderBy(col("u1"), col("u2"), col("u3"))
  }

  /** FIXED-POINT PageRank over the kNN co-purchase graph: damping 0.85,
    * [[PageRankIters]] unrolled iterations, ranks carried as BIGINT
    * micro-units (10¹² per node of initial mass) with truncating
    * integer division — so the result is BIT-IDENTICAL on any engine
    * and any partitioning. Float PageRank is order-sensitive (parallel
    * sums re-associate; ranks drift in the last ulps and top-k orders
    * flip near ties); fixed-point arithmetic removes the float entirely:
    *   contrib(u)  = rank(u) div deg(u)
    *   rank'(v)    = (15·10¹²) div 100  +  (85 · Σ contrib(u→v)) div 100
    * Each iteration is the classic distributed shape — ranks ⋈ degrees
    * (same key, one partitioning), contribution fan-out along the
    * out-edges, map-side-combined sum keyed by destination. The
    * adjacency is symmetric (undirected graph), so every node has
    * in-edges and no dangling-mass term is needed. Overflow headroom —
    * sized to the WORST case, a hub that receives the entire mass: the
    * multiply `85 · sc` with sc ≤ n·unit must stay under 2⁶³, so
    * n ≤ 2⁶³/(85·unit) ≈ 1.08·10⁵ nodes at unit = 10¹²; each dropped
    * decimal of fixed-point scale buys one more decade of nodes
    * (n ≈ 1.08·10⁶ at 10¹¹, …). The unit AUTO-SCALES by node count
    * ([[pageRankUnitFor]]): corpora under 1.08·10⁵ nodes keep the full
    * 10¹² — so every committed oracle reading is bit-identical — and
    * each decade past it drops one decimal of scale instead of
    * throwing (the static oracle SQL mirrors the full-unit regime;
    * the scaled regime has no DuckDB-scale corpus to oracle). */
  val PageRankIters = 5
  val PageRankUnit = 1000000000000L
  /** Max node count before `85 · (total mass)` can exceed Long range. */
  def pageRankMaxNodes(unit: Long): Long = Long.MaxValue / 85L / unit

  /** Largest power-of-ten unit ≤ [[PageRankUnit]] whose hub-worst-case
    * accumulation `85 · n · unit` stays inside Long. Floor 100 keeps
    * the 15/100 damping base integral; past ~10¹³ nodes (never — that
    * is more users than humans) the require in [[pageRank]] still
    * names the failure. */
  private[graft] def pageRankUnitFor(n: Long): Long = {
    var u = PageRankUnit
    while (u > 100L && n > pageRankMaxNodes(u)) u /= 10L
    u
  }

  def pageRank(s: SparkSession, d: String, k: Int = 3,
      iters: Int = PageRankIters): DataFrame = {
    val edges = coPurchaseKnnEdges(s, d, k)
    val adj = edges.select(col("ua").as("u"), col("ub").as("v"))
      .union(edges.select(col("ub").as("u"), col("ua").as("v")))
    val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    // one tiny metadata action over the O(nodes) degree table — the
    // hub-worst-case overflow guard for the fixed-point accumulation
    val n = deg.count()
    val unit = pageRankUnitFor(n)
    require(n <= pageRankMaxNodes(unit),
      s"pageRank fixed-point unit $unit overflows Long past " +
        s"${pageRankMaxNodes(unit)} nodes (got $n); accumulate in Decimal")
    var ranks = deg.select(col("u"), lit(unit).as("r"))
    for (_ <- 1 to iters) {
      val contrib = adj
        .join(ranks.join(deg, Seq("u")), Seq("u"))
        .select(col("v"), expr("r div deg").as("c"))
      ranks = contrib.groupBy(col("v")).agg(sum(col("c")).as("sc"))
        .select(col("v").as("u"),
          (lit(unit / 100L * 15L) + expr("(85 * sc) div 100")).as("r"))
    }
    ranks.select(col("u").as("user_id"), col("r").as("rank_units"))
      .orderBy(col("user_id"))
  }

  /** CONNECTED COMPONENTS over the co-purchase kNN graph — the
    * community labeling that completes the graph family (edges →
    * triangles → PageRank → components). Reuses [[Dedup.components]]:
    * min-label propagation with pointer jumping, O(log diameter)
    * rounds, each round an equi-join + aggregate over 16-byte
    * (id, label) rows with convergence observed on the round's own
    * checkpoint action — no extra count job. Node set = the edge
    * endpoints (a user with no co-purchase partner has no kNN pick and
    * no component row, in both engines). Labels are the component's
    * minimum user id — exact, so the oracle is the same recursive-CTE
    * transitive closure already proved for the dedup clusters. */
  def coPurchaseComponents(s: SparkSession, d: String, k: Int = 3): DataFrame =
    Tables.dfArtifact(s, d, Seq("events"), s"coPurchaseComponents:$k") {
      // the labeled node set is a built artifact of the corpus, like
      // the kNN edge index it derives from: the O(log diameter)
      // propagation rounds run once per (corpus, k) and later calls
      // read the round-final checkpoint (Bench's cold column
      // attributes the build, same as every other per-corpus index)
      val edges = coPurchaseKnnEdges(s, d, k)
      val nodes = edges.select(col("ua").as("doc_id"))
        .union(edges.select(col("ub").as("doc_id"))).distinct()
      Dedup.components(nodes,
        edges.select(col("ua").as("id_a"), col("ub").as("id_b")))
        .select(col("doc_id").as("user_id"), col("component"))
    }.orderBy(col("user_id"))

  /** Markov TRANSITION counts: for each user's event sequence (ordered
    * by time, event_id tiebreak), count (from_type → to_type) steps —
    * the path-analysis / next-action model build. One user-keyed window
    * (lead), then a map-side-combined count over the 5×5 type matrix —
    * the shuffle after the window moves ≤ |types|² rows per partition. */
  def transitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** TIME-TO-CONVERT distribution — the funnel's missing axis (the
    * ordered funnel counts WHO converts; this measures HOW LONG):
    * per user, hours from the first view to the first strictly-later
    * purchase, reduced to exact median/p90 via the interpolated
    * percentile (bitwise equal to DuckDB's quantile_cont — the
    * winsorize precedent). Two partial-aggregating reductions (first
    * view per user, first qualifying purchase per user) joined on the
    * unique user key; the gap is integer microseconds divided once —
    * value-exact. Output is one summary row; the per-user gaps never
    * leave the executors except as two percentile buffers. */
  def funnelTime(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val tv = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("tvus"))
    val tp = e.filter(col("event_type") === "purchase")
      .join(tv, Seq("user_id"))
      .filter(col("us") > col("tvus"))
      .groupBy(col("user_id")).agg(min(col("us")).as("tpus"))
    tv.join(tp, Seq("user_id"))
      .select(((col("tpus") - col("tvus")) / lit(3600000000.0)).as("gap_h"))
      .agg(count(lit(1)).as("n_converted"),
        expr("percentile(gap_h, 0.5)").as("median_hours"),
        expr("percentile(gap_h, 0.9)").as("p90_hours"))
  }

  /** LAST-TOUCH ATTRIBUTION: each purchase credits the user's most
    * recent STRICTLY-PRIOR click (the marketing-analytics staple the
    * funnel doesn't answer — which touch converted, and after how
    * long). One user-keyed window with a `rowsBetween(-∞, −1)` frame
    * carries the latest click id/timestamp forward; purchases project
    * the credit and the integer-microsecond gap. Unattributed
    * purchases (no prior click) surface with NULL credit rather than
    * dropping. One shuffle on the high-cardinality user key, task
    * width = one user's history; output is purchases-only. All
    * integers — value-exact against the oracle. */
  def attribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn("click_us",
        last(when(col("event_type") === "click", col("us")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("click_id").as("attributed_click"),
        (col("us") - col("click_us")).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** Top event-type TRIGRAM paths — sequence mining over per-user
    * event streams (the "what do users actually do" product-analytics
    * staple): two lead() windows per user in deterministic
    * (ts, event_id) order turn each position into its 3-step path,
    * then one partial-aggregating count and a TakeOrderedAndProject
    * top-k. Per-user windows bound the sort tasks by user activity —
    * no global sequence materializes, and the path space (|types|³)
    * keeps the aggregate map-side-combinable at any corpus size. */
  def funnelPaths(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(k)
  }
}
