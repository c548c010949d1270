package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Overlapped time-chunk repartitioning for the stride-1 window family.
  *
  * The plain formulation — `Window.partitionBy(series).orderBy(time)`
  * with a `rowsBetween(-(k-1), 0)` frame — funnels EVERY row of a series
  * through one sort task: with a handful of hot series (the reference
  * domain has ~5 symbols, `batch_processor.py:89-97`) a 100× corpus
  * still runs on ~5 tasks, each materializing a k× row amplification.
  * That is the last scale-killer of the window family.
  *
  * Fix: split each series into row-count-bounded chunks that respect
  * event-time order, replicate each chunk's trailing k−1 rows into its
  * successor chunk (the "warm-up" overlap), evaluate the frames WITHIN
  * chunks — where the warm-up rows make every native frame complete —
  * and drop the warm-up rows' own outputs. Output is row-identical to
  * the plain window (the oracle hashes must not move), but the work is
  * spread over (total rows / chunk size) bounded tasks instead of one
  * task per series.
  *
  * Chunk assignment never globally sorts either; it is three cheap,
  * fully distributed steps:
  *   1. one `percentile_approx` pass over the time column → B global
  *      time boundaries (collected once, re-embedded as literals; the
  *      boundary VALUES only steer balance, never correctness);
  *   2. one tiny count per (series, candidate-chunk) → a driver-side
  *      greedy merge ([[mergeChunks]]) guaranteeing every non-final
  *      chunk holds ≥ max(k−1, minChunkRows) rows (so the k−1 warm-up
  *      rows always cover the lookback across a boundary — checked by
  *      construction, not hoped for);
  *   3. the main pass: a broadcast-joined (series, candidate → chunk)
  *      map, a per-chunk bounded sort tagging the trailing k−1 rows,
  *      the union with their warm-up copies, and the framed window over
  *      (series, chunk).
  *
  * Known limit: rows tie-break by time first, so a series concentrated
  * on ONE timestamp value cannot be split (boundaries compare on time
  * alone to keep the candidate key a pure codegen'd column). Real tick
  * streams disperse in time; the degenerate case degrades to the old
  * one-task behavior, never to wrong results.
  */
object Chunked {

  /** Greedy merge of candidate-chunk counts into final chunks, in
    * candidate order: close a chunk once it holds ≥ minRows, fold an
    * undersized trailing chunk into its predecessor (it has no
    * successor needing warm-up; tiny tasks are not worth scheduling).
    * Returns candidate → final chunk id (0-based, order-preserving).
    * Pure function, unit-tested directly in WindowSpec. */
  private[graft] def mergeChunks(counts: Seq[(Int, Long)], minRows: Long): Map[Int, Int] = {
    val sorted = counts.sortBy(_._1)
    val out = scala.collection.mutable.LinkedHashMap[Int, Int]()
    var fc = 0
    var acc = 0L
    var started = false
    for ((cc, n) <- sorted) {
      if (started && acc >= minRows) { fc += 1; acc = 0L }
      out(cc) = fc
      acc += n
      started = true
    }
    if (fc > 0 && acc < minRows) {
      val trailing = out.collect { case (cc, f) if f == fc => cc }.toList
      trailing.foreach(out(_) = fc - 1)
    }
    out.toMap
  }

  /** The (series, candidateChunk) → finalChunk assignment as a tiny
    * broadcastable DataFrame, plus the candidate-chunk column expression
    * (a codegen'd sum of boundary comparisons — no UDF, no HOF).
    * Exposed package-private so the skew spec can assert a hot series
    * actually splits into >1 chunk. */
  private[graft] def chunkPlan(df: DataFrame, series: String, time: String,
      minRows: Long, nBoundaries: Int): (Column, DataFrame) = {
    val s = df.sparkSession
    val micros = unix_micros(col(time))
    val probs = (1 until nBoundaries).map(_.toDouble / nBoundaries)
    val bRow = df.select(percentile_approx(micros,
      array(probs.map(lit): _*), lit(10000)).as("bs")).head()
    val bs: Seq[Long] =
      if (bRow.isNullAt(0)) Seq.empty
      else bRow.getSeq[Long](0).distinct.sorted
    val ccExpr: Column =
      if (bs.isEmpty) lit(0)
      else bs.map(b => when(micros > lit(b), 1).otherwise(0)).reduce(_ + _)
    val counts = df.groupBy(col(series).as("_s"), ccExpr.as("_cc"))
      .count().collect()
    val bySeries = counts.groupBy(_.get(0))
    val sField = df.schema(series)
    val mapSchema = StructType(Seq(
      StructField(series, sField.dataType, sField.nullable),
      StructField("_cc", IntegerType, nullable = false),
      StructField("_fc", IntegerType, nullable = false)))
    val mapRows = bySeries.toSeq.flatMap { case (sv, rows) =>
      val m = mergeChunks(rows.map(r => (r.getInt(1), r.getLong(2))).toSeq, minRows)
      m.toSeq.map { case (cc, fc) => Row(sv, cc, fc) }
    }
    val mapping = s.createDataFrame(
      s.sparkContext.parallelize(mapRows, 1), mapSchema)
    (ccExpr, mapping)
  }

  /** Evaluate `rowsBetween(-(k-1), 0)` frame columns over each series in
    * (time, id) order with bounded task sizes. `frameCols` builds the
    * caller's frame columns from the chunked WindowSpec; an internal
    * frame count keeps only COMPLETE windows (the family's shared
    * `w_cnt === k` filter), so callers get exactly the plain window's
    * qualifying rows plus their frame columns. */
  def frames(df: DataFrame, series: String, time: String, id: String, k: Int,
      minChunkRows: Long = 8192, nBoundaries: Int = 32)
      (frameCols: WindowSpec => Seq[Column]): DataFrame = {
    require(k >= 1, "window length must be >= 1")
    val minRows = math.max((k - 1).toLong, minChunkRows)
    val (ccExpr, mapping) = chunkPlan(df, series, time, minRows, nBoundaries)
    val based = df.withColumn("_cc", ccExpr)
      .join(broadcast(mapping), Seq(series, "_cc"))
    // tag each chunk's trailing k−1 rows (bounded per-chunk sort), then
    // replicate them into the successor chunk as warm-up
    val wDesc = Window.partitionBy(col(series), col("_fc"))
      .orderBy(col(time).desc, col(id).desc)
    val tagged = based.withColumn("_rd", row_number().over(wDesc))
    val warm = tagged.filter(col("_rd") <= k - 1)
      .withColumn("_fc", col("_fc") + 1)
      .withColumn("_warm", lit(true))
    val all = tagged.withColumn("_warm", lit(false)).unionByName(warm)
    val w = Window.partitionBy(col(series), col("_fc"))
      .orderBy(col(time), col(id)).rowsBetween(-(k - 1), 0)
    val outCols = df.columns.map(col).toSeq ++ frameCols(w) :+
      count(lit(1)).over(w).as("_n") :+ col("_warm")
    all.select(outCols: _*)
      .filter(!col("_warm") && col("_n") === k)
      .drop("_n", "_warm")
  }
}
