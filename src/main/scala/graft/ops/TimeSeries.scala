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

  /** Top-k windows by Pearson correlation with the query window (the
    * complete window holding the globally smallest event_id — a
    * deterministic, oracle-expressible pick standing in for a
    * user-supplied pattern). Windows with zero variance are excluded on
    * both sides identically. The self-match ranks first with corr 1 by
    * construction — kept, deterministic. */
  def searchByShape(s: SparkSession, d: String, w: Int = 20,
      k: Int = 25): DataFrame = {
    val wins = windows(s, d, w)
    val q = wins.orderBy(col("event_id")).limit(1)
      .select(col("win").as("qwin"), col("sm").as("qsm"), col("ss").as("qss"))
    val wd = lit(w.toDouble)
    val m  = col("sm") / wd
    val qm = col("qsm") / wd
    val num = graft.functions.Native.dot(
      col("win").cast(ArrayType(DoubleType)),
      col("qwin").cast(ArrayType(DoubleType))) - wd * m * qm
    val den = sqrt(col("ss") - wd * m * m) * sqrt(col("qss") - wd * qm * qm)
    wins.crossJoin(broadcast(q))
      .filter(col("ss") - wd * m * m > 0 && col("qss") - wd * qm * qm > 0)
      .select(col("event_id"), col("event_type"), (num / den).as("corr"))
      .orderBy(col("corr").desc, col("event_id"))
      .limit(k)
      .orderBy(col("event_id"))
  }
}
