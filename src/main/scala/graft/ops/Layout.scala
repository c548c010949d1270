package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-LAYOUT operators: how rows are ORDERED on disk is a first-class
  * 100 TB concern — parquet row-group min/max statistics prune scans
  * only when the write order groups related rows together.
  */
object Layout {

  /** One bit-spread stage of the Morton interleave (SQL fragment —
    * Spark and the DuckDB oracle run the identical integer algebra). */
  private def spread(x: String, sh: Int, mask: Long): String =
    s"($x | shiftleft($x, $sh)) & $mask"

  /** Z-ORDER (Morton) clustering key over two dimensions (user_id ×
    * day): each dimension min-max-scales to 16 bits with pure integer
    * arithmetic, the bits interleave via the classic shift-and-mask
    * spreads, and rows sort by the resulting 32-bit z value. Sorting a
    * table by z before writing gives every parquet row group a TIGHT
    * bounding box in BOTH dimensions — min/max stats then prune scans
    * for 2-D predicates (user range × date range), which no
    * single-column sort can do. This is the layout step behind
    * OPTIMIZE ZORDER in lakehouse engines, expressed as a plain
    * deterministic projection: stats broadcast (one tiny row), the
    * z computation is per-row codegen'd integer ops, and the only
    * shuffle is the final range sort — exactly the write-path sort the
    * layout exists to feed. LayoutSpec quantifies the pruning win vs a
    * hash layout on the same data. */
  def zorder(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("day"))
    val stats = e.agg(min(col("user_id")).as("umin"), max(col("user_id")).as("umax"),
      min(col("day")).as("dmin"), max(col("day")).as("dmax"))
    e.crossJoin(broadcast(stats))
      .selectExpr("event_id",
        "(user_id - umin) * 65536 div (umax - umin + 1) AS xi",
        "cast(datediff(day, dmin) as bigint) * 65536 div (cast(datediff(dmax, dmin) as bigint) + 1) AS yi")
      .selectExpr("event_id",
        spread("xi", 8, 0x00FF00FFL) + " AS x", spread("yi", 8, 0x00FF00FFL) + " AS y")
      .selectExpr("event_id",
        spread("x", 4, 0x0F0F0F0FL) + " AS x", spread("y", 4, 0x0F0F0F0FL) + " AS y")
      .selectExpr("event_id",
        spread("x", 2, 0x33333333L) + " AS x", spread("y", 2, 0x33333333L) + " AS y")
      .selectExpr("event_id",
        spread("x", 1, 0x55555555L) + " AS x", spread("y", 1, 0x55555555L) + " AS y")
      .selectExpr("event_id", "x | (y * 2) AS z")
      .selectExpr("event_id", "z", "z div 67108864 AS zbucket")   // top 6 bits
      .orderBy(col("z"), col("event_id"))
  }
}
