package graft

import org.apache.spark.sql.functions._

/** Table-maintenance operators (ops.Maintain). */
class MaintainSpec extends SparkSpec {

  test("merge equals a hand-computed upsert/delete over the collected fixture") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val cutUs = java.time.Instant.parse("2024-01-04T00:00:00Z").toEpochMilli * 1000L
    def latestPerKey(rs: Seq[(Long, String, Long, Long, Double)]) =
      rs.groupBy(r => (r._1, r._2)).map { case (k, g) =>
        k -> g.maxBy(r => (r._3, r._4))._5
      }
    val base = latestPerKey(rows.filter(_._3 < cutUs).toSeq)
    val chg = latestPerKey(rows.filter(_._3 >= cutUs).toSeq)
    val expect = (base.keySet ++ chg.keySet).flatMap { k =>
      chg.get(k) match {
        case Some(v) if v < 3.0 => None                       // delete marker
        case Some(v) => Some(k -> (v, base.contains(k), false))
        case None    => Some(k -> (base(k), false, false))
      }
    }.map { case (k, (v, updated, _)) =>
      k -> (v, updated, !base.contains(k))
    }.toMap
    val got = q("q_merge_upsert").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getBoolean(3), r.getBoolean(4))).toMap
    assert(got == expect)
    // all three merge actions actually occur on the fixture
    assert(got.values.exists(_._2), "no updates exercised")
    assert(got.values.exists(_._3), "no inserts exercised")
    assert((base.keySet ++ chg.keySet).size > got.size, "no deletes exercised")
  }

  test("incremental rollup merge equals the from-scratch aggregate bit for bit") {
    val got = q("q_incr_rollup").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val full = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == full && got.nonEmpty)
  }
}
