package graft

import graft.ops.Maintain
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

  test("snapshot diff derives all three change types and matches a hand recompute") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    def us(iso: String) = java.time.Instant.parse(iso).toEpochMilli * 1000L
    def snap(lo: String, hi: String) =
      rows.filter(r => r._3 >= us(lo) && r._3 < us(hi)).toSeq
        .groupBy(r => (r._1, r._2)).map { case (k, g) => k -> g.maxBy(r => (r._3, r._4))._5 }
    val a = snap("2024-01-01T00:00:00Z", "2024-01-11T00:00:00Z")
    val b = snap("2024-01-20T00:00:00Z", "2024-01-30T00:00:00Z")
    val expect = (a.keySet ++ b.keySet).flatMap { k =>
      (a.get(k), b.get(k)) match {
        case (None, Some(v))              => Some(k -> ("insert", None, Some(v)))
        case (Some(v), None)              => Some(k -> ("delete", Some(v), None))
        case (Some(x), Some(y)) if x != y => Some(k -> ("update", Some(x), Some(y)))
        case _                            => None
      }
    }.toMap
    val got = q("q_snapshot_diff").collect().map { r =>
      (r.getLong(0), r.getString(1)) -> (r.getString(4),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))
    }.toMap
    assert(got == expect)
    assert(got.values.exists(_._1 == "delete") && got.values.exists(_._1 == "update"))
    // sf0.001's 75 keys are all active in both windows (no inserts); the
    // oracle-gate corpus exercises all three change types — pin it there
    val gateTypes = SparkEntry.queries("q_snapshot_diff")(spark, "/root/testdata/sf0.01")
      .select(col("change")).distinct().collect().map(_.getString(0)).toSet
    assert(gateTypes == Set("insert", "delete", "update"))
  }

  test("compaction reduces the file count to the size-target plan, content unchanged") {
    val small = Maintain.partFiles(spark, Maintain.smallFilesDir(spark, sf))
    assert(small.size == Maintain.SmallFileCount)
    val target = 128L * 1024 * 1024
    val expectFiles = math.max(1L, (small.map(_.getLen).sum + target - 1) / target).toInt
    val compacted = Maintain.partFiles(spark, Maintain.compactedDir(spark, sf))
    assert(compacted.size == expectFiles)
    assert(compacted.size < small.size)
    // content identity: compacted rows == source rows (the oracle states
    // the same at sf0.01; this pins it in-suite at sf0.001)
    val src = Tables.events(spark, sf).count()
    assert(q("q_compact").count() == src)
  }
}
