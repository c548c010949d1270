package graft

import org.apache.spark.sql.functions._

/** Runtime-optimizer surface: dynamic partition pruning and runtime
  * bloom-filter join pruning — the two mechanisms that cut a fact scan
  * at RUN time from a dimension-side filter, which no static pushdown
  * can do. Plan-level assertions: the point is that the machinery
  * engages on our plans, so a 100 TB fact scan would read only the
  * partitions / rows the joined dimension admits. */
class OptimizerSpec extends SparkSpec {

  test("dynamic partition pruning: dim filter prunes the fact's partition scan") {
    val dir = graft.ops.Relational.partitionedEventsDir(spark, sf)
    val fact = spark.read.parquet(dir)   // hive-partitioned by event_type
    // dimension filtered on a NON-join attribute: only DPP can translate
    // this into fact-side partition pruning, at runtime
    val dim = Tables.events(spark, sf)
      .select(col("event_type")).distinct()
      .withColumn("tier", length(col("event_type")))
      .filter(col("tier") >= 6)
    val joined = fact.join(dim, Seq("event_type"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in:\n${plan.take(1500)}")
    // and the pruned result is still correct
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sf)
      .filter(length(col("event_type")) >= 6)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("runtime bloom filter injects might_contain on the large side of a shuffle join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // the size thresholds exist to skip tiny tables — zero them so the
      // toy fixture exercises the 100 TB code path
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")   // force SMJ
      val big = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("value"))
      // the injection rule requires the creation side to be a selective
      // FILTER directly over a scan (project/filter only — an aggregate
      // such as distinct() defeats the pattern match)
      val selective = Tables.events(spark, sf)
        .filter(col("event_type") === "purchase" && col("value") > 40)
        .select(col("user_id"))
      val joined = big.join(selective, Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom-filter might_contain runtime filter in:\n${plan.take(1500)}")
      // the filter is pruning-only — results match the plain join
      val n = joined.count()
      val want = big.join(selective.hint("broadcast"), Seq("user_id")).count()
      assert(n == want && n > 0)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }
}
