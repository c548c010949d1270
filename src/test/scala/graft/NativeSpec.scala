package graft

import graft.functions.Native
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Native codegen expressions: bit-parity with the declarative forms. */
class NativeSpec extends SparkSpec {

  test("native dot product is bit-identical to the HOF fold") {
    Native.register(spark)
    val e = Tables.embeddings(spark, sf)
    val both = e.select(
      Similarity.cosine(col("embedding"), col("embedding")).as("hof"),
      Similarity.cosineNative(col("embedding"), col("embedding")).as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() == 0)
    val pairs = e.select(col("vec_id"), col("embedding"))
      .crossJoin(e.select(col("vec_id").as("v2"), col("embedding").as("e2")).limit(3))
      .select(Similarity.cosine(col("embedding"), col("e2")).as("hof"),
        Similarity.cosineNative(col("embedding"), col("e2")).as("native"))
    assert(pairs.filter(col("hof") =!= col("native")).count() == 0)
  }

  test("rolling hash: deterministic, sensitive to content and order") {
    Native.register(spark)
    val df = spark.createDataFrame(Seq(
      Tuple1("abc"), Tuple1("acb"), Tuple1("abc"), Tuple1(""))).toDF("s")
    val hs = df.select(Native.rollingHash(col("s"))).collect().map(_.getLong(0))
    assert(hs(0) == hs(2))      // same content, same hash
    assert(hs(0) != hs(1))      // order matters
    assert(hs(3) == 0L)         // empty string hashes to 0
    // matches the scalar recurrence
    val expected = "abc".getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + (b & 0xFF))
    assert(hs(0) == expected)
  }

  test("as-of join returns the latest prior click, salted agg matches plain groupBy") {
    val asof = q("q_join_asof")
    assert(asof.count() ==
      Tables.events(spark, sf).filter(col("event_type") === "purchase").count())
    val salted = q("q_agg_salted").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val plain = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(graft.ops.Aggregates.dsum(col("value")).as("t"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == plain)
  }
}
