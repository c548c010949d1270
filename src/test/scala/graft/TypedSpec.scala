package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The typed Aggregator must agree bit-for-bit with the untyped
  * Column formulation of the same decimal-moment algebra — the two
  * API surfaces are views of one engine, not two engines. */
class TypedSpec extends SparkSpec {

  test("typed moments == untyped decimal-moment aggregation, bitwise") {
    val typed = q("q_typed_moments").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val vd = col("value").cast(DecimalType(18, 2))
    val untyped = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(vd).cast(DoubleType).as("sx"),
        sum(vd * vd).cast(DoubleType).as("sxx"))
      .select(col("event_type"), col("n"),
        (col("sx") / col("n")).as("mean"),
        ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          .as("variance"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(typed == untyped)
  }

  test("typed cogroup attribution == the window-operator derivation") {
    val cg = q("q_typed_cogroup").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val win = q("q_attribution").groupBy(col("user_id"))
      .agg(count(lit(1)).as("np"),
        sum(when(col("attributed_click").isNotNull, 1L).otherwise(0L)).as("na"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cg == win)
  }
}
