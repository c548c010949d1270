package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-inference surface (SURVEY.md §2.10 M1-M3).
  *
  * The reference runs a Keras LSTM on the driver over collected series
  * (`stream_consumer.py:50-54`, `batch_processor.py:88-101`). The LSTM
  * weights can't be exported in this sandbox (SURVEY §7 R1), so the
  * predictor is a pluggable trait with a deterministic linear-extrapolation
  * default that has the exact same dataflow signature: last-k ordered
  * prices in → one predicted price out. The predictor runs INSIDE the plan
  * as a UDF over a window-collected array — executors each predict their
  * own series; only final prediction rows move, never raw series
  * (eliminates the reference's driver-collect cliff at
  * `stream_consumer.py:72` / `batch_processor.py:114`).
  */
object Predict {

  /** last-k scaled prices → next price. Same shape as the reference's
    * `predict_next_price` (`stream_consumer.py:50-54`). */
  trait Predictor extends Serializable {
    def predict(lastK: Seq[Double]): Double
  }

  /** Deterministic default: linear extrapolation of the lookback window,
    * next = last + (last − first)/(k−1). Bit-reproducible, so it stays
    * oracle-comparable (the DuckDB oracle states the same IEEE ops). */
  object LinearPredictor extends Predictor {
    override def predict(lastK: Seq[Double]): Double = {
      val lastV = lastK.last
      if (lastK.size < 2) lastV
      else lastV + (lastV - lastK.head) / (lastK.size - 1).toDouble
    }
  }

  /** M1 — next-value prediction per series from the last k observations.
    * Window collect_list over an ORDERED frame (deterministic — SURVEY §7
    * R2), pruned to the newest row per series before the UDF fires, so the
    * predictor runs once per series, not once per row. */
  def predictNext(s: SparkSession, d: String, k: Int = 5,
      predictor: Predictor = LinearPredictor): DataFrame = {
    val predictUdf = udf((xs: Seq[Double]) => predictor.predict(xs))
    val asc  = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val lastK = asc.rowsBetween(-(k - 1), 0)
    val newestFirst = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .select(col("event_type"), col("ts"), col("event_id"),
        collect_list(col("value")).over(lastK).as("lookback"))
      .withColumn("rn", row_number().over(newestFirst))
      .filter(col("rn") === 1 && size(col("lookback")) === k)
      .select(col("event_type"), predictUdf(col("lookback")).as("predicted"))
      .orderBy(col("event_type"))
  }

  /** M2 — batch inference over every stride-1 length-k window (reference
    * `make_predictions`, `batch_processor.py:88-101`): one prediction per
    * complete window, fully distributed. */
  def predictAllWindows(s: SparkSession, d: String, k: Int = 60,
      predictor: Predictor = LinearPredictor): DataFrame = {
    val predictUdf = udf((xs: Seq[Double]) => predictor.predict(xs))
    val frame = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-(k - 1), 0)
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        collect_list(col("value")).over(frame).as("w"))
      .filter(size(col("w")) === k)
      .select(col("event_id"), col("event_type"),
        predictUdf(col("w")).as("predicted"))
      .orderBy(col("event_id"))
  }
}
