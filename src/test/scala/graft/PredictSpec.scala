package graft

import graft.ops.Predict
import org.apache.spark.sql.functions._

/** Batched model-inference operator (SURVEY §2.10 M2/M3 real shape). */
object PredictSpec {
  val prepares   = new java.util.concurrent.atomic.AtomicInteger(0)
  val batchCalls = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Predictor that counts lifecycle calls through a JVM-static counter
  * (local-mode executors share the JVM, so the counts are exact). */
class CountingPredictor extends Predict.Predictor {
  override def prepare(): Unit = { PredictSpec.prepares.incrementAndGet(); () }
  override def predictBatch(ws: Array[Array[Double]]): Array[Double] = {
    PredictSpec.batchCalls.incrementAndGet()
    super.predictBatch(ws)
  }
  override def predict(lastK: Seq[Double]): Double =
    Predict.LinearPredictor.predict(lastK)
}

class PredictSpec extends SparkSpec {

  test("batched inference: values equal the row-at-a-time path") {
    val batched = Predict
      .predictAllWindowsBatched(spark, sf, 60, Predict.LinearPredictor)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val rowPath = Predict.predictAllWindows(spark, sf, 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(batched == rowPath)
  }

  test("predictor inits once per partition, predicts once per buffer — never per row") {
    PredictSpec.prepares.set(0)
    PredictSpec.batchCalls.set(0)
    val n = Predict
      .predictAllWindowsBatched(spark, sf, 60, new CountingPredictor, batchSize = 200)
      .count().toInt
    val prepares = PredictSpec.prepares.get()
    val batches  = PredictSpec.batchCalls.get()
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(n > 0)
    assert(prepares >= 1 && prepares <= parts,
      s"prepare() must fire once per partition task, got $prepares (parts=$parts)")
    assert(batches >= 1 && batches < n,
      s"predictBatch must be called per buffer, not per row: $batches calls for $n windows")
    assert(batches <= prepares * (n / 200 + 1))
  }

  test("GRU forward pass: deterministic, finite, batch == row-at-a-time") {
    val gru = new Predict.GruPredictor()
    val w1 = Array.tabulate(60)(i => 100.0 + i * 0.5)
    val w2 = w1.map(_ * 2.0)
    assert(gru.predict(w1.toIndexedSeq) == gru.predict(w1.toIndexedSeq))
    val b = gru.predictBatch(Array(w1, w2))
    assert(b(0) == gru.predict(w1.toIndexedSeq))
    assert(b(1) == gru.predict(w2.toIndexedSeq))
    b.foreach(p => assert(java.lang.Double.isFinite(p)))
    // relative-head readout keeps predictions in the price's magnitude
    assert(math.abs(b(0) / w1.last - 1.0) < 1.0)
  }

  test("q_predict_gru covers every complete window, like the linear path") {
    assert(q("q_predict_gru").count() == q("q_predict_windows").count())
  }
}
