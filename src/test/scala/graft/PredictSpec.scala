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

  test("prepare() fires exactly once per task at the bench partition count (32)") {
    // the 8-partition assertion above can't catch a regression that
    // surfaces only at the production parallelism (e.g. a per-row
    // prepare hidden behind few tasks); this one runs the operator at
    // the Bench shuffle-partition count and demands EXACT equality
    // with the task count. AQE is disabled inside the scope so the
    // post-shuffle partition count is deterministic and identical
    // between the probe pipeline and the operator run.
    import org.apache.spark.sql.functions._
    PredictSpec.prepares.set(0)
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Tuning.withShufflePartitions(spark, 32) {
      // the operator consumes the SHARED window-array artifact
      // (Chunked.windowArrays); with spread=true it REPARTITIONS to the
      // session's default parallelism before the compute-bound
      // inference stage (the GRU/LSTM operating point — r17: the
      // artifact's (series, chunk) partitioning left the recurrence
      // near-serial) — the task count the mapPartitions stage sees is
      // exactly that width, empty partitions included (prepare() fires
      // before the batch loop)
      val expectedParts = spark.sparkContext.defaultParallelism
      val n = Predict
        .predictAllWindowsBatched(spark, sf, 60, new CountingPredictor,
          spread = true)
        .count()
      assert(n > 0)
      assert(expectedParts >= 1,
        s"chunked windows should carry >= 1 partition, got $expectedParts")
      assert(PredictSpec.prepares.get() == expectedParts,
        s"prepare() must fire exactly once per partition task: " +
          s"${PredictSpec.prepares.get()} calls vs $expectedParts partitions")
    } finally spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
  }

  test("default (linear) all-windows path rides the artifact partitioning — no spread exchange") {
    // r17: the unconditional repartition helped the GRU recurrence but
    // cost the cheap linear predictor a 100k×60-double exchange
    // (q_predict_windows 0.21 → 0.94 s). The default path must consume
    // the window artifact's own layout: prepare() fires exactly once
    // per ARTIFACT partition, not once per default-parallelism task.
    PredictSpec.prepares.set(0)
    val artifactParts =
      graft.ops.Chunked.windowArrays(spark, sf, 60).rdd.getNumPartitions
    val n = Predict
      .predictAllWindowsBatched(spark, sf, 60, new CountingPredictor)
      .count()
    assert(n > 0)
    assert(PredictSpec.prepares.get() == artifactParts,
      s"default path must not repartition the window artifact: " +
        s"${PredictSpec.prepares.get()} prepare() calls vs " +
        s"$artifactParts artifact partitions")
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

  test("GRU weights load from an external file and match a hand-computed forward pass") {
    val wtxt =
      """# trained-model export fixture (hidden=1)
        |hidden:1
        |wz:0.5
        |uz:0.25
        |bz:0.1
        |wr:-0.3
        |ur:0.2
        |br:0.0
        |wh:0.8
        |uh:-0.5
        |bh:0.05
        |wOut:1.5
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("gru_", ".weights")
    java.nio.file.Files.write(f, wtxt.getBytes("UTF-8"))
    val p = Predict.GruPredictor.fromFile(f.toString)
    // independent scalar re-derivation of the documented cell equations
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))
    val xs = Seq(100.0, 110.0, 121.0)
    val base = xs.last
    var h = 0.0
    xs.foreach { x0 =>
      val x = x0 / base - 1.0
      val z = sig(0.5 * x + 0.25 * h + 0.1)
      val r = sig(-0.3 * x + 0.2 * h + 0.0)
      val cand = math.tanh(0.8 * x + -0.5 * r * h + 0.05)
      h = (1.0 - z) * h + z * cand
    }
    val expected = base * (1.0 + 1.5 * h)
    assert(p.predict(xs) == expected, s"${p.predict(xs)} != $expected")
    // a file-loaded predictor is a drop-in for the seeded one
    assert(p.predictBatch(Array(xs.toArray))(0) == expected)
  }

  test("misshapen weight files fail loudly on load") {
    intercept[IllegalArgumentException] {
      Predict.GruPredictor.parseWeights("hidden:2\nwz:0.1\n") // missing tensors
    }
    intercept[IllegalArgumentException] {
      Predict.GruPredictor.parseWeights(
        "hidden:2\nwz:1,2\nuz:1,2,3\nbz:1,2\nwr:1,2\nur:1,2,3,4\nbr:1,2\n" +
        "wh:1,2\nuh:1,2,3,4\nbh:1,2\nwOut:1,2") // uz is 3 values, needs 4
    }
  }

  test("LSTM forward pass matches a hand-computed single-cell unroll (both activations)") {
    // one layer, hidden=1 — every gate is a scalar, so the documented
    // cell equations re-derive independently in plain arithmetic
    def layer = Predict.LstmLayerWeights(1, 1,
      Array(0.5), Array(0.25), Array(0.1),   // i
      Array(-0.3), Array(0.2), Array(0.0),   // f
      Array(0.8), Array(-0.5), Array(0.05),  // g (candidate)
      Array(0.4), Array(0.3), Array(-0.1))   // o
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))
    val xs = Seq(100.0, 110.0, 121.0)
    val base = xs.last
    for (activation <- Seq("tanh", "relu")) {
      val p = new Predict.LstmPredictor(
        Predict.LstmWeights(Seq(layer), Array(1.5), activation))
      def act(x: Double) =
        if (activation == "relu") math.max(0.0, x) else math.tanh(x)
      var h = 0.0; var c = 0.0
      xs.foreach { x0 =>
        val x = x0 / base - 1.0
        val i = sig(0.5 * x + 0.25 * h + 0.1)
        val f = sig(-0.3 * x + 0.2 * h + 0.0)
        val g = act(0.8 * x + -0.5 * h + 0.05)
        val o = sig(0.4 * x + 0.3 * h + -0.1)
        c = f * c + i * g
        h = o * act(c)
      }
      val expected = base * (1.0 + 1.5 * h)
      assert(p.predict(xs) == expected,
        s"$activation: ${p.predict(xs)} != $expected")
    }
  }

  test("LSTM reference shape (64->32, relu): deterministic, finite, batch == row-at-a-time") {
    val p = new Predict.LstmPredictor()
    assert(p.weights.layers.map(l => (l.input, l.hidden)) == Seq((1, 64), (64, 32)),
      "default must match lstm_model.keras: LSTM(64) -> LSTM(32)")
    assert(p.weights.activation == "relu")
    val w1 = Array.tabulate(60)(i => 100.0 + i * 0.5)
    val w2 = w1.map(_ * 2.0)
    assert(p.predict(w1.toIndexedSeq) == p.predict(w1.toIndexedSeq))
    val b = p.predictBatch(Array(w1, w2))
    assert(b(0) == p.predict(w1.toIndexedSeq))
    assert(b(1) == p.predict(w2.toIndexedSeq))
    b.foreach(x => assert(java.lang.Double.isFinite(x)))
    // zero-base law: predicted = base * (1 + out) -> exactly 0
    assert(p.predict(Seq(1.0, 2.0, 0.0)) == 0.0)
  }

  test("q_predict_lstm covers every complete window inside the reference's fetch bound") {
    // the LSTM runs at the reference's operating point — windows derived
    // within the top-10k fetch slice (batch_processor.py:76). This
    // fixture is smaller than the bound, so the slice IS the corpus and
    // the bounded derivation must agree with the unbounded one exactly
    assert(Tables.events(spark, sf).count() <= 10000,
      "fixture outgrew the fetch bound; pick the slice assertions apart")
    assert(q("q_predict_lstm").count() == q("q_predict_windows").count())
    assert(
      q("q_predict_lstm").select("event_id").collect().map(_.getLong(0)).sorted
        .sameElements(
          q("q_predict_windows").select("event_id").collect().map(_.getLong(0)).sorted))
  }

  test("LSTM weights round-trip through the text export format") {
    val layer = Predict.LstmLayerWeights(1, 2,
      Array(0.1, 0.2), Array(0.3, 0.4, 0.5, 0.6), Array(0.7, 0.8),
      Array(-0.1, -0.2), Array(-0.3, -0.4, -0.5, -0.6), Array(-0.7, -0.8),
      Array(0.11, 0.12), Array(0.13, 0.14, 0.15, 0.16), Array(0.17, 0.18),
      Array(0.21, 0.22), Array(0.23, 0.24, 0.25, 0.26), Array(0.27, 0.28))
    val inMem = new Predict.LstmPredictor(
      Predict.LstmWeights(Seq(layer), Array(1.0, -1.0), "tanh"))
    def row(name: String, a: Array[Double]) = s"$name:${a.mkString(",")}"
    val txt = (Seq("hidden:2", "activation:tanh") ++ Seq(
      row("l0_wi", layer.wi), row("l0_ui", layer.ui), row("l0_bi", layer.bi),
      row("l0_wf", layer.wf), row("l0_uf", layer.uf), row("l0_bf", layer.bf),
      row("l0_wg", layer.wg), row("l0_ug", layer.ug), row("l0_bg", layer.bg),
      row("l0_wo", layer.wo), row("l0_uo", layer.uo), row("l0_bo", layer.bo),
      "wOut:1.0,-1.0")).mkString("\n")
    val f = java.nio.file.Files.createTempFile("lstm_", ".weights")
    java.nio.file.Files.write(f, txt.getBytes("UTF-8"))
    val fromFile = Predict.LstmPredictor.fromFile(f.toString)
    val xs = Seq(10.0, 12.0, 11.0, 13.0)
    assert(fromFile.predict(xs) == inMem.predict(xs))
    // misshapen stacks fail at construction
    intercept[IllegalArgumentException] {
      Predict.LstmPredictor.parseWeights("hidden:2\nwOut:1.0\n") // missing l0_*
    }
    intercept[IllegalArgumentException] {
      Predict.LstmWeights(Seq(layer), Array(1.0), "tanh") // wOut wrong size
    }
  }
}
