package graft

import graft.ops.{Checks, Predict}
import org.apache.spark.sql.functions._

/** The PORTED REFERENCE ARTIFACT: `lstm_model.keras`'s trained weights
  * (extracted from the public Keras-3 HDF5 container by
  * `tools/dump_keras_weights.py`) and `scaler.pkl`'s frozen MinMaxScaler
  * pair, shipped as the `graft/lstm_ref_weights.txt` classpath resource
  * and loaded by [[Predict.LstmPredictor.reference]].
  *
  * The extraction is pinned three independent ways:
  *   1. STRUCTURE + SPOT VALUES — shapes, activation, scaler pair, and
  *      individual floats read straight out of the HDF5 byte stream;
  *   2. the TRAINED-MODEL SIGNATURE — Keras initializes LSTM forget
  *      bias to 1.0 (`unit_forget_bias=True`) and training kept the
  *      block near there; ONLY the forget block sits around 1.0, which
  *      is impossible under a wrong gate de-interleave of the packed
  *      (in, 4*units) kernel;
  *   3. an INDEPENDENT FORWARD PASS — a differently-structured
  *      re-implementation of the cell (gate vectors via explicit
  *      matrix-vector products, different accumulation order) must
  *      agree with the production predictor, and both must agree with
  *      golden values computed by a third implementation in Python
  *      (tools/dump_keras_weights.py's sibling check) to 1e-9.
  */
class LstmRefWeightsSpec extends SparkSpec {

  private val mn = 170.75782116164527
  private val mx = 189.0292566483142

  test("reference resource loads with the artifact's exact structure") {
    val w = Predict.LstmPredictor.reference.weights
    assert(w.layers.map(l => (l.input, l.hidden)) == Seq((1, 64), (64, 32)),
      "must match lstm_model.keras: LSTM(64) -> LSTM(32), input (5,1)")
    assert(w.activation == "relu")
    assert(w.scaler.contains((mn, mx)),
      "frozen scaler must be scaler.pkl's decoded f8 pair")
    // spot values read directly from the HDF5 byte stream during the port
    assert(w.bOut == 0.05086526647210121)
    assert(w.layers.head.wi(0) == 0.07183229923248291)
    assert(w.wOut(0) == -0.2217440903186798)
  }

  test("trained-model signature: only the forget-gate block centers at 1.0") {
    val l0 = Predict.LstmPredictor.reference.weights.layers.head
    def mean(a: Array[Double]) = a.sum / a.length
    assert(math.abs(mean(l0.bf) - 1.0) < 0.1,
      s"forget bias should hug its 1.0 init, got ${mean(l0.bf)}")
    assert(l0.bf.forall(v => v > 0.9 && v < 1.5))
    // the other three gate-bias blocks must NOT look like that — a
    // wrong de-interleave would smear the 1.0 block across all four
    for ((name, b) <- Seq("bi" -> l0.bi, "bg" -> l0.bg, "bo" -> l0.bo))
      assert(math.abs(mean(b)) < 0.5, s"$name mean ${mean(b)} looks like bf")
  }

  /** Independent re-implementation: per-gate matrix-vector products over
    * whole vectors (vs the production cell's fused per-unit loop), and a
    * readout folded right-to-left. Shares nothing with
    * [[Predict.LstmPredictor]] but the weight arrays. */
  private def independentForward(prices: Seq[Double]): Double = {
    val w = Predict.LstmPredictor.reference.weights
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))
    def relu(x: Double) = math.max(0.0, x)
    def matVec(a: Array[Double], x: Array[Double], n: Int, m: Int) =
      Array.tabulate(n)(i => (0 until m).map(j => a(i * m + j) * x(j)).sum)
    var seq: Array[Array[Double]] =
      prices.map(p => Array((p - mn) / (mx - mn))).toArray
    for (l <- w.layers) {
      val (n, m) = (l.hidden, l.input)
      var h = new Array[Double](n); var c = new Array[Double](n)
      seq = seq.map { x =>
        def gate(wm: Array[Double], um: Array[Double], b: Array[Double]) = {
          val wx = matVec(wm, x, n, m); val uh = matVec(um, h, n, n)
          Array.tabulate(n)(i => wx(i) + uh(i) + b(i))
        }
        val ai = gate(l.wi, l.ui, l.bi); val af = gate(l.wf, l.uf, l.bf)
        val ag = gate(l.wg, l.ug, l.bg); val ao = gate(l.wo, l.uo, l.bo)
        val cN = Array.tabulate(n)(i => sig(af(i)) * c(i) + sig(ai(i)) * relu(ag(i)))
        val hN = Array.tabulate(n)(i => sig(ao(i)) * relu(cN(i)))
        h = hN; c = cN; hN
      }
    }
    val y = w.wOut.zip(seq.last).foldRight(w.bOut) { case ((wi, hi), acc) =>
      wi * hi + acc
    }
    y * (mx - mn) + mn
  }

  test("production forward pass == independent re-implementation == Python golden") {
    val p = Predict.LstmPredictor.reference
    // golden values from the third (Python) implementation at port time
    val golden = Seq(
      Seq(175.0, 176.5, 174.2, 178.9, 180.1) -> 179.8813759273786,
      Seq(mn, mn, mn, mn, mn)                -> 181.78132367412874,
      Seq(mx, mx, mx, mx, mx)                -> 181.28350894272782,
      Seq(180.0, 180.0, 180.0, 180.0, 180.0) -> 179.9672374514047)
    for ((prices, expect) <- golden) {
      assert(math.abs(p.predict(prices) - expect) < 1e-9,
        s"production vs golden on $prices: ${p.predict(prices)} != $expect")
      assert(math.abs(independentForward(prices) - expect) < 1e-9,
        s"independent vs golden on $prices: ${independentForward(prices)}")
    }
    // a trained next-price model TRACKS a constant in-range input — the
    // strongest cheap evidence that these are the real trained weights,
    // not noise (seeded stand-ins miss by tens of dollars here)
    assert(math.abs(p.predict(Seq.fill(5)(180.0)) - 180.0) < 0.5)
  }

  test("q_predict_lstm_ref: one row per complete 5-window, finite, scaler pinned") {
    val rows = q("q_predict_lstm_ref").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => java.lang.Double.isFinite(r.getDouble(2))))
    // NOTE: no output-band assertion here — the fixture's event values
    // sit outside the frozen scaler's [170.8, 189.0] training range, so
    // the model extrapolates (as the reference would on the same data);
    // in-range behavior is pinned by the golden-value test above
    val check = Checks.lstmRefPredictCheck(spark, sf).collect().head
    assert(check.getAs[Long]("n_rows") == rows.length)
    assert(check.getAs[Boolean]("all_finite"))
    assert(check.getAs[Double]("scaler_min") == mn)
    assert(check.getAs[Double]("scaler_max") == mx)
  }
}
