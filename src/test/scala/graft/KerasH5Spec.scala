package graft

import graft.ops.{KerasH5, Predict}
import org.scalatest.funsuite.AnyFunSuite

/** The in-engine Keras/HDF5 loader ([[KerasH5]]): the reference's
  * shipped artifact loads DIRECTLY, bit-identical to the text resource
  * that `tools/dump_keras_weights.py` (the independent Python
  * implementation of the same format subset) extracted at port time.
  * Guarded on the artifact's presence so the suite stays green in a
  * deployment without the reference checkout. */
class KerasH5Spec extends AnyFunSuite {

  private val artifact = "/root/reference/lstm_model.keras"
  private def artifactPresent = new java.io.File(artifact).isFile

  test("reads the reference archive: every expected tensor, exact shapes") {
    assume(artifactPresent, s"$artifact not present")
    val t = KerasH5.readKerasArchive(artifact)
    val model = t.filter(!_._1.startsWith("/optimizer"))
    assert(model.keys.toSet == Set(
      "/layers/lstm/cell/vars/0", "/layers/lstm/cell/vars/1",
      "/layers/lstm/cell/vars/2",
      "/layers/lstm_1/cell/vars/0", "/layers/lstm_1/cell/vars/1",
      "/layers/lstm_1/cell/vars/2",
      "/layers/dense/vars/0", "/layers/dense/vars/1"))
    assert(t("/layers/lstm/cell/vars/0").shape == Seq(1, 256))
    assert(t("/layers/lstm/cell/vars/1").shape == Seq(64, 256))
    assert(t("/layers/lstm/cell/vars/2").shape == Seq(256))
    assert(t("/layers/lstm_1/cell/vars/0").shape == Seq(64, 128))
    assert(t("/layers/dense/vars/0").shape == Seq(32, 1))
    // optimizer slots ride along in the archive (Adam: 2 per variable
    // + 2 counters) — present, ignored by the weight assembly
    assert(t.count(_._1.startsWith("/optimizer")) == 18)
  }

  test("direct .keras load is bit-identical to the shipped text resource") {
    assume(artifactPresent, s"$artifact not present")
    val scaler = Predict.LstmPredictor.reference.weights.scaler
    val direct = Predict.LstmPredictor.fromKeras(artifact, scaler)
    val res = Predict.LstmPredictor.reference
    val (a, b) = (direct.weights, res.weights)
    assert(a.layers.size == b.layers.size)
    a.layers.zip(b.layers).foreach { case (x, y) =>
      assert(x.input == y.input && x.hidden == y.hidden)
      // float32 → repr(float) → Scala parse on the resource side vs
      // float32 → double directly here: both exact, so bit-identical
      for ((na, nb) <- Seq(x.wi -> y.wi, x.ui -> y.ui, x.bi -> y.bi,
          x.wf -> y.wf, x.uf -> y.uf, x.bf -> y.bf,
          x.wg -> y.wg, x.ug -> y.ug, x.bg -> y.bg,
          x.wo -> y.wo, x.uo -> y.uo, x.bo -> y.bo))
        assert(na.sameElements(nb))
    }
    assert(a.wOut.sameElements(b.wOut))
    assert(a.bOut == b.bOut)
    assert(a.scaler == b.scaler)
    // and therefore identical predictions
    val w = Seq(175.0, 176.5, 174.2, 178.9, 180.1)
    assert(direct.predict(w) == res.predict(w))
  }

  test("malformed inputs fail loudly") {
    intercept[IllegalArgumentException] {
      KerasH5.readH5("not an hdf5 file at all".getBytes)
    }
    // a zip without model.weights.h5
    val f = java.nio.file.Files.createTempFile("fake_", ".keras")
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(f))
    zos.putNextEntry(new java.util.zip.ZipEntry("config.json"))
    zos.write("{}".getBytes); zos.closeEntry(); zos.close()
    intercept[IllegalArgumentException] {
      KerasH5.readKerasArchive(f.toString)
    }
  }
}
