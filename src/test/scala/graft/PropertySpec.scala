package graft

import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property tests for the round-8c primitives — no Spark
  * session, so these run in milliseconds and hammer the corners the
  * fixture never hits. */
class PropertySpec extends AnyFunSuite {

  private def check(p: org.scalacheck.Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("property: bloom bits — every inserted key is found through the byte path") {
    val gen = for {
      bitsPow <- Gen.choose(6, 16)
      nHash   <- Gen.choose(1, 8)
      keys    <- Gen.listOf(Gen.long)
    } yield (bitsPow, nHash, keys)
    check(forAll(gen) { case (bitsPow, nHash, keys) =>
      val words = new Array[Long]((1 << bitsPow) / 64)
      keys.foreach(graft.functions.BloomBits.set(words, _, nHash))
      val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      words.foreach(bb.putLong)
      val bytes = bb.array()
      // the safety law: no false negative, under ANY geometry — this is
      // what lets the pruned join drop rows before the exact join
      keys.forall(graft.functions.BloomBits.contains(bytes, _, nHash))
    })
  }

  test("property: integer KS formulation == direct ECDF sup-norm") {
    val gen = for {
      a <- Gen.nonEmptyListOf(Gen.choose(-50, 50))
      b <- Gen.nonEmptyListOf(Gen.choose(-50, 50))
    } yield (a.map(_.toDouble), b.map(_.toDouble))
    check(forAll(gen) { case (a, b) =>
      // direct: sup over all sample points of |F_a(x) − F_b(x)|
      val pts = (a ++ b).distinct
      val direct = pts.map { x =>
        math.abs(a.count(_ <= x).toDouble / a.size - b.count(_ <= x).toDouble / b.size)
      }.max
      // the operator's integer route: per distinct value, running
      // (cumA·nB − cumB·nA), max |gap| divided once at the end
      val byVal = (a.map(_ -> 'a') ++ b.map(_ -> 'b')).groupBy(_._1).toSeq.sortBy(_._1)
      var (ca, cb) = (0L, 0L)
      var dnum = 0L
      byVal.foreach { case (_, vs) =>
        ca += vs.count(_._2 == 'a')
        cb += vs.count(_._2 == 'b')
        dnum = math.max(dnum, math.abs(ca * b.size - cb * a.size))
      }
      val integer = dnum.toDouble / (a.size.toDouble * b.size.toDouble)
      math.abs(integer - direct) < 1e-12
    })
  }

  test("property: ewma weights are a normalized, newest-heaviest profile at any k") {
    check(forAll(Gen.choose(1, 200)) { k =>
      val w = graft.ops.Market.ewmaWeights(k)
      w.length == k &&
        math.abs(w.sum - 1.0) < 1e-9 &&
        w.sliding(2).forall { case Seq(x, y) => y >= x; case _ => true }
    })
  }

  test("property: typed moment merge is associative and order-insensitive") {
    import graft.ops.Typed.{Moments, MomentsAgg, Tick}
    val gen = Gen.listOf(Gen.choose(0, 56021).map(c => Tick("t", c / 100.0)))
    check(forAll(gen, Gen.choose(1, 7)) { (ticks, nChunks) =>
      val whole = ticks.foldLeft(MomentsAgg.zero)(MomentsAgg.reduce)
      val chunked = ticks.grouped(math.max(1, ticks.size / nChunks + 1))
        .map(_.foldLeft(MomentsAgg.zero)(MomentsAgg.reduce))
        .foldLeft(MomentsAgg.zero)(MomentsAgg.merge)
      whole == chunked
    })
  }
}
