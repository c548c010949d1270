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

  /** The integer closed form of SQL ntile used by equidepthBins
    * (Aggregates.scala): first N%b buckets take N DIV b + 1 rows, the
    * rest N DIV b. */
  private def ntileClosed(i: Long, n: Long, b: Long): Long = {
    val small = n / b; val rem = n % b; val cut = rem * (small + 1)
    if (i <= cut) (i - 1) / (small + 1) + 1
    else rem + (i - cut - 1) / small + 1
  }

  test("property: the ntile closed form matches ntile's definition for any (N, b)") {
    val gen = for {
      n <- Gen.choose(1L, 5000L)
      b <- Gen.choose(1L, 64L)
    } yield (n, b)
    check(forAll(gen) { case (n, b) =>
      val bins = (1L to n).map(ntileClosed(_, n, b))
      val sizes = bins.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val used = math.min(n, b)
      // ntile's contract: bins are 1..min(N,b) in nondecreasing order,
      // sizes differ by at most 1, and the LARGER buckets come first
      bins.head == 1L && bins.last == used &&
        bins.zip(bins.tail).forall { case (a, c) => c == a || c == a + 1 } &&
        (sizes.values.max - sizes.values.min) <= 1 &&
        sizes.toSeq.sortBy(_._1).map(_._2).zip(
          sizes.toSeq.sortBy(_._1).map(_._2).tail)
          .forall { case (a, c) => a >= c }
    })
  }

  /** The offset recomposition at the heart of Chunked.seriesRanks: ANY
    * order-consistent chunking (ties unsplit) + local ranks + prefix
    * offsets must reproduce the global rank exactly. */
  test("property: chunked local-rank + offset equals the global rank") {
    val gen = for {
      vals   <- Gen.listOf(Gen.choose(0, 50))     // heavy ties on purpose
      splits <- Gen.choose(1, 8)
    } yield (vals, splits)
    check(forAll(gen) { case (vals, splits) =>
      val rows = vals.zipWithIndex                 // (value, id) — unique ids
      val sorted = rows.sortBy { case (v, id) => (v, id) }
      val globalRank = sorted.zipWithIndex.map { case (r, k) => r -> (k + 1L) }.toMap
      // chunk by value range boundaries (ties stay together)
      val bounds = (1 until splits).map(k => k * 51 / splits)
      def chunkOf(v: Int) = bounds.count(_ < v)
      val byChunk = rows.groupBy { case (v, _) => chunkOf(v) }
      val counts = byChunk.view.mapValues(_.size.toLong).toMap
      val offs = {
        var acc = 0L
        byChunk.keys.toSeq.sorted.map { ck =>
          val o = ck -> acc; acc += counts(ck); o
        }.toMap
      }
      byChunk.forall { case (ck, rs) =>
        rs.sortBy { case (v, id) => (v, id) }.zipWithIndex.forall {
          case (r, k) => globalRank(r) == offs(ck) + k + 1L
        }
      }
    })
  }
}
