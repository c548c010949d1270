package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Similarity search (north-star): brute force exactness, LSH recall. */
class SimilaritySpec extends SparkSpec {

  test("cosine is 1.0 against itself, within [-1,1] across pairs") {
    val e = Tables.embeddings(spark, sf).limit(20)
    val self = e.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    self.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
    q("q_embed_cosine_pairs").collect().foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
    }
  }

  test("k-means quantizer: k centroids, deterministic, full dimension") {
    val e = Tables.embeddings(spark, sf)
    val c1 = Similarity.kmeansCentroids(e, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    val c2 = Similarity.kmeansCentroids(e, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    assert(c1.size == 8)
    assert(c1.values.forall(_.length == 64))
    // same init + same data → same centroids (tolerance: double-sum
    // merge order across partials is scheduler-dependent)
    assert(c1.keySet == c2.keySet)
    c1.foreach { case (k, v) =>
      v.lazyZip(c2(k)).foreach((a, b) => assert(math.abs(a - b) < 1e-9))
    }
  }

  test("bruteforce top-k: k rows per query, descending cosine, no self") {
    val df = q("q_ann_bruteforce").collect()
    df.groupBy(_.getAs[Long]("q_id")).foreach { case (qid, rows) =>
      assert(rows.length == 5)
      val cs = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      assert(!rows.exists(_.getAs[Long]("n_id") == qid))
    }
  }

  test("sign-band dedup blocking: candidates well below all-pairs, verify is exact") {
    val e = Tables.embeddings(spark, sf)
    val n = e.count()
    val allPairs = n * (n - 1) / 2
    val cands = Similarity.signBandCandidates(e)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // a random pair collides in a band with p = 2^-8; L=8 bands keeps
    // candidates a few percent of the pair space
    assert(cands.size < allPairs / 5,
      s"blocking degenerated: ${cands.size} candidates of $allPairs pairs")
    // exact-verify correctness: result == (all-pairs truth) ∩ candidates
    val ea = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val eb = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val truth = ea.join(eb, col("id_b") > col("id_a"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosineNative(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Similarity.embedNearDupLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == (truth & cands))
    info(s"candidates ${cands.size}/$allPairs, recall ${found.size}/${truth.size}")
  }

  test("IVF-cluster-blocked dedup: subset of truth, bounded candidates") {
    val e = Tables.embeddings(spark, sf)
    val n = e.count()
    val found = Similarity.embedNearDupIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("cos")))
    // exact verify: every emitted pair genuinely clears the threshold
    found.foreach { case (_, _, c) => assert(c >= 0.4) }
    // subset of the global all-pairs truth
    val ea = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val eb = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val truth = ea.join(eb, col("id_b") > col("id_a"))
      .filter(Similarity.cosineNative(col("ea"), col("eb")) >= 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.map(p => (p._1, p._2)).toSet.subsetOf(truth))
    info(s"ivf-blocked recall ${found.size}/${truth.size} over $n vectors")
  }

  test("column-blocked dedup equals the in-block all-pairs truth") {
    val e = Tables.embeddings(spark, sf)
    val found = Similarity.embedNearDupBlocked(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = e.select(col("label"), col("vec_id").as("id_a"), col("embedding").as("ea"))
      .join(e.select(col("label"), col("vec_id").as("id_b"), col("embedding").as("eb")),
        Seq("label"))
      .filter(col("id_b") > col("id_a"))
      .filter(Similarity.cosineNative(col("ea"), col("eb")) >= 0.4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(found == truth)
  }

  test("candidate distinct shuffles id pairs only — no array payload through an Aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.ArrayType
    val plans = Seq(
      Similarity.signBandCandidates(Tables.embeddings(spark, sf)),
      SparkEntry.queries("q_ann_lsh")(spark, sf))
    plans.foreach { df =>
      val aggs = df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
      assert(aggs.nonEmpty, "expected a pair-distinct Aggregate in the plan")
      aggs.foreach { a =>
        assert(!a.output.exists(_.dataType.isInstanceOf[ArrayType]),
          s"embedding payload traveling through the distinct: ${a.output.map(_.name)}")
      }
    }
  }

  test("LSH and IVF ANN recall vs bruteforce is substantial on unclustered data") {
    val truth = q("q_ann_bruteforce").select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (name <- Seq("q_ann_lsh", "q_ann_ivf")) {
      val approx = q(name).select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (truth & approx).size.toDouble / truth.size
      // cluster-free random 64-dim embeddings: ~0.4-0.6 is the honest
      // regime for both sketches (see Similarity scaladoc)
      assert(recall >= 0.3, s"$name recall@5 = $recall")
    }
  }
}
