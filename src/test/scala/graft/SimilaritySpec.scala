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

  test("bruteforce top-k: k rows per query, descending cosine, no self") {
    val df = q("q_ann_bruteforce").collect()
    df.groupBy(_.getAs[Long]("q_id")).foreach { case (qid, rows) =>
      assert(rows.length == 5)
      val cs = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      assert(!rows.exists(_.getAs[Long]("n_id") == qid))
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
