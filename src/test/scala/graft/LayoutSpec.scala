package graft

import org.apache.spark.sql.functions._

/** Layout operators: z-order clustering + the block-sharded inverted
  * index. The oracle hashes prove the values; these specs prove the
  * PROPERTIES the operators exist for. */
class LayoutSpec extends SparkSpec {

  test("z-order buckets have tight 2-D bounding boxes; a hash layout does not") {
    val dims = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("dayi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val z = q("q_zorder").collect()
      .map(r => (r.getLong(0), r.getLong(2)))   // (event_id, zbucket)
    def avgSpan(assign: Seq[(Long, Long)], dim: Long => Long): Double = {
      val spans = assign.groupBy(_._2).values.map { g =>
        val vs = g.map(p => dim(p._1))
        (vs.max - vs.min + 1).toDouble
      }
      spans.sum / spans.size
    }
    val uSpanZ = avgSpan(z.toSeq, id => dims(id)._1)
    val dSpanZ = avgSpan(z.toSeq, id => dims(id)._2)
    val uAll = dims.values.map(_._1)
    val dAll = dims.values.map(_._2)
    val uGlobal = (uAll.max - uAll.min + 1).toDouble
    val dGlobal = (dAll.max - dAll.min + 1).toDouble
    // 64 z-buckets ≈ an 8×8 grid: each bucket should cover a small slab
    // of BOTH dimensions — that tightness is what row-group min/max
    // stats prune on
    assert(uSpanZ <= uGlobal / 3, s"user span $uSpanZ vs global $uGlobal")
    assert(dSpanZ <= dGlobal / 3, s"day span $dSpanZ vs global $dGlobal")
    // the counterfactual: hash-bucketing the same rows leaves every
    // bucket spanning essentially the whole range of both dims
    val hashed = dims.keys.toSeq.map(id => (id, math.floorMod(id.hashCode, 64).toLong))
    assert(avgSpan(hashed, id => dims(id)._1) > uGlobal * 0.8)
    assert(avgSpan(hashed, id => dims(id)._2) > dGlobal * 0.8)
    // z-curve is a bijection on the grid: equal ids, no loss
    assert(z.length == dims.size)
  }

  test("inverted index: block postings concatenate to the global posting list") {
    val rows = q("q_index_postings").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(4)))
    // recompute the truth directly from the fixture with the same
    // tokenizer (lowercase, trim, split on whitespace runs)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val truth = docs.flatMap { case (id, text) =>
      text.trim.toLowerCase.split("\\s+").zipWithIndex
        .filter(_._1.nonEmpty).map { case (t, p) => (t, id, p) }
    }
    val globalByToken = truth.groupBy(_._1).map { case (t, occ) =>
      t -> occ.sortBy(o => (o._2, o._3)).map(o => s"${o._2}:${o._3}").mkString(" ")
    }
    val concatByToken = rows.groupBy(_._1).map { case (t, shards) =>
      t -> shards.sortBy(_._2).map(_._4).mkString(" ")
    }
    assert(concatByToken == globalByToken)
    // blocks partition the doc space: per-token Σ df_block == global df
    val dfByToken = rows.groupBy(_._1).map { case (t, shards) => t -> shards.map(_._3).sum }
    val trueDf = truth.groupBy(_._1).map { case (t, occ) => t -> occ.map(_._2).distinct.size.toLong }
    assert(dfByToken == trueDf)
    // the shard bound is real: no posting string covers more than one block
    assert(rows.forall { case (_, block, _, p) =>
      p.split(" ").forall(_.takeWhile(_ != ':').toLong / 100 == block) })
  }
}
