package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** STRUCTURAL plan assertions for the index-served retrieval tier
  * (r16 verdict #2 / #3): the claims "the serve path touches zero
  * documents-table bytes" and "the corpus-scale norms/scored tables are
  * never shuffled" must hold by plan shape, not by AQE's runtime
  * estimate on a derived aggregate or by a quiet-host timing read.
  *
  * Assertion 1 (bytes): the FINAL executed plan of the index-served
  * queries contains no file scan over `documents.parquet` — every
  * byte comes from segment / norms / scored sidecars. The scan-served
  * siblings DO scan the corpus, which proves the assertion has teeth.
  *
  * Assertion 2 (shuffle): the corpus-scale sidecar scans (docNorms =
  * one row per document; scoredDocs = the packing lengths) sit under
  * NO shuffle exchange — they stream through broadcast-hash probes
  * whose build sides are the O(query-vocabulary) tf/rank tables. At
  * 100 TB this is the difference between a per-query-batch cost of
  * (pruned postings + one pass over norms) and re-partitioning the
  * corpus per batch. */
class IndexServePlanSpec extends SparkSpec {

  /** Walk the FINAL physical plan, crossing AQE stage and reuse
    * boundaries. The flag tracks "this node's ROWS cross the nearest
    * ancestor shuffle": set at a ShuffleExchange, RESET at an aggregate
    * below it — Exchange(Aggregate(Scan)) shuffles partial-aggregate
    * rows, not scan rows, so a corpus scan feeding a partial aggregate
    * (the stats branch, the final per-doc sum) is fine; likewise RESET
    * at a broadcast-hash join — Exchange(BHJ(tiny build, Scan)) shuffles
    * join output whose cardinality is governed by the broadcast side,
    * not the probe scan (the packing window's per-query exchange sits
    * over ≤ k·queries such rows). What the assertion forbids is the
    * corpus scan's own rows crossing an exchange — the SMJ shape
    * (Exchange over Sort over Scan) the broadcast hint exists to
    * prevent, which no reset below masks. */
  private def walk(p: SparkPlan, rawRowsShuffled: Boolean)(
      f: (SparkPlan, Boolean) => Unit): Unit = {
    f(p, rawRowsShuffled)
    val flag =
      if (p.isInstanceOf[ShuffleExchangeLike]) true
      else if (p.isInstanceOf[org.apache.spark.sql.execution.aggregate.BaseAggregateExec] ||
        p.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]) false
      else rawRowsShuffled
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case qs: QueryStageExec       => Seq(qs.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case _                        => p.children
    }
    kids.foreach(walk(_, flag)(f))
  }

  /** (scans, scansUnderShuffle) of the executed (post-AQE-final) plan. */
  private def scansOf(df: DataFrame): Seq[(FileSourceScanExec, Boolean)] = {
    df.collect() // finalize every adaptive stage first
    val out = scala.collection.mutable.ArrayBuffer.empty[(FileSourceScanExec, Boolean)]
    walk(df.queryExecution.executedPlan, rawRowsShuffled = false) {
      case (s: FileSourceScanExec, under) => out += ((s, under))
      case _ => ()
    }
    out.toSeq
  }

  private def pathsOf(s: FileSourceScanExec): Seq[String] =
    s.relation.location.rootPaths.map(_.toString)

  private def scansDocuments(df: DataFrame): Boolean =
    scansOf(df).exists { case (s, _) =>
      pathsOf(s).exists(_.contains("documents.parquet")) }

  test("index-served BM25 reads zero documents-table bytes; the scan-served sibling reads them") {
    val served = graft.ops.TextOps.bm25FromIndex(spark, sf)
    assert(!scansDocuments(served),
      "index-served BM25 plan scans the documents table — the serving-tier claim is broken")
    assert(scansDocuments(graft.ops.TextOps.bm25TopK(spark, sf)),
      "control failed: the scan-served form should read documents.parquet " +
        "(if this trips, the detector is blind, not the plan clean)")
  }

  test("index-served RAG reads zero documents-table bytes; the scan-served sibling reads them") {
    val served = graft.ops.TextOps.ragFromIndex(spark, sf)
    assert(!scansDocuments(served),
      "index-served RAG plan scans the documents table — the serving-tier claim is broken")
    assert(scansDocuments(graft.ops.TextOps.ragRetrieve(spark, sf)),
      "control failed: the scan-served form should read documents.parquet")
  }

  test("corpus-scale norms scan sits under no shuffle in the index-served BM25 plan") {
    val scans = scansOf(graft.ops.TextOps.bm25FromIndex(spark, sf))
    val norms = scans.filter { case (s, _) =>
      s.output.map(_.name).toSet == Set("doc_id", "dl") }
    assert(norms.nonEmpty, "expected a docNorms sidecar scan (doc_id, dl) in the plan")
    norms.foreach { case (s, under) =>
      assert(!under,
        s"norms scan ${pathsOf(s).mkString(",")} sits under a shuffle exchange — " +
          "the broadcast hint on the tf side stopped being structural") }
  }

  test("corpus-scale norms and scored-docs scans sit under no shuffle in the index-served RAG plan") {
    val scans = scansOf(graft.ops.TextOps.ragFromIndex(spark, sf))
    val corpusScale = scans.filter { case (s, _) =>
      val names = s.output.map(_.name).toSet
      names == Set("doc_id", "dl") || names.contains("n_tokens") }
    assert(corpusScale.nonEmpty,
      "expected docNorms and scored-docs sidecar scans in the plan")
    corpusScale.foreach { case (s, under) =>
      assert(!under,
        s"corpus-scale scan ${pathsOf(s).mkString(",")} sits under a shuffle exchange") }
  }
}
