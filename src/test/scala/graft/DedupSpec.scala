package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Deduplication operators (north-star): exact, Jaccard, MinHash, SimHash. */
class DedupSpec extends SparkSpec {

  test("exact dedup groups cover all docs") {
    val df = q("q_dedup_exact")
    assert(df.agg(sum(col("n_copies"))).head().getLong(0) ==
      Tables.documents(spark, sf).count())
  }

  test("ngram jaccard is within [0,1] and symmetric in sizes") {
    q("q_dedup_ngram_jaccard").collect().foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Long]("n_common") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
    }
  }

  test("minhash LSH finds every true near-dup pair (recall vs exact)") {
    // exact all-pairs jaccard >= 0.5 via shingle self-join (ground truth)
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("shingle"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("ns"))
    val truth = sh.select(col("doc_id").as("id_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("ni"))
      .join(sizes.select(col("doc_id").as("id_a"), col("ns").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("ns").as("nb")), "id_b")
      .filter(col("ni").cast("double") / (col("na") + col("nb") - col("ni")) >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = q("q_dedup_minhash").select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == truth, s"LSH found ${found.size}, truth ${truth.size}")
  }

  test("near-dup components: pairs share a cluster, keeper is the cluster minimum") {
    val comp = q("q_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == Tables.documents(spark, sf).count())
    // every matched pair must land in the same component
    q("q_dedup_minhash").collect().foreach { r =>
      assert(comp(r.getAs[Long]("id_a")) == comp(r.getAs[Long]("id_b")))
    }
    // a component's label is its minimum member id
    comp.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c)
    }
    // exactly one keeper per component
    val keepers = q("q_dedup_clusters")
      .filter(col("is_keeper")).count()
    assert(keepers == comp.values.toSet.size)
  }

  test("components converges on a 100-node chain (pointer jumping)") {
    import spark.implicits._
    val nodes = (0L until 100L).toDF("doc_id")
    val edges = (0L until 99L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.components(nodes, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(comp.length == 100 && comp.forall(_._2 == 0L))
  }

  test("components: convergence check rides the round's checkpoint (no count actions)") {
    import spark.implicits._
    val funcNames = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val lst = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        funcNames.add(funcName)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(lst)
    try {
      val nodes = (0L until 64L).toDF("doc_id")
      val edges = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      Dedup.components(nodes, edges).collect()
      // listener delivery is async — wait for the bus to drain
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!funcNames.contains("collect") && System.nanoTime() < deadline)
        Thread.sleep(50)
      val names = funcNames.toArray(Array.empty[String]).toSeq
      assert(!names.contains("count"),
        s"components must not run a per-round count action; saw $names")
      assert(names.count(_ == "localCheckpoint") >= 3,
        s"expected per-round checkpoint actions; saw $names")
    } finally spark.listenerManager.unregister(lst)
  }

  test("components throws loudly when maxIters is too small to converge") {
    import spark.implicits._
    val nodes = (0L until 64L).toDF("doc_id")
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Dedup.components(nodes, edges, maxIters = 1)
    }
  }

  test("simhash: near-identical docs collide, signatures are diverse") {
    val sig = q("q_dedup_simhash")
    val n = sig.count()
    val distinct = sig.select("simhash").distinct().count()
    assert(distinct > n / 2, "signatures should be diverse on non-dup docs")
  }

  test("decontamination pairs genuinely span the split boundary") {
    val split = graft.ops.TextOps.hashSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = q("q_decontaminate").collect()
    rows.foreach { r =>
      assert(split(r.getAs[Long]("test_id")) == "test")
      assert(split(r.getAs[Long]("train_id")) == "train")
      assert(Set("exact", "neardup")(r.getAs[String]("reason")))
    }
    // exact contamination implies identical fingerprints
    val fps = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.filter(_.getAs[String]("reason") == "exact").foreach { r =>
      assert(fps(r.getAs[Long]("test_id")) == fps(r.getAs[Long]("train_id")))
    }
  }

  test("scrub masks every digit run and leaves no raw digits behind") {
    val scrubbed = graft.ops.TextOps.scrub(spark, sf)
    assert(scrubbed.filter(col("scrubbed").rlike("[0-9]")).count() == 0)
    // masking is idempotent
    val twice = scrubbed.select(col("doc_id"),
      regexp_replace(col("scrubbed"), "[0-9]+", "<NUM>").as("s2"))
    assert(scrubbed.join(twice, "doc_id")
      .filter(col("scrubbed") =!= col("s2")).count() == 0)
  }

  test("edit distance: zero against self, bounded by the compared prefix length") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val self = docs.select(
      levenshtein(substring(col("text"), 1, 80), substring(col("text"), 1, 80)).as("d"))
      .agg(max(col("d"))).head().getInt(0)
    assert(self == 0)
    q("q_text_editdist").collect().foreach { r =>
      val d = r.getAs[Long]("edit_dist")
      assert(d >= 0 && d <= 80)
    }
  }

  test("simhash pairs have hamming <= 3 and are id-ordered") {
    Dedup.simhashPairs(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Long]("hamming") <= 3)
    }
  }

  test("prefix-filtered simjoin equals brute-force exact Jaccard (completeness + precision)") {
    // brute force over the collected fixture: all same-source pairs,
    // exact token-set Jaccard, the same integer threshold 9/10
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), lower(trim(col("text"))))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split("\\s+").toSet))
      .filter(_._3.nonEmpty)
    val expect = (for {
      (ia, sa, ta) <- docs; (ib, sb, tb) <- docs if ia < ib && sa == sb
      common = (ta & tb).size; union = ta.size + tb.size - common
      if common * 10 >= union * 9
    } yield (ia, ib)).toSet
    val got = q("q_simjoin_prefix").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect && got.nonEmpty)
    // the prefix filter is a real filter: candidate postings are a
    // fraction of an all-token join's postings
    val allTok = docs.iterator.map(_._3.size.toLong).sum
    val prefTok = docs.iterator.map { case (_, _, t) =>
      val n = t.size; (n - ((9L * n + 9) / 10) + 1).toLong
    }.sum
    assert(prefTok * 4 < allTok, s"prefix carries $prefTok of $allTok postings")
  }

  test("contamination fraction: plain-Scala k-gram membership recompute agrees") {
    val k = 8
    def md5hex(x: String) =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def splitOf(id: Long) = {
      val h = md5hex(id.toString).head
      if (h <= 'c') "train" else if (h <= 'e') "val" else "test"
    }
    val docs = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def grams(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      if (toks.length < k) Set.empty else toks.sliding(k).map(_.mkString(" ")).toSet
    }
    val trainGrams = docs.filter(d => splitOf(d._1) == "train")
      .flatMap(d => grams(d._2)).toSet
    val want = docs.filter(d => splitOf(d._1) == "test").map { case (id, t) =>
      val g = grams(t)
      val m = g.count(trainGrams.contains)
      id -> (g.size.toLong, m.toLong,
        if (g.isEmpty) 0.0 else m.toDouble / g.size)
    }.toMap
    val got = Dedup.contaminationFraction(spark, sf).collect()
    assert(got.length == want.size) // every test doc surfaces, incl. gram-less
    got.foreach { r =>
      val (ng, nm, frac) = want(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_grams") == ng)
      assert(r.getAs[Long]("n_matched") == nm)
      assert(r.getAs[Double]("contam_frac") == frac)
    }
    // if the plain-Scala truth finds contamination in this fixture's
    // splits, the operator must surface it too (sf0.001's 200-doc
    // corpus may legitimately land no planted pair across train/test)
    assert(got.exists(_.getAs[Double]("contam_frac") > 0.0) ==
      want.values.exists(_._3 > 0.0))
  }

  test("contamination: cold-JVM sidecar read is value-identical; warm construction runs no jobs") {
    // first call builds (and publishes) the train-gram sidecar
    val first = Dedup.contaminationFraction(spark, sf).collect().toSeq

    // warm-memo plan CONSTRUCTION must launch no Spark job: the train
    // grams are a memoized dfArtifact and the test grams a LAZY
    // checkpoint — before round 15 the eager test-gram checkpoint made
    // every construction (explain tooling included) pay a gram scan
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Dedup.contaminationFraction(spark, sf) // construct only, no action
      Thread.sleep(1000) // listener bus is async; zero-event case settles
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs === 0,
      s"constructing the contamination plan launched $jobs Spark job(s)")

    // fresh-JVM simulation: the in-memory memo is gone, the parquet
    // train-gram sidecar must answer with identical values
    Tables.clearMemoryArtifactsForTest()
    val second = Dedup.contaminationFraction(spark, sf).collect().toSeq
    assert(second === first,
      "contamination result changed across the train-gram sidecar round trip")
  }

  test("keep-best retention: argmax of (quality, -doc_id) per cluster, sizes conserved") {
    val comps = Dedup.nearDupComponents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    val qual = graft.ops.TextOps.quality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    val want = comps.groupBy(_._2).map { case (c, members) =>
      val ids = members.keys.toSeq
      val best = ids.minBy(id => (-qual(id), id))
      c -> (best, qual(best), ids.size.toLong)
    }
    val got = Dedup.keepBestPerCluster(spark, sf).collect()
    assert(got.length == want.size)
    // ordered output, one row per cluster
    val cids = got.map(_.getAs[Long]("cluster_id"))
    assert(cids.sameElements(cids.sorted) && cids.distinct.length == cids.length)
    got.foreach { r =>
      val (bid, bq, n) = want(r.getAs[Long]("cluster_id"))
      assert(r.getAs[Long]("kept_doc_id") == bid)
      assert(r.getAs[Double]("kept_quality") == bq)
      assert(r.getAs[Long]("n_members") == n)
    }
    assert(got.map(_.getAs[Long]("n_members")).sum == comps.size)
  }
}
