package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Text analysis + multimodal plumbing (north-star). */
class TextMultimodalSpec extends SparkSpec {

  test("quality ratios are in [0,1] and score is bounded") {
    q("q_text_quality").collect().foreach { r =>
      assert(r.getAs[Double]("punct_ratio") >= 0.0 && r.getAs[Double]("punct_ratio") <= 1.0)
      assert(r.getAs[Double]("stop_ratio") >= 0.0 && r.getAs[Double]("stop_ratio") <= 1.0)
      assert(r.getAs[Double]("quality_score") >= 0.0 && r.getAs[Double]("quality_score") <= 1.0)
    }
  }

  test("bpe-ish token count >= whitespace token count on word text") {
    q("q_token_count").collect().foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_ws_tokens"))
    }
  }

  test("langid emits a prediction for every doc from the fixed label set") {
    val preds = q("q_text_langid").select("predicted").distinct()
      .collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "fr", "de", "es")))
    assert(q("q_text_langid").count() == Tables.documents(spark, sf).count())
  }

  test("hash split covers every doc, is reproducible, roughly 13/2/1") {
    val a = q("q_hash_split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = q("q_hash_split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a.size == Tables.documents(spark, sf).count())
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size).toMap
    assert(frac.keySet.subsetOf(Set("train", "val", "test")))
    assert(frac("train") > 0.6) // expectation 13/16 ≈ 0.81
  }

  test("top tokens: descending frequency, deterministic tiebreak, k rows") {
    val rows = q("q_top_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 20)
    rows.sliding(2).foreach { case Array((ta, fa), (tb, fb)) =>
      assert(fa > fb || (fa == fb && ta < tb))
    }
  }

  test("bm25 served from the persisted index is row-identical to the scan-served form") {
    val scan = q("q_bm25_topk").collect().toSeq
    val index = q("q_bm25_from_index").collect().toSeq
    assert(index === scan,
      "index-served BM25 diverged from the scan-served ranking")
  }

  test("delta-segment merged read equals the full index rebuild bit for bit") {
    val full = q("q_index_postings").collect().toSeq
    val merged = q("q_index_delta").collect().toSeq
    assert(merged === full,
      "base⊎delta segment read diverged from the full rebuild")
    // the lifecycle claim: the cut actually splits the corpus — both
    // the base and the delta segment tables are non-empty
    val cut = graft.ops.TextOps.indexDeltaCut(spark, sf)
    val maxDoc = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.max("doc_id")).head().getLong(0)
    assert(cut > 0 && cut <= maxDoc, s"degenerate delta cut $cut (max doc $maxDoc)")
  }

  test("streaming per-batch segments, merged at read, equal the full index rebuild") {
    val full = q("q_index_postings").collect().toSeq
    val merged = q("q_stream_index").collect().toSeq
    assert(merged === full,
      "merge of streamed partial segments diverged from the single-pass build")
    // the lifecycle claim: the drain genuinely ran MULTIPLE micro-
    // batches, so blocks really did split across partial segments
    val batches = graft.streaming.Pipeline.groupBatchCounts(spark, sf)("index")
    assert(batches >= 2, s"index drain consolidated to $batches batch(es)")
  }

  test("compacted stream store equals the full rebuild; compacted reads run no merge aggregate") {
    val full = q("q_index_postings").collect().toSeq
    val compacted = q("q_stream_compact").collect().toSeq
    assert(compacted === full,
      "flush → compact → serve diverged from the single-pass batch build")
    // structural: after compaction the read plan is scan + present —
    // the per-read merge aggregate streamIndexMerged pays is GONE
    val plan = graft.ops.TextOps.streamIndexCompacted(spark, sf)
      .queryExecution.optimizedPlan
    assert(!plan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate]),
      "compacted-store read still aggregates — compaction didn't move the merge off the read path")
    assert(graft.ops.TextOps.streamIndexMerged(spark, sf).queryExecution.optimizedPlan
      .exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate]),
      "control failed: the merge-at-read form should carry the merge aggregate")
  }

  test("bm25 served from the compacted stream store is row-identical to the scan-served form") {
    val scan = q("q_bm25_topk").collect().toSeq
    val compacted = q("q_bm25_compact_served").collect().toSeq
    assert(compacted === scan,
      "retrieval over the compacted stream store diverged from the corpus scan")
  }

  test("tombstone-masked index read equals the segment build over surviving documents") {
    val kept = graft.ops.Dedup.keepBestUnordered(spark, sf)
      .select(col("kept_doc_id").as("doc_id"))
    val survivors = Tables.documents(spark, sf).join(kept, Seq("doc_id"), "left_semi")
    val rebuilt = graft.ops.TextOps.buildSegmentsForDiag(survivors)
      .orderBy("token", "block_id").collect().toSeq
    val masked = graft.ops.TextOps.liveSegments(spark, sf)
      .orderBy("token", "block_id").collect().toSeq
    assert(masked === rebuilt,
      "masking the full index through the tombstone set diverged from " +
        "rebuilding over the surviving documents")
    // teeth: the dedup pipeline really produced losers, and the mask
    // really removed their postings from the served index
    val nTomb = graft.ops.TextOps.tombstones(spark, sf).count()
    assert(nTomb > 0, "degenerate fixture: no near-dup losers to tombstone")
    def totalPostings(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("n_postings")).head().getLong(0)
    val full = totalPostings(q("q_index_postings"))
    val live = totalPostings(q("q_index_delete"))
    assert(live < full,
      s"tombstoning $nTomb docs removed no postings ($live vs $full)")
  }

  test("snapshot read: manifest names durable generations; composed read equals the masked full-index read") {
    val T = graft.ops.TextOps
    // the snapshot read composes base ⊎ delta ⊖ tombstones — must be
    // row-identical to the full-sidecar masked read (q_index_delete),
    // which is itself oracled against the rebuild over survivors
    val snap = q("q_index_snapshot").collect().toSeq
    val del = q("q_index_delete").collect().toSeq
    assert(snap === del,
      "manifest-resolved snapshot read diverged from the masked full-index read")
    // the manifest is metadata-scale and names all three generations
    val man = T.indexManifest(spark, sf).collect()
    assert(man.length == 3)
    assert(man.map(_.getAs[String]("component")).sorted.toSeq ===
      Seq("segments-base", "segments-delta", "tombstones"))
    // commit ordering: every named generation is durable by the time
    // the manifest is readable (the _SUCCESS of its published sidecar
    // exists at the recorded path) and non-degenerate where required
    man.foreach { r =>
      val p = java.nio.file.Paths.get(r.getAs[String]("path"), "_SUCCESS")
      assert(java.nio.file.Files.isRegularFile(p),
        s"manifest names non-durable generation: ${r.getAs[String]("artifact_key")}")
    }
    val byKind = man.map(r => r.getAs[String]("component") -> r.getAs[Long]("n_rows")).toMap
    assert(byKind("segments-base") > 0 && byKind("segments-delta") > 0 &&
      byKind("tombstones") > 0)
  }

  test("snapshot-bound bm25 and the AS OF read: retrieval binds the manifest; the past stays addressable") {
    val T = graft.ops.TextOps
    // retrieval through the manifest == retrieval through the live
    // sidecar (snapshot = base ⊎ delta ⊖ tombstones = full ⊖ tombstones)
    val snap = q("q_bm25_snapshot_served").collect().toSeq
    val live = q("q_bm25_live_served").collect().toSeq
    assert(snap === live,
      "snapshot-bound retrieval diverged from the live-sidecar serve")
    // AS OF the base generation: exactly the rebuild over doc_id < cut
    val cut = T.indexDeltaCut(spark, sf)
    val expect = T.buildSegmentsForDiag(
        Tables.documents(spark, sf).filter(col("doc_id") < cut))
      .orderBy("token", "block_id").collect().toSeq
    val asof = T.indexAsOfBase(spark, sf)
      .select(col("token"), col("block_id"), col("df_block"), col("n_postings"))
      .collect().toSeq
    assert(asof === expect.map(r => org.apache.spark.sql.Row(
      r.get(0), r.get(1), r.get(2), r.get(3))),
      "AS OF read is not the rebuild over the base slice")
    // time travel really shows the PAST: a tombstoned doc below the cut
    // is deleted in the snapshot read but still present AS OF base
    val tombBelowCut = T.tombstones(spark, sf)
      .filter(col("doc_id") < cut).collect().map(_.getLong(0))
    assert(tombBelowCut.nonEmpty, "no tombstoned doc below the cut — weak fixture")
    val probe = tombBelowCut.head
    def hasDoc(df: org.apache.spark.sql.DataFrame): Boolean =
      df.filter(expr(s"exists(plist, x -> x.doc_id = $probe)")).limit(1)
        .count() > 0
    assert(hasDoc(T.snapshotSegments(spark, sf)) == false,
      s"doc $probe is tombstoned but visible in the current snapshot")
    val baseSegs = T.indexAsOfBase(spark, sf)
    assert(baseSegs.filter(col("postings").rlike(s"(^| )$probe:")).limit(1).count() > 0,
      s"doc $probe should be visible AS OF the base generation")
  }

  test("bm25 over the tombstone-masked index: no dead docs served, survivor-scoped stats") {
    val tomb = graft.ops.TextOps.tombstones(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(tomb.nonEmpty)
    val live = q("q_bm25_live_served").collect().toSeq
    assert(live.nonEmpty)
    live.foreach(r => assert(!tomb.contains(r.getLong(0)),
      s"tombstoned doc ${r.getLong(0)} served from the live index"))
    // stats are survivor-scoped: n_docs/avgdl shrink, so scores shift
    // vs the full-index serve even where the ranking agrees (the
    // DuckDB oracle pins the shifted values exactly)
    val full = q("q_bm25_from_index").collect().toSeq
    assert(live != full,
      "live-index scores identical to full-index scores — survivor stats not applied")
  }

  test("bm25 served from the STREAM-built index is row-identical to the scan-served form") {
    val scan = q("q_bm25_topk").collect().toSeq
    val streamed = q("q_bm25_stream_served").collect().toSeq
    assert(streamed === scan,
      "retrieval over the stream-built index diverged from the corpus scan")
  }

  test("rag served from the persisted index is row-identical to the scan-served form") {
    val scan = q("q_rag_retrieve").collect().toSeq
    val index = q("q_rag_from_index").collect().toSeq
    assert(index === scan,
      "index-served RAG diverged from the scan-served retrieval+packing")
  }

  test("bm25 top-k equals a plain-Scala recompute, term-quantized") {
    val qtoks = Seq("vector", "hash", "dup")
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty).toSeq)
    val nDocs = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / nDocs
    val df = qtoks.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    def q8(x: Double) = new java.math.BigDecimal(x)
      .setScale(8, java.math.RoundingMode.HALF_UP)
    val expected = docs.flatMap { case (id, toks) =>
      val dl = toks.length.toLong
      val terms = qtoks.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None else {
          val idf = math.log(1.0 + (nDocs - df(t) + 0.5) / (df(t) + 0.5))
          Some(q8(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))))
        }
      }
      if (terms.isEmpty) None
      else Some((id, terms.reduce(_ add _).setScale(8, java.math.RoundingMode.HALF_UP)
        .doubleValue(), terms.length.toLong))
    }.sortBy { case (id, s, _) => (-s, id) }.take(10).toSeq
    val got = q("q_bm25_topk").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("fingerprint is stable under whitespace and case noise") {
    val fp1 = q("q_text_fingerprint").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // perturb: uppercase + extra spaces must hash identically
    val noisy = Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(regexp_replace(lower(trim(upper(regexp_replace(col("text"), " ", "  ")))),
          "\\s+", " ")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp1 == noisy)
  }

  test("bigram novelty is a valid ratio and a duplicated doc zeroes out") {
    val rows = SparkEntry.queries("q_text_novelty")(spark, sf).collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bigrams"); val u = r.getAs[Long]("n_unique")
      assert(u >= 0 && u <= n)
      assert(r.getAs[Double]("novelty") == u.toDouble / n)
    }
    // exact duplicates share every bigram, so both score 0 novelty
    val fps = Tables.documents(spark, sf)
      .groupBy(md5(col("text"))).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1).select(explode(col("ids")).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    if (fps.nonEmpty) {
      val nov = rows.map(r => r.getLong(0) -> r.getAs[Double]("novelty")).toMap
      fps.foreach(id => assert(nov.get(id).forall(_ == 0.0),
        s"duplicated doc $id must have zero novelty"))
    }
  }

  test("repetition: hand-computed doc agrees, ratios bounded, repeated doc maxes out") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),        // bigrams: ab ba ab ba ab -> top 'a b' 3/5; ttr 2/6
      (2L, "w x y z"),            // all distinct: top 1/3, ttr 1
      (3L, "t t t t"))            // degenerate: top 3/3, ttr 1/4
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_rep_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.ops.TextOps.repetition(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Double]("ttr") == 2.0 / 6 && r(1L).getAs[Double]("rep_frac") == 3.0 / 5)
    assert(r(2L).getAs[Double]("ttr") == 1.0 && r(2L).getAs[Double]("rep_frac") == 1.0 / 3)
    assert(r(3L).getAs[Double]("ttr") == 0.25 && r(3L).getAs[Double]("rep_frac") == 1.0)
    q("q_text_repetition").collect().foreach { row =>
      assert(row.getAs[Double]("ttr") > 0.0 && row.getAs[Double]("ttr") <= 1.0)
      assert(row.getAs[Double]("rep_frac") >= 0.0 && row.getAs[Double]("rep_frac") <= 1.0)
    }
  }

  test("repetition and rarity agree with a plain-Scala recomputation on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (0L until 60L).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_prop_").toString
    docs.toDF("doc_id", "text").repartition(7)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val toks = docs.map { case (i, t) => i -> t.split("\\s+").toSeq }.toMap
    val rep = graft.ops.TextOps.repetition(spark, dir).collect()
    assert(rep.length == docs.size)
    rep.foreach { r =>
      val ts = toks(r.getLong(0))
      val bgs = if (ts.length < 2) Seq.empty else ts.sliding(2).map(_.mkString(" ")).toSeq
      assert(r.getAs[Long]("n_tokens") == ts.length)
      assert(r.getAs[Double]("ttr") == ts.distinct.length.toDouble / ts.length)
      assert(r.getAs[Long]("n_bigrams") == bgs.length)
      val expTop = if (bgs.isEmpty) 0L else bgs.groupBy(identity).values.map(_.size).max.toLong
      assert(r.getAs[Long]("top_count") == expTop)
      val expFrac = if (bgs.isEmpty) 0.0 else expTop.toDouble / bgs.length
      assert(r.getAs[Double]("rep_frac") == expFrac)
    }

    val tf = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    graft.ops.TextOps.tokenRarity(spark, dir).collect().foreach { r =>
      val ts = toks(r.getLong(0))
      assert(r.getAs[Long]("n_tokens") == ts.length)
      assert(r.getAs[Double]("mean_tf") == ts.map(tf).sum.toDouble / ts.length)
      assert(r.getAs[Long]("min_tf") == ts.map(tf).min)
    }
  }

  test("token rarity: min <= mean, and a planted rare token drags min_tf to 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common common zzquux"), // zzquux unique -> min_tf 1
      (2L, "common common"))               // min = mean = tf(common) = 5
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_rar_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.ops.TextOps.tokenRarity(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Long]("min_tf") == 1L)
    assert(r(1L).getAs[Double]("mean_tf") == (5.0 + 5.0 + 5.0 + 1.0) / 4)
    assert(r(2L).getAs[Double]("mean_tf") == 5.0 && r(2L).getAs[Long]("min_tf") == 5L)
    q("q_text_rarity").collect().foreach { row =>
      assert(row.getAs[Long]("min_tf").toDouble <= row.getAs[Double]("mean_tf"))
    }
  }

  test("bigram novelty: no join on the bigram key, and parity with the naive join plan") {
    val df = SparkEntry.queries("q_text_novelty")(spark, sf)
    // scale guard: the only join in the plan assembles per-doc counts on
    // doc_id (unique both sides). A join keyed on raw bigrams would
    // funnel every occurrence of a stop-bigram through one task at
    // 100 TB — assert no physical join references the bigram column.
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      val keyed = j.condition.toSeq.flatMap(_.references)
      assert(!keyed.exists(_.name == "bigram"),
        s"join keyed on bigram found in plan: $j")
    }
    // output parity with the straightforward (skew-prone) formulation
    val bg = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(org.apache.spark.sql.functions.udf {
        (toks: Seq[String]) =>
          if (toks.length < 2) Seq.empty[String]
          else toks.sliding(2).map(_.mkString(" ")).toVector.distinct
      }.apply(split(lower(trim(col("text"))), "\\s+"))).as("bigram"))
    val naive = bg.join(bg.groupBy("bigram").agg(count(lit(1)).as("df")), Seq("bigram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = df.collect().map(r => (r.getLong(0), r.getAs[Long]("n_bigrams"),
      r.getAs[Long]("n_unique"))).toSet
    assert(got == naive)
  }

  test("multimodal oracle precondition: fixture text is pure ASCII") {
    // the q_multimodal_features oracle folds DuckDB CHARACTERS while the
    // Spark side folds UTF-8 BYTES; the two agree only while every
    // document is ASCII (1 char == 1 byte). This assertion makes a
    // non-ASCII fixture change fail LOUDLY here instead of silently
    // flipping the oracle hash.
    val nonAscii = Tables.documents(spark, sf)
      .filter(length(col("text")) =!= octet_length(col("text"))).count()
    assert(nonAscii == 0L,
      "documents fixture contains non-ASCII text; the q_multimodal_features oracle's char==byte assumption no longer holds")
  }

  test("multimodal: scalar feature query matches the batched array-decode path") {
    val scalars = q("q_multimodal_features").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Long]("f_first"),
          r.getAs[Long]("f_last"), r.getAs[Long]("f_xor"))).toMap
    val arrays = Multimodal.decodeFeatures(spark, sf).collect()
      .map { r =>
        val f = r.getAs[scala.collection.Seq[Double]]("features")
        assert(f.length == 4)
        r.getAs[Long]("doc_id") ->
          (f(0).toLong, f(1).toLong, f(2).toLong, f(3).toLong)
      }.toMap
    assert(scalars == arrays)
    assert(scalars.size == Tables.documents(spark, sf).count())
  }

  test("batched decode is chunking-invariant (one decodeBatch call per chunk)") {
    val coarse = Multimodal.decodeFeatures(spark, sf, batchSize = 256).collect()
    val fine   = Multimodal.decodeFeatures(spark, sf, batchSize = 7).collect()
    assert(coarse.map(_.toString).sameElements(fine.map(_.toString)))
  }

  test("frame sampling emits zero frames for an empty payload") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 300), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val frames = Multimodal.frameSampleDf(docs).collect()
    // doc 1: 300 bytes / 256 stride -> 2 frames; doc 2: none; doc 3: 1
    assert(frames.count(_.getAs[Long]("doc_id") == 1L) == 2)
    assert(!frames.exists(_.getAs[Long]("doc_id") == 2L))
    assert(frames.count(_.getAs[Long]("doc_id") == 3L) == 1)
    assert(frames.forall(_.getAs[Long]("frame_idx") >= 0L))
  }

  test("stub decoder handles empty payloads") {
    assert(Multimodal.StubDecoder.decode(Array.empty).sameElements(Array(0.0, 0.0, 0.0, 0.0)))
  }

  test("feature resize truncates or zero-pads to the target dimension") {
    assert(Multimodal.resizeFeatures(Array(1.0, 2.0, 3.0), 2).sameElements(Array(1.0, 2.0)))
    assert(Multimodal.resizeFeatures(Array(1.0), 3).sameElements(Array(1.0, 0.0, 0.0)))
    assert(Multimodal.resizeFeatures(Array.empty[Double], 2).sameElements(Array(0.0, 0.0)))
    assert(Multimodal.resizeFeatures(Array(1.0, 2.0), 2).sameElements(Array(1.0, 2.0)))
  }

  test("chunking: stride-prefixes plus the last chunk reconstruct every document") {
    val chunks = q("q_text_chunks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val nonEmpty = docs.filter(_._2.trim.nonEmpty)
    assert(chunks.keySet == nonEmpty.keySet, "one chunk set per non-empty doc")
    nonEmpty.foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val cs = chunks(id).map(_.split(" ").toSeq)
      // every chunk except the last is exactly chunkSize tokens
      cs.init.foreach(c => assert(c.length == 64, s"interior chunk of doc $id"))
      val rebuilt = (cs.init.flatMap(_.take(48)) ++ cs.last).toList
      assert(rebuilt == toks.toList, s"doc $id must reconstruct from stride prefixes")
    }
  }

  test("packing: offsets stay under budget, packs fill greedily per stream") {
    val rows = q("q_text_pack").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, _, off) => assert(off >= 0 && off < 512) }
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, _, n, packId, off) =>
        assert(packId == cum / 512, s"pack id of doc $id")
        assert(off == cum % 512, s"offset of doc $id")
        cum += n
      }
    }
  }

  test("count-of-counts conserves occurrences and types; Good–Turing only on adjacent classes") {
    // plain-Scala recompute of the bigram multiset
    val bigrams = Tables.documents(spark, sf)
      .select(lower(trim(col("text")))).collect()
      .flatMap { r =>
        val t = r.getString(0).split("\\s+")
        if (t.length < 2) Seq.empty[String] else t.sliding(2).map(_.mkString(" ")).toSeq
      }
    val counts = bigrams.groupBy(identity).map(_._2.length.toLong)
    val rows = q("q_lm_counts").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    // the table IS the frequency-of-frequencies of the recompute
    val expectNoc = counts.groupBy(identity).map { case (c, g) => (c, g.size.toLong) }
    assert(rows.map(r => (r._1, r._2)).toMap == expectNoc)
    // conservation: sum c*N_c == total occurrences; sum N_c == types
    assert(rows.map(r => r._1 * r._2).sum == bigrams.length.toLong)
    assert(rows.map(_._2).sum == counts.size.toLong)
    // c* present exactly when the c+1 class exists, and equals the formula
    val byC = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (c, nC, gt) =>
      byC.get(c + 1) match {
        case Some(nNext) =>
          assert(gt.contains((c + 1).toDouble * nNext / nC), s"c* wrong at c=$c")
        case None => assert(gt.isEmpty, s"c* present without class ${c + 1}")
      }
    }
  }

  test("budget select equals the flat sorted-prefix reference at several budgets") {
    val scored = graft.ops.TextOps.quality(spark, sf)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy { case (id, _, q) => (-q, id) }
    val total = scored.map(_._2).sum
    // budgets that land inside a bucket, at zero, and past the corpus
    Seq(0L, total / 3, total / 2, total, total + 100).foreach { budget =>
      var cum = 0L
      val expect = scored.takeWhile { case (_, n, _) => { cum += n; cum <= budget } }
        .map(_._1).toSet
      // takeWhile stops at the first overflow — recompute as the true
      // monotone-prefix filter (zero-token docs after the cut still fit)
      var c2 = 0L
      val expectPrefix = scored.flatMap { case (id, n, _) =>
        c2 += n; if (c2 <= budget) Some(id) else None
      }.toSet
      val got = graft.ops.TextOps.budgetSelect(spark, sf, budget)
        .collect().map(_.getLong(0)).toSet
      assert(got == expectPrefix, s"budget=$budget")
      assert(expect.subsetOf(expectPrefix))
    }
  }

  test("budget select matches the flat prefix on random corpora with empties at random budgets") {
    import spark.implicits._
    val rnd = new scala.util.Random(90210L)
    val vocab = Vector("the", "of", "zz", "qq", "ww.", "ee!", "rr")
    (1 to 3).foreach { trial =>
      val docs = (0L until 50L).map { i =>
        val n = rnd.nextInt(12) // 0 → empty doc
        (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft_budr$trial").toString
      docs.toDF("doc_id", "text").repartition(4)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val scored = graft.ops.TextOps.quality(spark, dir)
        .select(col("doc_id"), col("n_tokens"), col("quality_score"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy { case (id, _, q) => (-q, id) }
      val budget = rnd.nextInt(1 + scored.map(_._2).sum.toInt).toLong
      var cum = 0L
      val expect = scored.flatMap { case (id, n, _) =>
        cum += n; if (cum <= budget) Some(id) else None
      }.toSet
      val got = graft.ops.TextOps.budgetSelect(spark, dir, budget)
        .collect().map(_.getLong(0)).toSet
      assert(got == expect, s"trial=$trial budget=$budget")
    }
  }

  test("budget select keeps zero-token docs when kept buckets sum exactly to the budget") {
    import spark.implicits._
    // high bucket: stopword-rich docs (quality ~0.72); boundary bucket
    // 12 mixes EMPTY docs (quality exactly 0.2, zero tokens — the
    // bucket head) with a 1-token doc at quality ~0.188 behind them.
    // budget == the high bucket's total tokens, so the boundary bucket
    // has cum_before == budget: its zero-token head must survive (the
    // oracle keeps rows whose running sum EQUALS the budget).
    val docs = Seq(
      (1L, "the of and to in is a"),  // 7 tokens, quality ~0.721
      (2L, "the of and to in is a"),  // 7 tokens
      (3L, ""),                       // 0 tokens, quality 0.2 → bucket 12
      (4L, ""),                       // 0 tokens
      (5L, "xxxxxxxxxxxx."))          // 1 token, ~0.188 → bucket 12, after the empties
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_bud_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = graft.ops.TextOps.budgetSelect(spark, dir, budget = 14L)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L))
  }

  test("duplicated spans: plain-Scala recompute agrees; templated docs score high") {
    import spark.implicits._
    val k = 8
    val rnd = new scala.util.Random(777L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val boiler = "p q r s t u v w" // an 8-token span shared verbatim
    val docs = (0L until 40L).map { i =>
      val n = 3 + rnd.nextInt(20)
      val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      // every third doc carries the boilerplate span
      (i, if (i % 3 == 0) s"$boiler $body" else body)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_span_").toString
    docs.toDF("doc_id", "text").repartition(5)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // plain-Scala truth
    val toks = docs.map { case (i, t) => i -> t.split("\\s+").toVector }.toMap
    val allGrams = toks.values.flatMap(ts => ts.sliding(k).filter(_.length == k)
      .map(_.mkString(" "))).groupBy(identity).view.mapValues(_.size).toMap
    val r = graft.ops.TextOps.duplicatedSpans(spark, dir, k).collect()
    assert(r.length == docs.size)
    r.foreach { row =>
      val ts = toks(row.getLong(0))
      val grams = ts.sliding(k).filter(_.length == k).map(_.mkString(" ")).toVector
      val dup = grams.count(g => allGrams(g) > 1)
      assert(row.getAs[Long]("n_windows") == grams.length)
      assert(row.getAs[Long]("dup_windows") == dup)
      if (grams.nonEmpty)
        assert(row.getAs[Double]("dup_frac") == dup.toDouble / grams.length)
      else assert(row.getAs[Double]("dup_frac") == 0.0)
    }
    // the shared boilerplate span is flagged on every carrier
    val byId = r.map(x => x.getLong(0) -> x.getAs[Long]("dup_windows")).toMap
    (0L until 40L by 3).foreach(i => assert(byId(i) >= 1L))
  }

  test("quality-proportional sampling: deterministic draw, correct keep set, sane rate") {
    val qual = graft.ops.TextOps.quality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    def u(id: Long): Double =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(13), 16).toDouble / 4503599627370496.0
    val want = qual.filter { case (id, q2) => u(id) < q2 }.keySet
    val got = graft.ops.TextOps.sampleByQuality(spark, sf).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet == want)
    got.foreach { r =>
      assert(r.getAs[Double]("u") == u(r.getAs[Long]("doc_id")))
      assert(r.getAs[Double]("u") < r.getAs[Double]("quality_score"))
    }
    // keep rate tracks mean quality (both in [0,1]; loose band — the
    // draw is uniform and independent of the score)
    val rate = got.length.toDouble / qual.size
    val meanQ = qual.values.sum / qual.size
    assert(math.abs(rate - meanQ) < 0.2, s"rate $rate vs mean quality $meanQ")
  }

  test("split balance: plain-Scala contingency chi-square recompute agrees") {
    def md5h(x: String) =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def splitOf(id: Long) = {
      val h = md5h(id.toString).head
      if (h <= 'c') "train" else if (h <= 'e') "val" else "test"
    }
    val docs = Tables.documents(spark, sf).collect()
      .map(r => splitOf(r.getAs[Long]("doc_id")) -> r.getAs[String]("source"))
    val o = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowT = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colT = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toLong
    val contrib = o.map { case ((sp, src), obs) =>
      val e = rowT(sp).toDouble * colT(src).toDouble / n.toDouble
      (sp, src) -> (obs, e, (obs.toDouble - e) * (obs.toDouble - e) / e)
    }
    val chisq = contrib.values
      .map(c => BigDecimal(c._3).setScale(8, BigDecimal.RoundingMode.HALF_UP))
      .sum.setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.ops.TextOps.splitBalance(spark, sf).collect()
    assert(got.length == o.size)
    got.foreach { r =>
      val (obs, e, c) = contrib((r.getAs[String]("split"), r.getAs[String]("source")))
      assert(r.getAs[Long]("o") == obs)
      assert(r.getAs[Double]("expected") == e)
      assert(r.getAs[Double]("contrib") == c)
      assert(r.getAs[Double]("chisq") == chisq)
    }
  }

  test("RAG retrieval: packing invariants hold and query-1 ranking equals bm25TopK") {
    val budget = 300L
    val rows = graft.ops.TextOps.ragRetrieve(spark, sf).collect()
    assert(rows.nonEmpty)
    val toks = graft.ops.TextOps.quality(spark, sf).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_tokens")).toMap
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, qr) =>
      val sorted = qr.sortBy(_.getAs[Long]("rnk"))
      // packed prefix: ranks contiguous from 1, cumsum true and under budget
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq ==
        (1L to sorted.length.toLong))
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("n_tokens") == toks(r.getAs[Long]("doc_id")))
        cum += r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("cum_tokens") == cum && cum <= budget)
      }
    }
    // query 1's panel IS bm25TopK's default query: identical scoring →
    // the packed list must be a prefix of the bm25 ranking
    val bm25Order = graft.ops.TextOps.bm25TopK(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    val q1 = rows.filter(_.getAs[Long]("query_id") == 1L)
      .sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("doc_id")).toSeq
    assert(q1 == bm25Order.take(q1.length))
  }

  test("PMI collocations: plain-Scala recompute agrees, top-k ordered") {
    val texts = Tables.documents(spark, sf).collect()
      .map(_.getAs[String]("text"))
    val docToks = texts.map(t => t.trim.toLowerCase.split("\\s+").toSeq)
    val bigrams = docToks.flatMap(ts =>
      if (ts.length < 2) Nil else ts.sliding(2).map(_.mkString(" ")))
    val cAb = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cTok = docToks.flatten.filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = bigrams.length.toLong
    val want = cAb.filter(_._2 >= 5L).map { case (bgm, ab) =>
      val Array(w1, w2) = bgm.split(" ", 2)
      val pmi = BigDecimal(math.log(ab.toDouble * n.toDouble /
        (cTok(w1).toDouble * cTok(w2).toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      bgm -> (ab, cTok(w1), cTok(w2), pmi)
    }
    val topWant = want.toSeq.sortBy { case (bgm, (_, _, _, p)) => (-p, bgm) }.take(50)
    val got = graft.ops.TextOps.pmiCollocations(spark, sf).collect()
    assert(got.length == topWant.length)
    got.zip(topWant).foreach { case (r, (bgm, (ab, ca, cb, pmi))) =>
      assert(r.getAs[String]("bigram") == bgm)
      assert(r.getAs[Long]("c_ab") == ab && r.getAs[Long]("c_a") == ca &&
        r.getAs[Long]("c_b") == cb)
      assert(r.getAs[Double]("pmi") == pmi)
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Independent plain-Scala reference for the mixture allocation +
    * per-source md5-order prefix (java.security md5, BigDecimal-exact
    * weight sum — no Spark functions involved). */
  private def mixtureReference(budget: Long): Map[String, Set[Long]] = {
    import spark.implicits._
    val docs = graft.ops.TextOps.quality(spark, sf)
      .select(col("doc_id"), col("n_tokens"))
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("source")), Seq("doc_id"))
      .as[(Long, Long, String)].collect()
    val bySource = docs.groupBy(_._3)
    val wsd = bySource.map { case (src, rows) =>
      src -> BigDecimal(math.sqrt(rows.map(_._2).sum.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val total = wsd.values.sum // exact decimal addition
    val alloc = wsd.map { case (src, w) =>
      src -> math.floor(budget.toDouble * w.toDouble / total.toDouble).toLong
    }
    bySource.map { case (src, rows) =>
      val ordered = rows.sortBy { case (id, _, _) => (md5hex(id.toString), id) }
      var cum = 0L
      val kept = ordered.takeWhile { case (_, n, _) => cum += n; cum <= alloc(src) }
      src -> kept.map(_._1).toSet
    }
  }

  test("mixture sample equals the plain-Scala hash-order prefix at several budgets") {
    for (b <- Seq(500L, 5000L, 20000L)) {
      val got = graft.ops.TextOps.mixtureSample(spark, sf, b).collect()
        .groupBy(_.getAs[String]("source"))
        .map { case (s, rows) => s -> rows.map(_.getAs[Long]("doc_id")).toSet }
      val want = mixtureReference(b).filter(_._2.nonEmpty)
      assert(got == want, s"budget $b mismatch")
    }
  }

  test("mixture sample output is sorted and carries true token counts") {
    val r = q("q_mixture_sample").collect()
    val keys = r.map(x => (x.getAs[String]("source"), x.getAs[Long]("doc_id")))
    assert(keys.sameElements(keys.sorted))
    val toks = graft.ops.TextOps.quality(spark, sf).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_tokens")).toMap
    r.foreach(x => assert(x.getAs[Long]("n_tokens") ==
      toks(x.getAs[Long]("doc_id"))))
  }

  test("shard manifest: full cover, balanced-ish, plain-Scala recompute agrees") {
    import spark.implicits._
    val man = q("q_shard_manifest").collect()
    assert(man.map(_.getAs[Long]("shard")).forall(s => s >= 0 && s < 32))
    val docs = graft.ops.TextOps.quality(spark, sf)
      .select(col("doc_id"), col("n_tokens"))
      .join(Tables.documents(spark, sf).select(col("doc_id"), length(col("text")).as("nb")), Seq("doc_id"))
      .as[(Long, Long, Int)].collect()
    assert(man.map(_.getAs[Long]("n_docs")).sum == docs.length)
    val ref = docs.groupBy { case (id, _, _) =>
      java.lang.Long.parseLong(md5hex(id.toString).take(4), 16) % 32
    }
    man.foreach { row =>
      val rows = ref(row.getAs[Long]("shard"))
      assert(row.getAs[Long]("n_docs") == rows.length)
      assert(row.getAs[Long]("n_tokens") == rows.map(_._2).sum)
      assert(row.getAs[Long]("n_bytes") == rows.map(_._3.toLong).sum)
      assert(row.getAs[Long]("min_doc_id") == rows.map(_._1).min)
      assert(row.getAs[Long]("max_doc_id") == rows.map(_._1).max)
    }
  }
}
