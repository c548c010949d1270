package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines (north-star
  * extensions): exact hash dedup, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: every pipeline hashes/sketches FIRST so raw text never
  * shuffles — only fixed-width signatures do. Candidate generation is
  * always a bucket equi-join (shuffle on the bucket key), never an
  * all-pairs comparison; exact similarity runs only on candidates.
  */
object Dedup {

  /** Exact dedup via content hash: group on md5(text), keep the lowest
    * doc_id. Shuffles 16-byte hashes, not documents. */
  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** 3-token shingles (n-gram units for Jaccard/MinHash), distinct per doc. */
  def shingles(text: Column): Column = {
    val toks = TextOps.tokens(text)
    array_distinct(
      when(size(toks) < 3, array().cast(ArrayType(StringType)))
        .otherwise(transform(sequence(lit(0), size(toks) - 3), i =>
          concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
            element_at(toks, i + 3)))))
  }

  /** doc_id → exploded distinct shingle rows. */
  private def shingleRows(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))

  /** Exact n-gram Jaccard between consecutive doc pairs (a calibration /
    * oracle query for the sketch-based paths): |A∩B| / |A∪B| over 3-token
    * shingle sets. */
  def ngramJaccardConsecutive(s: SparkSession, d: String): DataFrame = {
    val sh = shingleRows(s, d)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val pairs = docs.select(col("doc_id").as("id_a"))
      .join(docs.select(col("doc_id").as("id_b")), col("id_b") === col("id_a") + 1)
    val inter = sh.select(col("doc_id").as("id_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_b") === col("id_a") + 1)
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("ni"))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left_outer")
      .join(sizes.select(col("doc_id").as("id_a"), col("ns").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("ns").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        coalesce(col("ni"), lit(0L)).as("n_common"), col("n_a"), col("n_b"))
      .withColumn("jaccard",
        col("n_common").cast(DoubleType) / (col("n_a") + col("n_b") - col("n_common")))
      .orderBy(col("id_a"))
  }

  /** MinHash signatures: NUM_HASHES permutations simulated by seeded
    * xxhash64 re-hashes of each shingle; signature slot i = min hash
    * under seed i. One explode + one groupBy — linear in total shingles. */
  val NumHashes = 64
  val BandRows  = 2   // rows per band → 32 bands: P(candidate | j=0.5) ≈ 0.9999

  def minhashSignatures(sh: DataFrame): DataFrame = {
    val seeds = sh.sparkSession.range(NumHashes).toDF("seed")
    sh.join(broadcast(seeds))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(xxhash64(col("shingle"), col("seed"))).as("mh"))
  }

  /** MinHash + LSH banding near-dup pairs, exact-Jaccard verified.
    * Pipeline: shingle → signature → band-bucket equi-join for candidates
    * → exact Jaccard on candidates only → threshold. Output = all pairs
    * with true Jaccard ≥ 0.5 (banding at these params has ~1e-4 miss
    * probability at j=0.5, vanishing above it). */
  def minhashLshPairs(s: SparkSession, d: String, threshold: Double = 0.5): DataFrame = {
    val sh  = shingleRows(s, d)
    val sig = minhashSignatures(sh)
    // band id = seed div BandRows; bucket key = hash of the band's slots
    val bands = sig
      .withColumn("band", (col("seed") / lit(BandRows.toLong)).cast(LongType))
      .withColumn("slot", col("seed") % lit(BandRows.toLong))
      .groupBy(col("doc_id"), col("band"))
      .agg(xxhash64(sort_array(collect_list(concat_ws(":", col("slot"), col("mh"))))
        .cast(StringType)).as("bucket"))
    val cands = bands.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
      .join(bands.select(col("band"), col("bucket"), col("doc_id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // exact verify on candidates only
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
    val inter = cands
      .join(sh.select(col("doc_id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("ni"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("ns").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("ns").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("ni").cast(DoubleType) / (col("n_a") + col("n_b") - col("ni")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** 64-bit SimHash per document: per bit j, sum ±1 weighted by whether
    * bit j of each shingle hash is set; bit j of the signature = sign.
    * One explode + one 64-column aggregate — no shuffle of text. */
  def simhashSignatures(s: SparkSession, d: String): DataFrame = {
    val sh = shingleRows(s, d).withColumn("h", xxhash64(col("shingle")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftrightunsigned(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$j")
    }
    val agg = sh.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), sig.as("simhash")).orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs: bucket by each of the four 16-bit chunks
    * (any pair within Hamming distance ≤ 3 of a 64-bit hash must agree on
    * at least one chunk — pigeonhole), then verify Hamming ≤ maxDist. */
  def simhashPairs(s: SparkSession, d: String, maxDist: Int = 3): DataFrame = {
    val sig = simhashSignatures(s, d)
    val chunks = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))
            .as("key"))): _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.chunk"), col("ck.key"))
    val cands = chunks.select(col("chunk"), col("key"),
        col("doc_id").as("id_a"), col("simhash").as("sh_a"))
      .join(chunks.select(col("chunk"), col("key"),
        col("doc_id").as("id_b"), col("simhash").as("sh_b")), Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
    cands
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast(LongType))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
