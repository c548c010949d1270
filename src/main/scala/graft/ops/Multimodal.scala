package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension): opaque binary
  * payloads + typed metadata, with a decode/feature-extract stage.
  *
  * The real decode step (image/audio codecs) is STUBBED — the codec
  * libraries are not in this container — behind [[StubDecoder]], a
  * deterministic fake with the production signature (bytes → fixed-width
  * feature vector). Everything Spark-side is real and tested: the binary
  * column schema, the metadata struct, partition-parallel batched decode
  * via mapPartitions (the Scala analog of mapInPandas batch decode), and
  * the downstream feature schema.
  */
object Multimodal {

  /** bytes → fixed-width feature vector. Swap for a real codec binding
    * in production; the contract (batched, per-partition, no driver
    * involvement) is what matters at 100 TB. */
  trait Decoder extends Serializable {
    def decode(blob: Array[Byte]): Array[Double]

    /** Batched entry point — ONE call per buffered batch of blobs, the
      * shape a real codec binding needs (amortized native-call overhead,
      * the mapInPandas batch analog). Default delegates per-blob; real
      * codecs override with a vectorized implementation. */
    def decodeBatch(blobs: Array[Array[Byte]]): Array[Array[Double]] =
      blobs.map(decode)
  }

  /** Deterministic fake: summary statistics of the raw bytes. */
  object StubDecoder extends Decoder {
    override def decode(blob: Array[Byte]): Array[Double] = {
      if (blob.isEmpty) Array(0.0, 0.0, 0.0, 0.0)
      else Array(
        blob.length.toDouble,
        (blob.head & 0xFF).toDouble,
        (blob.last & 0xFF).toDouble,
        blob.foldLeft(0L)((acc, b) => acc ^ (b & 0xFF).toLong).toDouble)
    }
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("modality", StringType),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(DoubleType))))

  /** Frame sampling over a binary payload (the video/audio frame-sample
    * pattern): frames of frameBytes taken every strideBytes through the
    * blob — pure column expressions (sequence + explode + binary
    * substring), fully parallel, no UDF. The frame bytes are extracted
    * for downstream decode; the emitted (frame_idx, frame_len) metadata
    * is oracle-checkable by plain arithmetic because the stand-in blob is
    * the ascii text (byte length == char length). */
  def frameSample(s: SparkSession, d: String, frameBytes: Int = 64,
      strideBytes: Int = 256): DataFrame =
    frameSampleDf(Tables.documents(s, d), frameBytes, strideBytes)

  /** [[frameSample]] over any (doc_id, text) frame — split out so the
    * empty-payload edge is unit-testable without fixture docs. */
  def frameSampleDf(docs: DataFrame, frameBytes: Int = 64,
      strideBytes: Int = 256): DataFrame = {
    val n = length(col("text")).cast(LongType)
    val nFrames = ceil(n.cast("double") / strideBytes).cast(LongType)
    // empty blob → zero frames: Spark's sequence(0, -1) would default to
    // step -1 and emit [0, -1]; the when-guard yields an empty array so
    // explode drops the row, matching generate_series(0, -1) semantics
    val frameIdxs = when(n > 0, sequence(lit(0L), nFrames - 1))
      .otherwise(array().cast(ArrayType(LongType)))
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"), n.as("n"),
        explode(frameIdxs).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        least(lit(frameBytes.toLong), col("n") - col("frame_idx") * strideBytes)
          .as("frame_len"),
        substring(col("blob"), (col("frame_idx") * strideBytes + 1).cast("int"),
          lit(frameBytes)).as("frame"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Feature resize stub (the image-resize analog): truncate or zero-pad
    * a feature vector to targetDim — deterministic, shape-preserving. */
  def resizeFeatures(features: Array[Double], targetDim: Int): Array[Double] =
    if (features.length >= targetDim) features.take(targetDim)
    else features ++ Array.fill(targetDim - features.length)(0.0)

  /** Binary-column pipeline: documents → (blob: binary, metadata struct)
    * → per-partition batched decode → feature rows. The blob here is the
    * utf-8 text bytes standing in for an image payload; schema and
    * execution shape are the production ones: blobs are buffered into
    * fixed-size batches and the decoder is invoked ONCE per batch
    * (`decodeBatch`), so a native codec pays its call overhead per
    * hundreds of blobs, not per row. */
  def decodeFeatures(s: SparkSession, d: String,
      decoder: Decoder = StubDecoder, batchSize: Int = 256): DataFrame = {
    val withBlob = Tables.documents(s, d)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("blob"),
        struct(lit("image/fake").as("mime"), col("n_chars").as("declared_len"),
          col("source").as("origin")).as("meta"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    withBlob.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { chunk =>
        val ids   = chunk.map(_.getAs[Long]("doc_id"))
        val blobs = chunk.map(_.getAs[Array[Byte]]("blob")).toArray
        val feats = decoder.decodeBatch(blobs)
        ids.lazyZip(blobs).lazyZip(feats).map { (id, blob, f) =>
          Row(id, "image/fake", blob.length.toLong, f)
        }
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Driver-checkable scalar projection of the stub features: the four
    * StubDecoder features as named BIGINT columns, computed DECLARATIVELY
    * (codegen'd column expressions — length, 1-byte slices, and the
    * native [[graft.functions.XorFoldBytes]] fold; zero UDF/boxing in the
    * hot path). The array-returning [[decodeFeatures]] stays the library
    * API for real codecs; this is the shape an oracle can hash. */
  def featureColumns(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Native
    Native.register(s)
    val blob = encode(col("text"), "UTF-8")
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(blob).cast(LongType).as("n_bytes"),
        // xor-fold of a 1-byte slice == that byte's value
        Native.xorFold(substring(blob, 1, 1)).as("f_first"),
        Native.xorFold(substring(blob, -1, 1)).as("f_last"),
        Native.xorFold(blob).as("f_xor"))
      .orderBy(col("doc_id"))
  }
}
