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
      strideBytes: Int = 256): DataFrame = {
    val n = length(col("text")).cast(LongType)
    val nFrames = ceil(n.cast("double") / strideBytes).cast(LongType)
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"), n.as("n"),
        explode(sequence(lit(0L), nFrames - 1)).as("frame_idx"))
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
    * execution shape are the production ones. */
  def decodeFeatures(s: SparkSession, d: String,
      decoder: Decoder = StubDecoder): DataFrame = {
    val withBlob = Tables.documents(s, d)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("blob"),
        struct(lit("image/fake").as("mime"), col("n_chars").as("declared_len"),
          col("source").as("origin")).as("meta"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    withBlob.mapPartitions { rows =>
      // batched per partition: decoder state initialized once per task,
      // never per row — the mapInPandas batch-shape analog
      rows.map { r =>
        val blob = r.getAs[Array[Byte]]("blob")
        Row(r.getAs[Long]("doc_id"), "image/fake",
          blob.length.toLong, decoder.decode(blob))
      }
    }(enc).orderBy(col("doc_id"))
  }
}
