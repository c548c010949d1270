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
