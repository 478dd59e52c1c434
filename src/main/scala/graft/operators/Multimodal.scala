package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque BINARY columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The Spark-side plumbing (schema, batching, partition-local processing)
  * is real and tested; the actual media DECODE is stubbed behind
  * [[MediaCodec]] with a deterministic fake (this container has no image/
  * audio libraries — the stub boundary is explicit and swappable).
  *
  * Scale shape: decode/feature-extract run as `mapPartitions` over the
  * binary column — per-partition batch processing with zero driver
  * involvement, the Scala analog of `mapInPandas`. Metadata-only
  * operations (size, mime sniff, dimensions) are pure column expressions
  * and never touch the payload bytes beyond the scanned column.
  */
object Multimodal {

  /** The stub decode boundary: STUBBED — a real build links an image/audio
    * codec here; the fake is deterministic in the payload bytes so tests
    * and oracles are stable. */
  object MediaCodec {
    /** "Decode" fixed-dimension metadata from a fake media payload. */
    def sniffDims(bytes: Array[Byte]): (Int, Int) = {
      val n = bytes.length
      (320 + (n % 320), 240 + (n % 240))
    }

    /** "Feature-extract": d-dim float vector from byte statistics —
      * deterministic stand-in for an embedding model forward pass. */
    def features(bytes: Array[Byte], d: Int): Array[Float] = {
      val out = new Array[Float](d)
      var i = 0
      while (i < bytes.length) {
        out(i % d) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }

    /** "Frame-sample": every strideth byte — stand-in for video frame
      * extraction. */
    def frameSample(bytes: Array[Byte], stride: Int): Array[Byte] =
      bytes.indices.collect { case i if i % stride == 0 => bytes(i) }.toArray
  }

  /** Attach a media payload column (here: the UTF-8 bytes of a text col
    * act as the opaque payload) + pure-expression metadata. */
  def withMediaColumns(df: DataFrame, payloadFrom: String): DataFrame =
    df.withColumn("media", encode(col(payloadFrom), "UTF-8"))
      .withColumn("media_meta", struct(
        length(col("media")).cast(LongType).as("n_bytes"),
        (lit(320) + pmod(length(col("media")), lit(320))).as("width"),
        (lit(240) + pmod(length(col("media")), lit(240))).as("height"),
        lit("application/octet-stream").as("mime")))

  private val featSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false)),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Decode + feature-extract + frame-sample via partition-local batch
    * processing (the mapInPandas analog). Input needs (idCol, "media"). */
  def extractFeatures(df: DataFrame, idCol: String, d: Int = 8,
      frameStride: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast(LongType), col("media"))
      .queryExecution.toRdd.mapPartitions { iter =>
        iter.map { internal =>
          val id = internal.getLong(0)
          val bytes = internal.getBinary(1)
          val feats = MediaCodec.features(bytes, d)
          val frames = MediaCodec.frameSample(bytes, frameStride)
          Row(id, feats.toSeq, frames.length)
        }
      }
    spark.createDataFrame(rows, featSchema)
  }
}
