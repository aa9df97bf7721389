package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support for the 100 TB training-data pipeline:
  * image/audio/video payloads ride as opaque `binary` columns with typed
  * metadata; decode / frame-sample / feature-extract run distributed via
  * `mapPartitions` over the binary batches.
  *
  * The actual media codecs are STUBBED (this container has no image/audio
  * libraries — see the build brief): [[FrameDecoder.stub]] produces
  * deterministic fixed-size "frames" and [[FrameDecoder.stubFeatures]] a
  * deterministic byte-histogram embedding. The Spark-side plumbing —
  * schema, binary batching, partition-parallel decode, feature vectors
  * flowing into the ANN operators ([[LlmQueries]] cosine/LSH) — is real
  * and tested. Swapping in a real codec is implementing one trait.
  *
  * Scale notes: decode is embarrassingly parallel (mapPartitions, no
  * shuffle); frames explode rows but carry only (id, idx, hash/features),
  * not pixels, past the decode stage — keep the heavy bytes inside the
  * partition. Blobs >~100 MB should be chunk-stored (one row per chunk)
  * so a single row never exceeds task memory.
  */
object Multimodal {

  /** One decoded frame: index within the medium + raw bytes. */
  final case class Frame(idx: Int, bytes: Array[Byte])

  /** The codec boundary. Real implementations (JPEG decode, audio
    * resample, video frame-sample) plug in here. */
  trait FrameDecoder extends Serializable {
    def decode(blob: Array[Byte]): Iterator[Frame]
  }

  object FrameDecoder {
    /** Deterministic stand-in codec: fixed 64-byte windows as "frames"
      * (shape-compatible with video frame sampling). */
    val stub: FrameDecoder = new FrameDecoder {
      def decode(blob: Array[Byte]): Iterator[Frame] =
        blob.grouped(64).zipWithIndex.map { case (b, i) => Frame(i, b) }
    }

    /** Deterministic 16-dim byte-histogram "feature vector" per frame —
      * the stand-in for a real embedding model; integer counts cast to
      * float so downstream cosine math is engine-exact. */
    def stubFeatures(f: Frame): Array[Float] = {
      val hist = new Array[Float](16)
      f.bytes.foreach(b => hist((b & 0xFF) >> 4) += 1f)
      hist
    }
  }

  final case class FrameRow(media_id: Long, frame_idx: Int, n_bytes: Int,
                            frame_md5: String, features: Array[Float])

  /** Attach a binary payload column derived from text (fixture adapter:
    * the driver's corpus has no real media, so documents.text plays the
    * blob role; with real data this is just the parquet binary column). */
  def binarize(docs: DataFrame): DataFrame =
    docs.withColumn("blob", encode(col("text"), "UTF-8"))

  /** Distributed decode + frame-sample + feature-extract: one
    * mapPartitions pass, no shuffle; output carries hashes + features
    * only. This is the `mapInPandas`-shaped stage of a Python pipeline,
    * done natively. */
  def extractFrames(media: DataFrame, idCol: String, blobCol: String,
                    decoder: FrameDecoder = FrameDecoder.stub): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, blob) =>
          decoder.decode(blob).map { f =>
            val hash = md.digest(f.bytes).map("%02x".format(_)).mkString
            FrameRow(id, f.idx, f.bytes.length, hash, FrameDecoder.stubFeatures(f))
          }
        }
      }
  }
}
