package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support for the 100 TB training-data pipeline:
  * image/audio/video payloads ride as opaque `binary` columns with typed
  * metadata; decode / frame-sample / feature-extract run distributed via
  * `mapPartitions` over the binary batches.
  *
  * Compressed-media codecs are STUBBED (this container has no image/audio
  * libraries — see the build brief): [[FrameDecoder.stub]] produces
  * deterministic fixed-size "frames" and [[FrameDecoder.stubFeatures]] a
  * deterministic byte-histogram embedding. The Spark-side plumbing —
  * schema, binary batching, partition-parallel decode, feature vectors
  * flowing into the ANN operators ([[LlmQueries]] cosine/LSH) — is real
  * and tested, and [[FrameDecoder.wav]] is a REAL pure-JVM codec
  * (RIFF/WAVE PCM) through the same trait: variable frames per blob
  * (duration windows over blob-specific sample rates) and corrupt-blob
  * failure rows, proving the boundary carries a real decode shape.
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

    /** A REAL codec through the same boundary: RIFF/WAVE PCM parser
      * (pure JVM — no media libraries needed for PCM audio). Frames are
      * fixed-DURATION windows of the data chunk, so the frame byte size
      * depends on the blob's own sample rate / channels / bit depth —
      * variable frames per blob, the shape a stub can't exercise.
      * Malformed blobs (bad magic, truncated chunks, no fmt/data, or a
      * non-PCM format tag) decode to ZERO frames: a corrupt row drops
      * out of the output instead of killing the task — at 100 TB some
      * fraction of any media corpus IS corrupt. */
    def wav(windowMs: Int): FrameDecoder = new FrameDecoder {
      private def le16(b: Array[Byte], o: Int): Int =
        (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      private def le32(b: Array[Byte], o: Int): Long =
        (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
          ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      private def tag(b: Array[Byte], o: Int): String =
        new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

      def decode(blob: Array[Byte]): Iterator[Frame] = {
        if (blob.length < 12 || tag(blob, 0) != "RIFF" || tag(blob, 8) != "WAVE")
          return Iterator.empty
        var byteRate = 0L
        var pcm = false
        var dataOff = -1
        var dataLen = 0
        var o = 12
        while (o + 8 <= blob.length) { // chunk walk: 4-byte id + LE32 size
          val id = tag(blob, o)
          val sz = le32(blob, o + 4)
          if (sz < 0 || o + 8 + sz > blob.length) return Iterator.empty // truncated
          if (id == "fmt " && sz >= 16) {
            pcm = le16(blob, o + 8) == 1 // audioFormat 1 = uncompressed PCM
            val channels = le16(blob, o + 10)
            val sampleRate = le32(blob, o + 12)
            val bitsPerSample = le16(blob, o + 22)
            byteRate = sampleRate * channels * (bitsPerSample / 8)
          } else if (id == "data") { dataOff = o + 8; dataLen = sz.toInt }
          o += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
        }
        if (!pcm || byteRate <= 0 || dataOff < 0 || dataLen == 0) return Iterator.empty
        // byteRate is attacker-controlled (fmt chunk): cap it below any
        // physical rate so byteRate*windowMs can't wrap Long, and reject a
        // frame size outside Int range — a crafted fmt chunk must yield
        // zero frames, never a /-by-zero or a wrapped allocation.
        if (byteRate > (1L << 40)) return Iterator.empty
        val frameBytesL = byteRate * windowMs / 1000L
        if (frameBytesL <= 0L || frameBytesL > Int.MaxValue) return Iterator.empty
        val frameBytes = math.max(1L, frameBytesL).toInt
        Iterator.range(0, (dataLen + frameBytes - 1) / frameBytes).map { i =>
          val from = dataOff + i * frameBytes
          Frame(i, java.util.Arrays.copyOfRange(blob, from,
            math.min(from + frameBytes, dataOff + dataLen)))
        }
      }
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
