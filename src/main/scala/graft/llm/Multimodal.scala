package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support for the 100 TB training-data pipeline:
  * image/audio/video payloads ride as opaque `binary` columns with typed
  * metadata; decode / frame-sample / feature-extract run distributed via
  * `mapPartitions` over the binary batches.
  *
  * Two REAL codecs run through the boundary with zero external
  * libraries: [[FrameDecoder.wav]] (hand-rolled RIFF/WAVE PCM parser —
  * variable frames per blob from blob-specific sample rates) and
  * [[FrameDecoder.png]] (the JDK's `javax.imageio` PNG reader — a real
  * COMPRESSED format, frames = pixel rows, gated end-to-end as q140).
  * Both decode corrupt blobs to zero frames rather than failing the
  * task. Codecs the JDK genuinely lacks (JPEG video, MP3/AAC) remain
  * behind [[FrameDecoder.stub]] / [[FrameDecoder.stubFeatures]]
  * (deterministic fixed-size frames + byte-histogram embeddings), with
  * the Spark-side plumbing — schema, binary batching,
  * partition-parallel decode, feature vectors flowing into the ANN
  * operators ([[LlmQueries]] cosine/LSH) — real and tested either way.
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
    def wav(windowMs: Int): FrameDecoder = {
      // operator parameter, not data: fail construction, not decode.
      // The 1h ceiling also keeps byteRate(<=2^40) * windowMs far from
      // Long wrap, making the frame-size math below overflow-free.
      require(windowMs > 0 && windowMs <= 3600000,
        s"wav windowMs must be in (0, 3600000], got $windowMs")
      new FrameDecoder {
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

    /** A REAL compressed-image codec through the same boundary, using
      * the JDK's built-in `javax.imageio` PNG reader — no external
      * library (the sandbox has no media libs, but ImageIO ships in
      * every JDK). Frames are IMAGE ROWS: frame `y` carries row `y`'s
      * band-0 samples (the gray value for grayscale PNGs, the red
      * channel for RGB) as one byte per pixel — the row-major shape a
      * pixel fingerprint / embedding stage consumes. Malformed blobs
      * (bad signature, truncated stream, junk bytes, zero-dim images)
      * decode to ZERO frames — the same corrupt-row discipline as
      * [[wav]]: at 100 TB some fraction of any media corpus IS corrupt,
      * and a bad row must drop out, not kill the task. */
    val png: FrameDecoder = new FrameDecoder {
      def decode(blob: Array[Byte]): Iterator[Frame] = {
        // in-memory decode only: ImageIO's default disk cache would
        // write a temp file per blob on every executor
        javax.imageio.ImageIO.setUseCache(false)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
          catch { case _: Exception => null } // malformed chunk structure
        if (img == null) return Iterator.empty // unrecognized / corrupt
        val (w, h) = (img.getWidth, img.getHeight)
        if (w <= 0 || h <= 0) return Iterator.empty
        val raster = img.getRaster
        // >8-bit samples (16-bit grayscale PNG) keep the HIGH byte:
        // masking the low byte would map gray 0x0100 -> 0x00 while
        // 0x00FF -> 0xFF, destroying ordinal structure silently
        val bits = img.getColorModel.getComponentSize(0)
        val shift = math.max(0, bits - 8)
        Iterator.range(0, h).map { y =>
          val s = raster.getSamples(0, y, w, 1, 0, null: Array[Int])
          val row = new Array[Byte](w)
          var x = 0
          while (x < w) { row(x) = ((s(x) >> shift) & 0xff).toByte; x += 1 }
          Frame(y, row)
        }
      }
    }
  }

  /** PNG-encode a grayscale pixel matrix (row-major, one byte per
    * pixel) via the JDK encoder — the encode side of the
    * [[FrameDecoder.png]] round trip, used by the q140 gate fixture and
    * specs. All rows must share one width. */
  def encodeGrayPng(rows: Array[Array[Byte]]): Array[Byte] = {
    require(rows.nonEmpty && rows.head.nonEmpty, "need a non-empty pixel matrix")
    val (h, w) = (rows.length, rows.head.length)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, rows(y)(x) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Distributed decode keeping the RAW frame bytes (vs
    * [[extractFrames]], which reduces to hash + features): one
    * mapPartitions pass, no shuffle. Only (id, idx, row bytes) leaves
    * the stage — for image rows that is W bytes, not the compressed
    * blob. Each row also carries the blob's total `n_frames`, so
    * downstream per-media geometry (frame-sampling, vertical resize)
    * needs NO dims aggregate + join-back — without it, deriving
    * heights forces a second full decode of every blob (the plan
    * audit on q145's first version showed exactly that: two decode
    * arms + an exchange + a join, all gone now). The whole frame set
    * of one blob is already in memory as the decoded image, so
    * counting it first costs nothing extra. */
  def decodedRows(media: DataFrame, idCol: String, blobCol: String,
                  decoder: FrameDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          // buffers ONE blob's frames (the PNG image is already fully in
          // memory; for WAV this transiently doubles the data chunk) —
          // bounded by the module's chunk-store rule: blobs >~100 MB are
          // stored one row per chunk, so a row's frames fit task memory
          val fs = decoder.decode(blob).toArray
          fs.iterator.map(f => (id, f.idx, f.bytes.length, fs.length, f.bytes))
        }
      }.toDF("media_id", "frame_idx", "n_bytes", "n_frames", "bytes")
  }

  /** q140 gate fixture: a deterministic grayscale PNG blob per doc_id —
    * pixel(x, y) = (doc_id + 7x + 13y) mod 256, height 8 + doc_id mod 5
    * (variable frames per blob), REAL JDK PNG encoding. Every
    * doc_id % 7 == 3 blob gets its signature byte smashed post-encode:
    * the corrupt-row population the decoder must drop to zero frames.
    * The DuckDB oracle recomputes the same pixel generator directly —
    * it never sees a PNG — so the gate proves the compressed round trip
    * is lossless. */
  def pngFixture(docs: DataFrame, width: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val h = 8 + (id % 5).toInt
          val rows = Array.tabulate(h, width)((y, x) =>
            ((id + 7L * x + 13L * y) % 256).toByte)
          val blob = encodeGrayPng(rows)
          if (id % 7 == 3) blob(1) = 'Z'.toByte // smash the PNG signature
          (id, blob)
        }
      }.toDF("doc_id", "blob")
  }

  /** Nearest-neighbor grayscale resize over DECODED frame rows (the
    * [[decodedRows]] shape: one row per image row, carrying its blob's
    * `n_frames`), to a fixed `outH`×`outW` — the resize + frame-sample
    * stage of an image pipeline, in ONE narrow (shuffle-free) pass of
    * codegen'd expressions, no UDF:
    *  - vertical resample = frame-SAMPLING: each row derives, from its
    *    own (frame_idx, n_frames), the output coordinates `y` with
    *    `⌊y·h/outH⌋ = frame_idx` (a filtered transform over
    *    `sequence(0, outH−1)`, exploded) — unsampled rows produce an
    *    empty array and drop out at the explode; no dims aggregate, no
    *    join-back, no second decode (the first version paid all
    *    three — caught by the plan audit);
    *  - horizontal resample = `substring` at `⌊x·w/outW⌋` over the row
    *    bytes (w = the row's own n_bytes), emitted as hex.
    * Scale: zero exchanges; work is outH×outW byte lookups per media
    * regardless of source resolution, and upstream column pruning
    * still reaches the scan. */
  def resizeGrayRows(frames: DataFrame, outH: Int, outW: Int): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames
      .withColumn("y", explode(expr(
        s"""filter(transform(sequence(0, ${outH - 1}),
           |  y -> if(CAST(y AS BIGINT) * n_frames div $outH = CAST(frame_idx AS BIGINT), y, -1)),
           |  v -> v >= 0)""".stripMargin)))
      .select($"media_id", $"y",
        expr(s"""array_join(transform(sequence(0, ${outW - 1}),
                 |  x -> hex(substring(bytes, CAST(CAST(x AS BIGINT) * n_bytes div $outW AS INT) + 1, 1))), '')"""
          .stripMargin).as("row_hex"))
  }

  /** Per-frame integer DSP features: sample count, Σs² (energy), peak
    * |s|, and zero-crossing count over the frame's 16-bit LE PCM
    * samples. All-integer math → hash-exact against an oracle that
    * recomputes from the sample GENERATOR (never parsing a WAV). */
  final case class AudioFeatureRow(media_id: Long, frame_idx: Long,
                                   n_samples: Long, sumsq: Long,
                                   peak: Long, zc: Long)

  /** Fused WAV decode → per-frame feature extraction in ONE
    * mapPartitions pass: the heavy PCM bytes never leave the stage —
    * only (id, frame, 4 longs) crosses the boundary (the same
    * keep-bytes-inside-the-partition rule as [[extractFrames]]).
    * Frames come from [[FrameDecoder.wav]] (fixed-duration windows
    * whose byte size depends on each blob's own sample rate), so the
    * feature stream inherits the corrupt-row discipline: malformed
    * blobs contribute zero rows. Odd trailing bytes (a frame that
    * splits a sample) are ignored sample-wise. */
  def extractAudioFeatures(media: DataFrame, idCol: String, blobCol: String,
                           windowMs: Int): Dataset[AudioFeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    val dec = FrameDecoder.wav(windowMs)
    media.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          dec.decode(blob).map { f =>
            val b = f.bytes
            val n = b.length / 2
            var sumsq = 0L; var peak = 0L; var zc = 0L
            var prevNonNeg = false
            var i = 0
            while (i < n) {
              val s = (((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort).toInt
              sumsq += s.toLong * s
              val a = math.abs(s.toLong)
              if (a > peak) peak = a
              val nonNeg = s >= 0
              if (i > 0 && nonNeg != prevNonNeg) zc += 1
              prevNonNeg = nonNeg
              i += 1
            }
            AudioFeatureRow(id, f.idx.toLong, n.toLong, sumsq, peak, zc)
          }
        }
      }
  }

  /** q146 gate fixture: a deterministic mono 16-bit PCM WAV per doc_id
    * with per-blob audio parameters — sampleRate 8/12/16 kHz by
    * doc_id % 3 (so the 50 ms frame SIZE varies per blob) and
    * 600..1200 samples by doc_id % 4 (so the frame COUNT varies too);
    * sample i = ((doc_id·31 + i·17) mod 4096) − 2048, LE16. Every
    * doc_id % 7 == 3 blob gets its RIFF magic smashed post-encode: the
    * corrupt population the decoder must drop to zero frames. The
    * DuckDB oracle recomputes the same generator directly — it never
    * parses a WAV — so a green hash proves header synthesis, chunk
    * walk, LE16 decode, and the integer feature math all compose
    * losslessly. */
  def wavFixture(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val sampleRate = 8000 + (id % 3).toInt * 4000
          val nSamp = 600 + (id % 4).toInt * 200
          val dataLen = 2 * nSamp
          val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
          bb.put("fmt ".getBytes).putInt(16)
            .putShort(1.toShort).putShort(1.toShort) // PCM, mono
            .putInt(sampleRate).putInt(sampleRate * 2)
            .putShort(2.toShort).putShort(16.toShort)
          bb.put("data".getBytes).putInt(dataLen)
          var i = 0
          while (i < nSamp) {
            bb.putShort((((id * 31 + i.toLong * 17) % 4096) - 2048).toShort)
            i += 1
          }
          val blob = bb.array()
          if (id % 7 == 3) blob(0) = 'X'.toByte // smash the RIFF magic
          (id, blob)
        }
      }.toDF("doc_id", "blob")
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
