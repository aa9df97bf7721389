package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core.Tables

/** Multimodal plumbing: binary column → distributed frame decode →
  * per-frame digest + feature vector. The stub decoder pins the
  * schema/partitioning/batch shape; the REAL codecs (RIFF/WAVE PCM and
  * JDK-ImageIO PNG) run through the same trait boundary below. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("frame extraction: counts, hashes and features are deterministic and consistent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.binarize(docs)
    val frames = Multimodal.extractFrames(media, "doc_id", "blob").collect()

    import spark.implicits._
    val expectedCounts = media
      .selectExpr("doc_id", "CAST(ceil(octet_length(blob) / 64.0) AS INT) AS n")
      .as[(Long, Int)].collect().toMap
    val gotCounts = frames.groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(gotCounts == expectedCounts)

    // every frame's feature histogram sums to its byte count
    assert(frames.forall(f => f.features.sum.toInt == f.n_bytes))
    // frame indexes are dense per medium
    assert(frames.groupBy(_.media_id).values.forall(g =>
      g.map(_.frame_idx).sorted.toSeq == (0 until g.length)))

    // re-run is bit-identical (stub decode is deterministic)
    val again = Multimodal.extractFrames(media, "doc_id", "blob").collect()
    assert(again.map(f => (f.media_id, f.frame_idx, f.frame_md5)).sortBy(x => (x._1, x._2)).toSeq
      == frames.map(f => (f.media_id, f.frame_idx, f.frame_md5)).sortBy(x => (x._1, x._2)).toSeq)
  }

  test("real codec through the trait boundary: RIFF/WAVE PCM decode, variable frames, failure rows") {
    import spark.implicits._

    // build a valid PCM WAV: 44-byte canonical header + data
    def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
                 dataLen: Int, seed: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val byteRate = sampleRate * channels * bitsPerSample / 8
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16)
        .putShort(1.toShort) // PCM
        .putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
        .putShort((channels * bitsPerSample / 8).toShort)
        .putShort(bitsPerSample.toShort)
      bb.put("data".getBytes).putInt(dataLen)
      (0 until dataLen).foreach(i => bb.put(((i * 31 + seed) & 0xff).toByte))
      bb.array()
    }

    // 25 ms windows: frame size = byteRate / 40, so frame COUNT depends on
    // each blob's own audio parameters — 8 kHz mono 16-bit → 400 B frames,
    // 16 kHz stereo 16-bit → 1600 B frames
    val blobs = Seq(
      (1L, wavBytes(8000, 1, 16, 2000, 7)),   // 5 frames of 400 B
      (2L, wavBytes(16000, 2, 16, 4000, 11)), // 3 frames (1600,1600,800)
      (3L, wavBytes(8000, 1, 8, 150, 3)),     // 1 partial frame (200 B window)
      (4L, "not a wav at all".getBytes),      // corrupt: 0 frames, not a crash
      (5L, wavBytes(8000, 1, 16, 2000, 7).take(30)) // truncated header: 0 frames
    )
    val media = blobs.toDF("media_id", "blob")
    val frames = Multimodal.extractFrames(media, "media_id", "blob",
      Multimodal.FrameDecoder.wav(25)).collect()

    val byId = frames.groupBy(_.media_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    assert(byId(1L).map(_.n_bytes).toSeq == Seq(400, 400, 400, 400, 400))
    assert(byId(2L).map(_.n_bytes).toSeq == Seq(1600, 1600, 800))
    assert(byId(3L).map(_.n_bytes).toSeq == Seq(150))
    assert(!byId.contains(4L) && !byId.contains(5L)) // failure rows dropped
    // frame bytes really are the PCM data (deterministic generator → md5 stable)
    val again = Multimodal.extractFrames(media, "media_id", "blob",
      Multimodal.FrameDecoder.wav(25)).collect()
    assert(again.map(f => (f.media_id, f.frame_idx, f.frame_md5)).sorted.toSeq ==
      frames.map(f => (f.media_id, f.frame_idx, f.frame_md5)).sorted.toSeq)
    // features still flow: histogram sums equal byte counts, same as the stub path
    assert(frames.forall(f => f.features.sum.toInt == f.n_bytes))
  }

  test("wav chunk-walk property: junk chunks, odd-size word alignment, and garbage never break framing") {
    // seeded random RIFF layouts: junk chunks (LIST/INFO/random tags,
    // odd sizes exercising word alignment) interleaved around fmt/data;
    // the decoder must find the PCM data regardless, and produce frames
    // that concatenate back to exactly the data chunk
    val rnd = new scala.util.Random(42)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(tag.getBytes("US-ASCII")).putInt(body.length).put(body)
      if ((body.length & 1) == 1) bb.put(0.toByte) // word-aligned pad
      bb.array()
    }
    def fmtChunk(rate: Int, ch: Int, bits: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putShort(1).putShort(ch.toShort).putInt(rate)
        .putInt(rate * ch * bits / 8).putShort((ch * bits / 8).toShort)
        .putShort(bits.toShort)
      bb.array()
    }
    val dec = Multimodal.FrameDecoder.wav(25)
    (1 to 25).foreach { _ =>
      val rate = Seq(8000, 16000, 44100)(rnd.nextInt(3))
      val ch = 1 + rnd.nextInt(2)
      val data = Array.tabulate(1 + rnd.nextInt(4000))(i => (i * 7).toByte)
      def junk() = chunk(Seq("LIST", "fact", "cue ", "junk")(rnd.nextInt(4)),
        Array.fill(rnd.nextInt(17))(rnd.nextInt(256).toByte)) // odd sizes too
      val chunks = Seq.fill(rnd.nextInt(3))(junk()) ++ Seq(fmtChunk(rate, ch, 16)).map(chunk("fmt ", _)) ++
        Seq.fill(rnd.nextInt(3))(junk()) ++ Seq(chunk("data", data)) ++ Seq.fill(rnd.nextInt(2))(junk())
      val body = chunks.reduce(_ ++ _)
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(4 + body.length).put("WAVE".getBytes).put(body)
      val frames = dec.decode(bb.array()).toVector
      val frameBytes = math.max(1, rate * ch * 2 * 25 / 1000)
      assert(frames.length == (data.length + frameBytes - 1) / frameBytes,
        s"rate=$rate ch=$ch len=${data.length}")
      assert(frames.flatMap(_.bytes).toSeq == data.toSeq, "frames must tile the data chunk exactly")
      assert(frames.map(_.idx) == frames.indices.toVector)
      // random garbage (not RIFF) must yield zero frames, never throw
      val garbage = Array.fill(rnd.nextInt(100))(rnd.nextInt(256).toByte)
      assert(dec.decode(garbage).isEmpty)
    }
  }

  test("png codec: lossless row round trip, variable heights, corrupt blobs drop to zero frames") {
    import spark.implicits._
    val dec = Multimodal.FrameDecoder.png
    // exact round trip: random gray matrices encode → decode to the
    // same bytes, frame idx = row idx, one frame per row
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { _ =>
      val (h, w) = (1 + rnd.nextInt(12), 1 + rnd.nextInt(40))
      val rows = Array.fill(h, w)(rnd.nextInt(256).toByte)
      val out = dec.decode(Multimodal.encodeGrayPng(rows)).toVector
      assert(out.length == h)
      assert(out.map(_.idx) == (0 until h).toVector)
      assert(out.map(_.bytes.toSeq) == rows.map(_.toSeq).toVector, s"h=$h w=$w")
    }
    // property vs junk: garbage, truncations and signature smashes must
    // yield zero frames, never throw
    val good = Multimodal.encodeGrayPng(Array.fill(6, 9)(42.toByte))
    (1 to 40).foreach { _ =>
      assert(dec.decode(Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)).isEmpty)
      // truncation inside the signature/IHDR must be empty; any longer
      // truncation must at least never throw (ImageIO may salvage a
      // complete IDAT even when IEND is missing)
      assert(dec.decode(good.take(rnd.nextInt(33))).isEmpty)
      dec.decode(good.take(33 + rnd.nextInt(good.length - 33))).size
      val smashed = good.clone(); smashed(rnd.nextInt(8)) = rnd.nextInt(256).toByte
      dec.decode(smashed).size // signature/header damage: no throw
    }
    assert(dec.decode(Array.emptyByteArray).isEmpty)

    // distributed: the q140 fixture through extractFrames (trait
    // plumbing) — corrupt population absent, heights follow doc_id % 5
    val fix = Multimodal.pngFixture(
      Tables.documents(spark, "/root/testdata/sf0.001").filter($"doc_id" < 30))
    val frames = Multimodal.extractFrames(fix, "doc_id", "blob", dec).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId.keySet.forall(_ % 7 != 3) && byId.nonEmpty)
    assert(byId.forall { case (id, fs) => fs.length == 8 + (id % 5).toInt })
    assert(frames.forall(_.n_bytes == 32))
  }

  test("pipeline integration: frame features flow into the ANN operator (quantized_dot)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps

    val docs = Tables.documents(spark, "/root/testdata/sf0.001").filter($"doc_id" < 20)
    val frames = Multimodal.extractFrames(Multimodal.binarize(docs), "doc_id", "blob")
      .toDF().filter($"frame_idx" === 0) // first frame per medium
      .select($"media_id", $"features")

    // nearest neighbor per frame among the other frames, via the native
    // codegen expression — the multimodal → similarity-search hand-off
    val q = frames.select($"media_id".as("q_id"), $"features".as("q_f"),
      VectorOps.sqNormQ($"features").as("q_n"))
    val c = frames.select($"media_id".as("c_id"), $"features".as("c_f"),
      VectorOps.sqNormQ($"features").as("c_n"))
    val nn = q.join(c, $"q_id" =!= $"c_id")
      .select($"q_id", $"c_id",
        (VectorOps.dotQ($"q_f", $"c_f").cast("double") /
          sqrt($"q_n".cast("double") * $"c_n".cast("double"))).as("cosine"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"q_id")
          .orderBy($"cosine".desc, $"c_id")))
      .filter($"rn" === 1)
      .collect()

    assert(nn.length == 20) // every frame found a neighbor
    assert(nn.forall { r =>
      val cos = r.getAs[Double]("cosine"); cos >= -1.0001 && cos <= 1.0001
    })
  }

  test("resizeGrayRows: nearest-neighbor sampling hits exact source pixels; corrupt media drop out") {
    import spark.implicits._
    // two known images through a REAL PNG round trip: 16×8 gradient and
    // 32×12 checker; plus one corrupt blob that must vanish, not crash
    def px(w: Int, h: Int)(f: (Int, Int) => Int): Array[Array[Byte]] =
      Array.tabulate(h, w)((y, x) => (f(x, y) & 0xff).toByte)
    val grad = Multimodal.encodeGrayPng(px(16, 8)((x, y) => x * 16 + y))
    val check = Multimodal.encodeGrayPng(px(32, 12)((x, y) => ((x + y) % 2) * 255))
    val media = Seq((1L, grad), (2L, check), (3L, "junk".getBytes))
      .toDF("media_id", "blob")
    val frames = Multimodal.decodedRows(media, "media_id", "blob",
      Multimodal.FrameDecoder.png)
    val out = Multimodal.resizeGrayRows(frames, 4, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap

    assert(out.size == 8 && !out.keys.exists(_._1 == 3L)) // 2 media × 4 rows
    // nearest-neighbor = EXACT source pixels at (⌊x·w/4⌋, ⌊y·h/4⌋)
    def hexRow(w: Int, h: Int, y: Int)(f: (Int, Int) => Int): String =
      (0 until 4).map(x => f"${f(x * w / 4, y * h / 4) & 0xff}%02X").mkString
    (0 until 4).foreach { y =>
      assert(out((1L, y)) == hexRow(16, 8, y)((x, yy) => x * 16 + yy))
      assert(out((2L, y)) == hexRow(32, 12, y)((x, yy) => ((x + yy) % 2) * 255))
    }
  }

  test("extractAudioFeatures: integer DSP vs a hand-computed frame; corrupt and split-sample edges") {
    import spark.implicits._
    // one 8 kHz mono 16-bit blob with KNOWN samples: 50 ms frames = 400
    // samples; 500 samples total → frame 0 full, frame 1 partial (100)
    def wav(samples: Seq[Int], dropBytes: Int = 0): Array[Byte] = {
      val dataLen = samples.length * 2 - dropBytes // declared AND written
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1.toShort).putShort(1.toShort)
        .putInt(8000).putInt(16000).putShort(2.toShort).putShort(16.toShort)
      bb.put("data".getBytes).putInt(dataLen)
      val raw = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(s => raw.putShort(s.toShort))
      bb.put(raw.array(), 0, dataLen)
      bb.array()
    }
    val samples = (0 until 500).map(i => (i % 7) * 100 - 300) // crosses zero
    val media = Seq((1L, wav(samples)), (2L, "nope".getBytes))
      .toDF("media_id", "blob")
    val rows = Multimodal.extractAudioFeatures(media, "media_id", "blob", 50)
      .collect().sortBy(_.frame_idx)

    assert(rows.map(_.media_id).toSet == Set(1L)) // corrupt row dropped
    assert(rows.map(r => (r.frame_idx, r.n_samples)).toSeq == Seq((0L, 400L), (1L, 100L)))
    def feats(s: Seq[Int]): (Long, Long, Long) = {
      val sumsq = s.map(v => v.toLong * v).sum
      val peak = s.map(v => math.abs(v.toLong)).max
      val zc = s.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
      (sumsq, peak, zc.toLong)
    }
    val (s0, p0, z0) = feats(samples.take(400))
    val (s1, p1, z1) = feats(samples.drop(400))
    assert((rows(0).sumsq, rows(0).peak, rows(0).zc) == ((s0, p0, z0)))
    assert((rows(1).sumsq, rows(1).peak, rows(1).zc) == ((s1, p1, z1)))

    // a data chunk with an odd byte count (last frame splits a sample):
    // the dangling byte is ignored sample-wise, never an index error
    val odd = wav(samples, dropBytes = 1) // declared dataLen 999
    val oddRows = Multimodal.extractAudioFeatures(
      Seq((1L, odd)).toDF("media_id", "blob"), "media_id", "blob", 50).collect()
    assert(oddRows.map(_.n_samples).sum == 499L)
  }
}
