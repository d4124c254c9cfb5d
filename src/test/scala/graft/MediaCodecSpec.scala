package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodec, Multimodal}

/** The multimodal decode path is REAL for codec-free formats: these
  * round-trips assert that width/height/frames/brightness recovered by
  * the decoder equal the values the payload was encoded with. */
class MediaCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("BMP round-trip recovers geometry and exact fill brightness") {
    // width 5 → row stride padded 15→16; padding must NOT skew brightness
    val bytes = MediaCodec.encodeBmp(5, 3, 100.toByte)
    val d = MediaCodec.decode(bytes).get
    assert(d.mime == "image/bmp")
    assert(d.width == 5 && d.height == 3 && d.nFrames == 1)
    assert(d.brightness == 100.0 / 255.0)
  }

  test("PPM round-trip recovers geometry and exact fill brightness") {
    val bytes = MediaCodec.encodePpm(7, 2, 200.toByte)
    val d = MediaCodec.decode(bytes).get
    assert(d.mime == "image/x-portable-pixmap")
    assert(d.width == 7 && d.height == 2 && d.nFrames == 1)
    assert(d.brightness == 200.0 / 255.0)
  }

  test("PPM header comments are skipped") {
    val raw = MediaCodec.encodePpm(3, 3, 10.toByte)
    val withComment = ("P6\n# a comment\n3 3\n255\n").getBytes("US-ASCII") ++
      raw.drop("P6\n3 3\n255\n".length)
    val d = MediaCodec.decode(withComment).get
    assert(d.width == 3 && d.height == 3)
  }

  test("WAV PCM-16 round-trip recovers rate/channels/frames and amplitude") {
    val samples = Array[Short](0, 16384, -16384, 32767)
    val bytes = MediaCodec.encodeWavPcm16(44100, 2, samples)
    val d = MediaCodec.decode(bytes).get
    assert(d.mime == "audio/wav")
    assert(d.width == 44100 && d.height == 2 && d.nFrames == 2) // 4 samples / 2 ch
    val expected = samples.map(s => math.abs(s.toInt) / 32768.0).sum / samples.length
    assert(math.abs(d.brightness - expected) < 1e-12)
  }

  test("pcmSamples16 returns the exact encoded samples") {
    val samples = Array[Short](0, 100, -200, 32767, -32768, 7)
    val bytes = MediaCodec.encodeWavPcm16(8000, 1, samples)
    val (rate, ch, got) = MediaCodec.pcmSamples16(bytes).get
    assert(rate == 8000 && ch == 1)
    assert(got.toSeq == samples.toSeq)
    // non-WAV and truncated payloads are rejected, not misparsed
    assert(MediaCodec.pcmSamples16("not audio".getBytes).isEmpty)
    assert(MediaCodec.pcmSamples16(bytes.take(bytes.length - 2)).isEmpty)
  }

  test("audioWindowFeatures: exact windowed RMS and peak, non-WAV yields no rows") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // 6 samples, window of 4 → windows of 4 and 2
    val samples = Array[Short](100, -100, 200, -200, 32767, 0)
    val wav = MediaCodec.encodeWavPcm16(8000, 1, samples)
    val media = Seq(
      (1L, wav),
      (2L, "not a wav at all".getBytes) // ignored
    ).toDF("doc_id", "content")
    val got = graft.operators.Multimodal.audioWindowFeatures(media, windowFrames = 4)
      .orderBy("doc_id", "win").collect()
    assert(got.length == 2)
    val w0 = got(0)
    assert(w0.getLong(0) == 1L && w0.getInt(1) == 0 && w0.getInt(3) == 4)
    val rms0 = math.sqrt((100.0 * 100 + 100 * 100 + 200 * 200 + 200 * 200) / 4) / 32768.0
    assert(math.abs(w0.getDouble(4) - rms0) < 1e-12)
    assert(w0.getInt(5) == 200)
    val w1 = got(1)
    assert(w1.getInt(1) == 1 && w1.getInt(3) == 2 && w1.getInt(5) == 32767)
  }

  test("unknown magic bytes are rejected (caller emits an undecodable row)") {
    assert(MediaCodec.decode("JFIF-like junk".getBytes).isEmpty)
    assert(MediaCodec.decode(Array[Byte]()).isEmpty)
    // truncated BMP header must not crash
    assert(MediaCodec.decode(Array[Byte]('B', 'M', 1, 2, 3)).isEmpty)
  }

  test("PNG round-trip via ImageIO is pixel-exact; JPEG is within codec tolerance") {
    val png = MediaCodec.encodePng(5, 3, 100.toByte)
    val d = MediaCodec.decode(png).get
    assert(d.mime == "image/png" && d.width == 5 && d.height == 3 && d.nFrames == 1)
    assert(d.brightness == 100.0 / 255.0) // lossless: exact, not approximate
    val (w, h, gray) = MediaCodec.grayPixels(png).get
    assert(w == 5 && h == 3 && gray.forall(_ == 300))

    val jpg = MediaCodec.encodeJpeg(16, 9, 180.toByte)
    val j = MediaCodec.decode(jpg).get
    assert(j.mime == "image/jpeg" && j.width == 16 && j.height == 9)
    assert(math.abs(j.brightness - 180.0 / 255.0) <= 0.02,
      s"jpeg solid-fill mean drifted: ${j.brightness}")
  }

  test("truncated PNG/JPEG payloads are rejected, not crashed on") {
    val png = MediaCodec.encodePng(8, 8, 42.toByte)
    assert(MediaCodec.decode(png.take(12)).isEmpty)
    val jpg = MediaCodec.encodeJpeg(8, 8, 42.toByte)
    assert(MediaCodec.decode(jpg.take(3)).isEmpty)
  }

  test("corrupt declared sizes are rejected, not read out of bounds") {
    val bmp = MediaCodec.encodeBmp(4, 4, 1.toByte)
    val truncated = bmp.take(bmp.length - 8) // pixel data shorter than header claims
    assert(MediaCodec.decode(truncated).isEmpty)
    val wav = MediaCodec.encodeWavPcm16(8000, 1, Array[Short](1, 2, 3))
    val cut = wav.take(wav.length - 2)
    assert(MediaCodec.decode(cut).isEmpty)
  }

  test("extractFeatures decodes synthetic real media distributed") {
    val sf = "/root/testdata/sf0.001"
    val media = Multimodal.syntheticMedia(spark, sf)
    val feats = Multimodal.extractFeatures(media, batchSize = 16)
    val rows = feats.orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val mime = r.getAs[String]("mime")
      (id % 3) match {
        case 0 =>
          assert(mime == "image/bmp")
          assert(r.getAs[Int]("width") == (id % 13).toInt + 1)
          assert(r.getAs[Int]("height") == (id % 7).toInt + 1)
          assert(r.getAs[Double]("brightness") == (id % 251) / 255.0)
        case 1 =>
          assert(mime == "image/x-portable-pixmap")
          assert(r.getAs[Int]("width") == (id % 11).toInt + 1)
          assert(r.getAs[Int]("height") == (id % 5).toInt + 1)
        case _ =>
          assert(mime == "audio/wav")
          assert(r.getAs[Int]("width") == 8000 && r.getAs[Int]("height") == 1)
          assert(r.getAs[Int]("n_frames") == (id % 50).toInt + 1)
      }
    }
  }

  test("grayPixels: BMP bottom-up storage is flipped to top-down; PPM is passthrough") {
    // gradient pix(x, y) = x + 10y: distinguishable per position, so a
    // missed row flip or column swap cannot cancel out
    val bmp = MediaCodec.encodeBmpPixels(3, 2, (x, y) => (x + 10 * y).toByte)
    val (w, h, gray) = MediaCodec.grayPixels(bmp).get
    assert(w == 3 && h == 2)
    // top-down row-major, each gray = 3 * (x + 10y)
    assert(gray.toSeq == Seq(0, 3, 6, 30, 33, 36))
    val ppm = MediaCodec.encodePpm(2, 2, 50.toByte)
    val (pw, ph, pg) = MediaCodec.grayPixels(ppm).get
    assert(pw == 2 && ph == 2 && pg.toSeq == Seq(150, 150, 150, 150))
    assert(MediaCodec.grayPixels("not an image".getBytes).isEmpty)
    // WAV is decodable media but has no pixels
    assert(MediaCodec.grayPixels(
      MediaCodec.encodeWavPcm16(8000, 1, Array[Short](1))).isEmpty)
  }

  test("GFTV frame container round-trips and rejects corrupt lengths") {
    val f0 = MediaCodec.encodeBmp(2, 2, 10.toByte)
    val f1 = MediaCodec.encodePpm(1, 1, 20.toByte)
    val f2 = Array[Byte](1, 2, 3)
    val packed = MediaCodec.encodeFrames(Seq(f0, f1, f2))
    val got = MediaCodec.frames(packed).get
    assert(got.length == 3)
    assert(got(0).toSeq == f0.toSeq && got(1).toSeq == f1.toSeq && got(2).toSeq == f2.toSeq)
    assert(MediaCodec.frames(f0).isEmpty) // BMP magic != GFTV
    assert(MediaCodec.frames(packed.take(packed.length - 1)).isEmpty) // truncated
    val hostile = packed.clone()
    hostile(4) = 100 // declared count way past the payload
    assert(MediaCodec.frames(hostile).isEmpty)
  }

  test("imageThumbnails: exact integer average-pool cells, top-down orientation") {
    import spark.implicits._
    // 4×4 gradient pix(x, y) = 4y + x → gray = 3 * (4y + x); grid 2 →
    // cell (gx, gy) mean over a 2×2 block, exact integer division
    val bmp = MediaCodec.encodeBmpPixels(4, 4, (x, y) => (4 * y + x).toByte)
    val media = Seq((7L, bmp), (8L, "junk".getBytes)).toDF("doc_id", "content")
    val rows = graft.operators.Multimodal.imageThumbnails(media, grid = 2).collect()
    assert(rows.length == 1) // junk row yields nothing
    val r = rows(0)
    assert(r.getAs[Long]("doc_id") == 7L)
    assert(r.getAs[Int]("width") == 4 && r.getAs[Int]("height") == 4)
    // block means of gray: top-left {0,1,4,5}*3 → 7 (30/4), top-right
    // {2,3,6,7}*3 → 13 (54/4 = 13.5 → div → 13), bottom-left 31, bottom-right 37
    assert(r.getAs[String]("thumb") == "7,13,31,37")
    // a 1×1 image under grid 2 keeps only the one nonempty cell
    val tiny = MediaCodec.encodeBmpPixels(1, 1, (_, _) => 100.toByte)
    val t = graft.operators.Multimodal
      .imageThumbnails(Seq((1L, tiny)).toDF("doc_id", "content"), grid = 2).collect()(0)
    assert(t.getAs[String]("thumb") == "300")
  }

  test("frameSamples: every k-th frame decoded with exact per-frame features") {
    import spark.implicits._
    val frames = (0 until 7).map(i => MediaCodec.encodeBmp(i + 1, 2, (10 * i).toByte))
    val media = Seq((3L, MediaCodec.encodeFrames(frames))).toDF("doc_id", "content")
    val rows = graft.operators.Multimodal.frameSamples(media, every = 3)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 3, 6))
    rows.foreach { r =>
      val i = r.getAs[Int]("frame_idx")
      assert(r.getAs[Int]("n_frames_total") == 7)
      assert(r.getAs[Int]("width") == i + 1 && r.getAs[Int]("height") == 2)
      assert(r.getAs[Double]("brightness") ==
        math.rint(10.0 * i / 255.0 * 10000) / 10000)
    }
  }

  test("m4/m5 queries run distributed over the synthetic corpus") {
    val sf = "/root/testdata/sf0.001"
    val m4 = Multimodal.queries("m4_thumbnails")(spark, sf).collect()
    // only BMP/PPM docs (2 of every 3) produce thumbnails
    assert(m4.nonEmpty && m4.forall(_.getAs[String]("thumb").nonEmpty))
    val m5 = Multimodal.queries("m5_frame_sample")(spark, sf)
    val counts = m5.groupBy("doc_id").count().collect()
    assert(counts.nonEmpty)
    // 2 + (id % 5) frames sampled every 3rd → 1 or 2 sampled frames
    counts.foreach(r => assert(r.getLong(1) == 1 || r.getLong(1) == 2))
  }

  test("m3_decode_features query is deterministic and ordered") {
    val sf = "/root/testdata/sf0.001"
    val a = Multimodal.queries("m3_decode_features")(spark, sf).collect()
    val b = Multimodal.queries("m3_decode_features")(spark, sf).collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq)
    assert(a.map(_.getAs[Long]("doc_id")).toSeq == a.map(_.getAs[Long]("doc_id")).sorted.toSeq)
  }
}
