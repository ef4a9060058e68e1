package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The real image-decode path: PNG/BMP golden bytes (rendered
  * deterministically in-test with java.awt, encoded by the same JDK
  * ImageIO that decodes them) flow through the batched media pipeline and
  * come out with exact dimensions and an exact pixel-luminance histogram.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  /** 4×2 image with known luminance per pixel: 2 black (bin 0), 2 dark
    * gray 0x40 (bin 1), 2 light gray 0x80 (bin 2), 2 white (bin 3).
    */
  private def goldenImage(format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val colors = Seq(0x000000, 0x000000, 0x404040, 0x404040,
      0x808080, 0x808080, 0xffffff, 0xffffff)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, colors((y * 4 + x) % 8))
    // rows are identical, so per-bin counts double: 2 of each luminance
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  test("decodeFeatures: golden PNG and BMP decode to the exact histogram") {
    for (fmt <- Seq("png", "bmp")) {
      val media = Seq((1L, goldenImage(fmt)))
        .toDF("doc_id", "payload")
        .select(col("doc_id"),
          Multimodal.asMedia(col("payload"), s"image/$fmt").as("media"))
      val feats = Multimodal.decodeFeatures(media, "doc_id", "media")
        .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
      // 8 pixels, 2 per luminance bin → density 0.25 in every bin
      assert(feats == Map(0 -> 0.25, 1 -> 0.25, 2 -> 0.25, 3 -> 0.25), fmt)
    }
  }

  test("imageMeta: real width/height for images, nulls for other media") {
    val media = Seq(
      (1L, goldenImage("png"), "image/png"),
      (2L, "just some text".getBytes("UTF-8"), "text/plain"),
      (3L, Array[Byte](1, 2, 3), "video/mp4"))
      .toDF("doc_id", "payload", "mime")
      .select(col("doc_id"),
        struct(col("payload").as("bytes"), col("mime").as("mime"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"))
          .as("media"))
    val metas = Multimodal.imageMeta(media, "doc_id", "media")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(metas(1L) == (Some(4), Some(2)))
    assert(metas(2L) == (None, None))
    assert(metas(3L) == (None, None))
  }

  test("audioMeta: golden WAV parses to exact rate/channels/frames/duration") {
    // 6 frames of 16-bit stereo at 8000 Hz: 24 payload bytes + one odd
    // trailing byte that must be truncated off (whole-frame contract)
    val payload = Array.tabulate[Byte](25)(i => (i * 3).toByte)
    val wav = Multimodal.wavBytes(8000, 2, payload)
    val media = Seq((1L, wav, "audio/wav"),
      (2L, "not audio at all".getBytes("UTF-8"), "audio/wav"),
      (3L, wav, "text/plain")) // right bytes, wrong mime → not decoded
      .toDF("doc_id", "payload", "mime")
      .select(col("doc_id"),
        struct(col("payload").as("bytes"), col("mime").as("mime"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"))
          .as("media"))
    val rows = Multimodal.audioMeta(media, "doc_id", "media")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
      .toMap
    // 24 bytes / (2 ch · 2 B) = 6 frames; 6 · 10⁶ / 8000 = 750 µs
    assert(rows(1L) == ((Some(8000L), Some(2L), Some(6L), Some(750L))))
    assert(rows(2L) == ((None, None, None, None)))
    assert(rows(3L) == ((None, None, None, None)))
  }

  test("audioMeta: AIFF container (JDK-written) parses like WAV") {
    // render golden AIFF bytes with the same AudioSystem that decodes them
    // (the image specs' ImageIO pattern): 4 frames of 16-bit mono @ 11025
    val data = Array.tabulate[Byte](8)(i => (i * 5).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(11025f, 16, 1, true, true)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, 4)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    val media = Seq((7L, out.toByteArray))
      .toDF("doc_id", "payload")
      .select(col("doc_id"),
        Multimodal.asMedia(col("payload"), "audio/aiff").as("media"))
    val rows = Multimodal.audioMeta(media, "doc_id", "media").collect()
    val r = rows.head
    // 4 frames at 11025 Hz mono: 4·10⁶/11025 = 362 µs
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((11025L, 1L, 4L, 362L)))
  }

  test("docWav round-trip: AudioSystem recovers the derived rate/channels") {
    val docs = Seq((5L, "0123456789abcdef"), (6L, "xyz")).toDF("doc_id", "text")
    val meta = Multimodal.audioMeta(
      Multimodal.docWav(docs, "doc_id", "text"), "doc_id", "media")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // id 5: rate 8000+5·1000=13000, 2 ch → 16/4=4 frames, 4·10⁶/13000=307 µs
    assert(meta(5L) == ((13000L, 2L, 4L, 307L)))
    // id 6: rate 8000+6·1000=14000, 1 ch → 3/2=1 frame, 10⁶/14000=71 µs
    assert(meta(6L) == ((14000L, 1L, 1L, 71L)))
  }

  test("golden animated GIF: every frame decodes to exact dims and luminance") {
    // 3 uniform-gray frames rendered by the same JDK GIF writer that the
    // reader decodes — the indexed 256-gray palette makes the round trip
    // exact (no quantizer anywhere)
    val gif = Multimodal.gifBytes(Seq(10, 200, 77), w = 8, h = 8)
    val frames = Multimodal.decodeGifFrames(gif)
    assert(frames.contains(IndexedSeq((8, 8, 10.0), (8, 8, 200.0), (8, 8, 77.0))))
    assert(Multimodal.decodeGifFrames("not a gif".getBytes("UTF-8")).isEmpty)
  }

  test("frameSample: real frames for GIFs, byte-offset stub for video mimes") {
    val media = Seq(
      (1L, Multimodal.gifBytes(Seq(5, 6, 7, 8, 9), 8, 8), "image/gif"),
      (2L, Array.fill[Byte](130)(0), "video/mp4"),
      // empty payload: NO rows — matching the oracle's
      // range(0, octet_length, stride) at length 0
      (3L, Array.empty[Byte], "video/mp4"))
      .toDF("doc_id", "payload", "mime")
      .select(col("doc_id"),
        struct(col("payload").as("bytes"), col("mime").as("mime"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"))
          .as("media"))
    val rows = Multimodal.frameSample(media, "doc_id", "media",
        frameStride = 2, byteStride = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toSet
    assert(rows == Set(
      // GIF: frames 0, 2, 4 of 5, true dims + per-frame gray
      (1L, 0L, Some(8), Some(8), Some(5.0)),
      (1L, 2L, Some(8), Some(8), Some(7.0)),
      (1L, 4L, Some(8), Some(8), Some(9.0)),
      // video: offsets 0, 64, 128 of a 130-byte payload, decode cols null
      (2L, 0L, None, None, None),
      (2L, 64L, None, None, None),
      (2L, 128L, None, None, None)))
  }

  test("videoMeta: golden MP4 box walk and AVI RIFF walk round-trip") {
    val media = Seq(
      // 3 tracks, timescale 600, duration 1234 → ms = 1234*1000/600 = 2056
      (1L, Multimodal.mp4Bytes(600, 1234, 320, 180, 3), "video/mp4"),
      // 33333 µs/frame × 42 frames → 1399986/1000 = 1399 ms, 2 streams
      (2L, Multimodal.aviBytes(33333, 42, 640, 480, 2), "video/x-msvideo"),
      (3L, Array.fill[Byte](64)(7), "video/mp4"), // garbage: nulls
      (4L, Multimodal.mp4Bytes(600, 600, 16, 9, 1), "text/plain")) // wrong mime: nulls
      .toDF("doc_id", "payload", "mime")
      .select(col("doc_id"),
        struct(col("payload").as("bytes"), col("mime").as("mime"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"))
          .as("media"))
    val rows = Multimodal.videoMeta(media, "doc_id", "media")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toSet
    assert(rows == Set(
      (1L, Some("mp4"), Some(2056L), Some(320L), Some(180L), Some(3L)),
      (2L, Some("avi"), Some(1399L), Some(640L), Some(480L), Some(2L)),
      (3L, None, None, None, None, None),
      (4L, None, None, None, None, None)))
  }

  test("resizeFit: golden two-tone PNG resizes to exact NN geometry and sum") {
    // 4×2 image, left half gray 40, right half 200; fit into a 2×2 box:
    // m=4 → dw=2, dh=1; NN samples src x = 0·4÷2=0 (left), 1·4÷2=2
    // (right) → lum_sum = 40 + 200, n_px = 2
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) {
      val g = if (x * 2 < 4) 40 else 200
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val media = Seq((5L, out.toByteArray, "image/png"),
      (6L, "not an image".getBytes("UTF-8"), "video/mp4"))
      .toDF("doc_id", "payload", "mime")
      .select(col("doc_id"),
        struct(col("payload").as("bytes"), col("mime").as("mime"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"))
          .as("media"))
    val rows = Multimodal.resizeFit(media, "doc_id", "media", box = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getLong(5), r.getLong(6)))
    // non-image rows are dropped (no decode, no resize)
    assert(rows.toSeq == Seq((5L, 4, 2, 2, 1, 240L, 2L)))
  }

  test("docPng round-trip: resizeFit geometry matches the id arithmetic") {
    val docs = Seq((3L, "x"), (12L, "y")).toDF("doc_id", "text")
    val rows = Multimodal.resizeFit(
        Multimodal.docPng(docs, "doc_id"), "doc_id", "media", box = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    // id 3: w=11, h=11 → m=11 → dw=dh=8
    assert(rows(3L) == ((11, 11, 8, 8)))
    // id 12: w=20, h=12 → m=20 → dw=8, dh=12·8÷20=4
    assert(rows(12L) == ((20, 12, 8, 4)))
  }

  test("decodeFeatures: non-image mimes take the byte-histogram fallback") {
    val payload = Array[Byte](0, 10, 70, 80, -128, -1) // bins 0,0,1,1,2,3
    val media = Seq((9L, payload)).toDF("doc_id", "payload")
      .select(col("doc_id"),
        Multimodal.asMedia(col("payload"), "audio/wav").as("media"))
    val feats = Multimodal.decodeFeatures(media, "doc_id", "media")
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    val exp = Map(0 -> 2 / 6.0, 1 -> 2 / 6.0, 2 -> 1 / 6.0, 3 -> 1 / 6.0)
    assert(feats == exp)
  }
}
