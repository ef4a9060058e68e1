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
