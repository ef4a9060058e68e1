package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The IMAGE decode path is REAL: [[decodeFeatures]] / [[imageMeta]] run
  * `javax.imageio` (PNG/BMP/GIF/JPEG readers ship with the JDK — no
  * external codec needed) over each payload, producing true width/height
  * and a pixel-luminance histogram. Audio/video decode stays STUBBED
  * ([[decodeStub]]/[[frameSampleStub]]: this environment ships no such
  * codecs) with deterministic fake features — the media schema, batched
  * `mapPartitions` shape (the Scala analogue of `mapInPandas` batch
  * processing) and partitioning contract are identical, so a real codec
  * drops in by replacing one function.
  */
object Multimodal {

  /** Schema of a media column: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a binary payload column into the media struct. */
  def asMedia(bytes: org.apache.spark.sql.Column, mime: String): org.apache.spark.sql.Column =
    struct(bytes.as("bytes"), lit(mime).as("mime"),
      lit(null).cast(IntegerType).as("width"), lit(null).cast(IntegerType).as("height"))

  /** Cheap metadata over the payload — pure built-ins, no decode:
    * byte length + sha256 content hash (dedup key for media).
    */
  def binaryMeta(df: DataFrame, idCol: String, mediaCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(s"$mediaCol.bytes")).cast("long").as("byte_len"),
      sha2(col(s"$mediaCol.bytes"), 256).as("content_sha256"),
      col(s"$mediaCol.mime").as("mime"))

  final case class MediaFeature(id: Long, dim: Int, value: Double)
  final case class MediaDims(id: Long, mime: String, width: Option[Int], height: Option[Int])

  /** JDK-only image decode (`javax.imageio` — PNG/BMP/GIF/JPEG readers are
    * part of the JDK). Returns (width, height, 4-bin luminance-histogram
    * density over the decoded pixels); None when no installed reader
    * accepts the payload. Deterministic for lossless formats (PNG/BMP):
    * the pixel values are exact, so the histogram is engine-independent.
    */
  private[operators] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            hist(lum / 64) += 1
            x += 1
          }
          y += 1
        }
        val n = math.max(1L, w.toLong * h).toDouble
        Some((w, h, hist.map(_ / n)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode + feature extraction with the REAL image path: payloads whose
    * mime is `image/ *` go through [[decodeImage]] (luminance histogram
    * over actual pixels); every other mime — and any image payload no
    * reader accepts — falls back to the deterministic byte histogram
    * ([[decodeStub]]'s fake, kept for the codec-less audio/video classes).
    * Output schema matches [[decodeStub]]: (id, dim, value).
    */
  def decodeFeatures(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"),
      col(s"$mediaCol.bytes").as("bytes"), col(s"$mediaCol.mime").as("mime"))
    implicit val enc = Encoders.product[MediaFeature]
    input.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val mime = r.getString(2)
        val decoded =
          if (mime != null && mime.startsWith("image/")) decodeImage(bytes) else None
        decoded match {
          case Some((_, _, hist)) =>
            hist.toIndexedSeq.zipWithIndex.map { case (v, d) => MediaFeature(id, d, v) }
          case None =>
            val hist = new Array[Long](4)
            var i = 0
            while (i < bytes.length) { hist((bytes(i) & 0xff) / 64) += 1; i += 1 }
            val n = math.max(1, bytes.length).toDouble
            (0 until 4).map(d => MediaFeature(id, d, hist(d) / n))
        }
      }
    }.toDF("id", "dim", "value")
  }

  /** Fill width/height in the media metadata from a real decode: one row
    * per input with the decoded dimensions for image payloads, nulls for
    * everything else (the media-schema population step of an ingest
    * pipeline; [[mediaSchema]] carries the dims from here on).
    */
  def imageMeta(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"),
      col(s"$mediaCol.bytes").as("bytes"), col(s"$mediaCol.mime").as("mime"))
    implicit val enc = Encoders.product[MediaDims]
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val mime = r.getString(2)
        val dims =
          if (mime != null && mime.startsWith("image/")) decodeImage(bytes) else None
        MediaDims(id, mime, dims.map(_._1), dims.map(_._2))
      }
    }.toDF("id", "mime", "width", "height")
  }

  /** STUB decode + feature extraction, batched per partition (the real
    * implementation would hand each batch to a codec library). The fake
    * "feature" is a deterministic 4-bin byte histogram density — keeps the
    * batch shape, schema and partitioning contract of the real thing.
    */
  def decodeStub(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"), col(s"$mediaCol.bytes").as("bytes"))
    implicit val enc = Encoders.product[MediaFeature]
    input.mapPartitions { rows: Iterator[Row] =>
      // batch loop: in a real decoder this is where a codec processes a
      // whole Arrow batch; here we fold bytes into a fixed histogram.
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Long](4)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) / 64) += 1; i += 1 }
        val n = math.max(1, bytes.length).toDouble
        (0 until 4).map(d => MediaFeature(id, d, hist(d) / n))
      }
    }.toDF("id", "dim", "value")
  }

  /** Deterministic frame sampling stub: pick every `stride`-th byte offset
    * as a "frame" anchor — the real thing samples video frames; the
    * partition/batch plumbing is identical.
    */
  def frameSampleStub(df: DataFrame, idCol: String, mediaCol: String, stride: Int): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        octet_length(col(s"$mediaCol.bytes")).as("len"))
      .select(col("id"),
        explode(sequence(lit(0), greatest(col("len") - 1, lit(0)), lit(stride)))
          .as("frame_offset"))
}
