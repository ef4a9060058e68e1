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
  * and a pixel-luminance histogram. AUDIO METADATA is also real:
  * [[audioMeta]] parses WAV/AIFF containers with JDK-only
  * `javax.sound.sampled.AudioSystem` (sample rate, channels, frame count,
  * duration). What stays STUBBED is audio CONTENT decode and video
  * ([[decodeStub]]/[[frameSampleStub]]: the JDK ships no mp3/aac/video
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

  final case class AudioMetaRow(id: Long, sample_rate: Option[Long],
    channels: Option[Long], frames: Option[Long], duration_us: Option[Long])

  /** Canonical 16-bit PCM WAV container around `data` (RIFF/fmt/data, the
    * 44-byte header layout): a JVM-side writer used by the declared audio
    * query's fixture-in-query and by the golden-bytes spec. `data` is
    * truncated to whole frames (blockAlign = 2·channels).
    */
  def wavBytes(sampleRate: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
    val blockAlign = 2 * channels
    val dataLen = (data.length / blockAlign) * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(data, 0, dataLen)
    bb.array()
  }

  /** JDK-only audio container parse (`javax.sound.sampled.AudioSystem` —
    * WAV/AIFF/AU readers ship with the JDK): (sampleRate, channels,
    * frameLength); None when no installed reader accepts the payload.
    */
  private[operators] def decodeAudio(bytes: Array[Byte]): Option[(Long, Long, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        // PCM container rates are whole numbers; the float→long round is
        // exact for every real WAV/AIFF header
        Some((math.round(fmt.getSampleRate.toDouble),
          fmt.getChannels.toLong, in.getFrameLength))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL audio metadata: parse each `audio/ *` payload with
    * [[decodeAudio]] and emit (id, sample_rate, channels, frames,
    * duration_us); non-audio mimes and unparseable payloads yield nulls.
    * duration_us = frames·10⁶ / rate in exact Long arithmetic (floor —
    * oracle-mirrorable integer division). Same batched `mapPartitions`
    * contract as the image path.
    */
  def audioMeta(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"),
      col(s"$mediaCol.bytes").as("bytes"), col(s"$mediaCol.mime").as("mime"))
    implicit val enc = Encoders.product[AudioMetaRow]
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val mime = r.getString(2)
        val meta =
          if (mime != null && mime.startsWith("audio/")) decodeAudio(bytes) else None
        meta match {
          case Some((rate, ch, fr)) =>
            AudioMetaRow(id, Some(rate), Some(ch), Some(fr),
              Some(if (rate > 0) fr * 1000000L / rate else 0L))
          case None => AudioMetaRow(id, None, None, None, None)
        }
      }
    }.toDF(idCol, "sample_rate", "channels", "frames", "duration_us")
  }

  /** Fixture-in-query WAV wrapper (the audio analogue of MultimodalSpec's
    * rendered golden PNG): wrap each doc's text bytes in a canonical PCM
    * WAV container whose rate/channels derive from the id — so the
    * declared audio query exercises the REAL `AudioSystem` parse path
    * end-to-end while staying arithmetically oracle-checkable (the oracle
    * recomputes rate/channels/frames/duration from id and byte length).
    */
  def docWav(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"),
      col(textCol).cast("binary").as("data"))
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        val data = r.getAs[Array[Byte]](1)
        val rate = 8000 + (id % 8).toInt * 1000
        val channels = 1 + (id % 2).toInt
        (id, wavBytes(rate, channels, data))
      }
    }.toDF("id", "wav")
      .select(col("id").as(idCol), asMedia(col("wav"), "audio/wav").as("media"))
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
